"""Sharded all-pairs evaluation over the device mesh.

SURVEY.md §2.8 "Sharded eval": the reference's eval is single-process numpy
(reference statistics.py:124-138); the TPU-native plan is the all-pairs
distance computation as a sharded on-device matmul. Implementation: ROWS of
the [N, N] pair matrix shard over the mesh's 'data' axis via shard_map
(embeddings replicated as columns — at 512-d float32 even 100k embeddings
are 205 MB, far below HBM), each device accumulates the weighted
below-threshold histograms for its row stripe, and a single psum yields the
global counts. Wall-clock scales ~1/devices since the O(N^2 D) matmul
dominates.

Used by statistics.confusion_counts when a mesh with >1 'data' shard is
passed; numerics match the single-device path exactly (same math, same
chunking) up to f32 summation order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from facenet_tpu.parallel.mesh import DATA_AXIS

_ROW_CHUNK = 512


def _row_stripe_histograms(emb_rows, emb_all, labels_rows, labels_all,
                           row_offset, inv_n, inv_pos, thresholds,
                           metric, num_bins):
    """Weighted pair histograms of one row stripe vs all columns.

    Same binning math as statistics._pair_histograms, but row indices are
    globalized with `row_offset` so the strict-upper-triangle mask still
    counts each unordered pair exactly once across devices.
    """
    n_rows = emb_rows.shape[0]
    n_all = emb_all.shape[0]

    chunk = min(_ROW_CHUNK, n_rows)
    nchunks = -(-n_rows // chunk)
    pad = nchunks * chunk - n_rows

    emb_p = jnp.pad(emb_rows, ((0, pad), (0, 0)))
    labels_p = jnp.pad(labels_rows, (0, pad), constant_values=-1)

    col_idx = jnp.arange(n_all)

    def body(c):
        rows = jax.lax.dynamic_slice(
            emb_p, (c * chunk, 0), (chunk, emb_rows.shape[1]))
        row_labels = jax.lax.dynamic_slice(labels_p, (c * chunk,), (chunk,))
        row_idx = row_offset + c * chunk + jnp.arange(chunk)

        sims = jnp.clip(
            jnp.dot(rows, emb_all.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
            -1.0, 1.0)
        d = 2.0 * (1.0 - sims) if metric == 0 else jnp.arccos(sims)

        real = row_labels >= 0
        valid = (row_idx[:, None] < col_idx[None, :]) & real[:, None]
        pos = row_labels[:, None] == labels_all[None, :]

        safe_rows = jnp.maximum(row_labels, 0)
        w_pos = inv_pos[safe_rows][:, None]
        w_neg = inv_n[safe_rows][:, None] * inv_n[labels_all][None, :]

        p = jnp.searchsorted(thresholds, d, side='right').astype(jnp.int32)
        ids = p.reshape(-1)
        wp = jnp.where(valid & pos, w_pos, 0.0).reshape(-1)
        wn = jnp.where(valid & ~pos, w_neg, 0.0).reshape(-1)

        hist_pos = jax.ops.segment_sum(wp, ids, num_segments=num_bins + 1)
        hist_neg = jax.ops.segment_sum(wn, ids, num_segments=num_bins + 1)
        return jnp.stack([hist_pos, hist_neg])

    # per-chunk partials summed once (not a running f32 accumulator): the
    # running sum loses tiny late increments at scale — see the same fix in
    # statistics._pair_histograms; each device only holds 1/n_dev of the
    # total so the remaining f32 error is small before the psum
    stacked = jax.lax.map(body, jnp.arange(nchunks))
    out = jnp.sum(stacked, axis=0)
    return out[0], out[1]


def sharded_pair_histograms(embeddings, labels, thresholds, num_classes,
                            metric, mesh):
    """Weighted pair histograms with rows sharded over the mesh 'data' axis.

    :returns: (hist_pos, hist_neg) numpy [num_bins + 1] — identical
        semantics to statistics._pair_histograms.
    """
    n_dev = mesh.shape[DATA_AXIS]
    embeddings = np.ascontiguousarray(embeddings, np.float32)
    labels = np.asarray(labels, np.int32)
    thresholds = np.asarray(thresholds, np.float32)
    n, dim = embeddings.shape
    num_bins = int(thresholds.size)

    counts = np.bincount(labels, minlength=num_classes).astype(np.float32)
    inv_n = np.divide(1.0, counts, out=np.zeros_like(counts),
                      where=counts > 0)
    pos_pairs = counts * (counts - 1) / 2
    inv_pos = np.divide(1.0, pos_pairs, out=np.zeros_like(pos_pairs),
                        where=pos_pairs > 0)

    # pad rows so they split evenly; padded labels are -1 (masked out)
    rows_per_dev = -(-n // n_dev)
    n_pad = rows_per_dev * n_dev
    emb_rows = np.zeros((n_pad, dim), np.float32)
    emb_rows[:n] = embeddings
    labels_rows = np.full(n_pad, -1, np.int32)
    labels_rows[:n] = labels

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, None), P(None, None), P(DATA_AXIS),
                       P(None), P(None), P(None), P(None)),
             out_specs=P(None),
             check_rep=False)
    def run(emb_stripe, emb_all, lab_stripe, lab_all, inv_n_d, inv_pos_d,
            thr):
        offset = jax.lax.axis_index(DATA_AXIS) * rows_per_dev
        hp, hn = _row_stripe_histograms(
            emb_stripe, emb_all, lab_stripe, lab_all, offset,
            inv_n_d, inv_pos_d, thr, metric, num_bins)
        out = jnp.stack([hp, hn])
        return jax.lax.psum(out, DATA_AXIS)

    out = jax.jit(run)(
        jnp.asarray(emb_rows), jnp.asarray(embeddings),
        jnp.asarray(labels_rows), jnp.asarray(labels),
        jnp.asarray(inv_n), jnp.asarray(inv_pos), jnp.asarray(thresholds))
    out = np.asarray(out)
    return out[0], out[1]
