"""Sharded all-pairs evaluation over the device mesh — single- OR
multi-process.

SURVEY.md §2.8 "Sharded eval": the reference's eval is single-process numpy
(reference statistics.py:124-138); the TPU-native plan is the all-pairs
distance computation as a sharded on-device matmul. Implementation: ROWS of
the [N, N] pair matrix shard over the mesh's 'data' axis via shard_map.
Each device receives only its row stripe, all-gathers the full column set
over the mesh (at 512-d float32 even 100k embeddings are 205 MB, far below
HBM), accumulates the weighted below-threshold histograms for its stripe,
and one psum yields the global counts. Wall-clock scales ~1/devices since
the O(N^2 D) matmul dominates.

Multi-process (VERDICT r2 "Next round" #5): every process passes only its
LOCAL rows; `make_array_from_process_local_data` assembles the global
row-sharded array, the column all-gather and the histogram psum ride DCN
between hosts, and every process receives the identical global histograms.
Row indices are globalized per device (`axis_index * rows_per_dev`), so
the strict-upper-triangle pair-once accounting holds across hosts; class
weights are computed ON DEVICE from the gathered labels so no process ever
needs the full label set on host.

Used by statistics.confusion_counts when a mesh with >1 'data' shard is
passed; numerics match the single-device path exactly (same math, same
chunking) up to f32 summation order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
    _NO_CHECK = {'check_vma': False}
except ImportError:  # jax < 0.8 kept it in experimental
    from jax.experimental.shard_map import shard_map
    _NO_CHECK = {'check_rep': False}
from jax.sharding import NamedSharding, PartitionSpec as P

from facenet_tpu.parallel.mesh import DATA_AXIS

_ROW_CHUNK = 512


def _row_stripe_histograms(emb_rows, emb_all, labels_rows, labels_all,
                           row_offset, num_classes, thresholds,
                           metric, num_bins):
    """Weighted pair histograms of one row stripe vs all columns.

    Same binning math as statistics._pair_histograms, but row indices are
    globalized with `row_offset` so the strict-upper-triangle mask still
    counts each unordered pair exactly once across devices, and padded
    entries (label < 0) are masked on BOTH axes. Class weights come from
    `labels_all`, which covers the full (gathered) set.
    """
    n_rows = emb_rows.shape[0]
    n_all = emb_all.shape[0]

    # per-class weights from the gathered labels (pads have label -1)
    col_real = labels_all >= 0
    counts = jax.ops.segment_sum(
        jnp.where(col_real, 1.0, 0.0), jnp.maximum(labels_all, 0),
        num_segments=num_classes)
    inv_n = jnp.where(counts > 0, 1.0 / jnp.maximum(counts, 1), 0.0)
    pos_pairs = counts * (counts - 1) / 2
    inv_pos = jnp.where(pos_pairs > 0, 1.0 / jnp.maximum(pos_pairs, 1), 0.0)

    chunk = min(_ROW_CHUNK, n_rows)
    nchunks = -(-n_rows // chunk)
    pad = nchunks * chunk - n_rows

    emb_p = jnp.pad(emb_rows, ((0, pad), (0, 0)))
    labels_p = jnp.pad(labels_rows, (0, pad), constant_values=-1)

    col_idx = jnp.arange(n_all)
    safe_cols = jnp.maximum(labels_all, 0)

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
        valid = ((row_idx[:, None] < col_idx[None, :]) & real[:, None] &
                 col_real[None, :])
        pos = row_labels[:, None] == labels_all[None, :]

        safe_rows = jnp.maximum(row_labels, 0)
        w_pos = inv_pos[safe_rows][:, None]
        w_neg = inv_n[safe_rows][:, None] * inv_n[safe_cols][None, :]

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


def _rows_per_device(mesh, n_local):
    """Globally-agreed row-stripe size per device.

    Single-process: ceil(n / n_dev). Multi-process: every process pads its
    local rows to local_device_count * rows_per_dev, so rows_per_dev must
    be the max of each process's requirement — agreed via a host
    allgather of the (tiny) local row counts.
    """
    if jax.process_count() == 1:
        return -(-n_local // mesh.shape[DATA_AXIS])
    from jax.experimental import multihost_utils
    local_counts = np.asarray(
        multihost_utils.process_allgather(np.int64(n_local)))
    ldev = mesh.shape[DATA_AXIS] // jax.process_count()
    return int(max(-(-int(c) // ldev) for c in local_counts))


def sharded_pair_histograms(embeddings, labels, thresholds, num_classes,
                            metric, mesh):
    """Weighted pair histograms with rows sharded over the mesh 'data' axis.

    `embeddings`/`labels` are THIS PROCESS's rows: the full set when
    single-process, the local stripe when `jax.process_count() > 1` (labels
    must already be densified against the GLOBAL class set — see
    statistics.confusion_counts, which gathers label values across
    processes before densifying).

    :returns: (hist_pos, hist_neg) numpy [num_bins + 1] — identical
        semantics to statistics._pair_histograms; identical values on
        every process.
    """
    n_dev = mesh.shape[DATA_AXIS]
    embeddings = np.ascontiguousarray(embeddings, np.float32)
    labels = np.asarray(labels, np.int32)
    thresholds = np.asarray(thresholds, np.float32)
    n, dim = embeddings.shape
    num_bins = int(thresholds.size)

    rows_per_dev = _rows_per_device(mesh, n)
    # pad this process's rows so its devices' stripes fill evenly; padded
    # labels are -1 (masked on both row and column sides)
    local_dev = n_dev // jax.process_count()
    n_local_pad = rows_per_dev * local_dev
    emb_rows = np.zeros((n_local_pad, dim), np.float32)
    emb_rows[:n] = embeddings
    labels_rows = np.full(n_local_pad, -1, np.int32)
    labels_rows[:n] = labels

    row_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    g_emb = jax.make_array_from_process_local_data(row_sharding, emb_rows)
    g_labels = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), labels_rows)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(None)),
             out_specs=P(None),
             **_NO_CHECK)
    def run(emb_stripe, lab_stripe, thr):
        # full column set via on-device all-gather (DCN across hosts):
        # no process ever materializes the global embedding matrix on host
        emb_all = jax.lax.all_gather(emb_stripe, DATA_AXIS, axis=0,
                                     tiled=True)
        lab_all = jax.lax.all_gather(lab_stripe, DATA_AXIS, axis=0,
                                     tiled=True)
        offset = jax.lax.axis_index(DATA_AXIS) * rows_per_dev
        hp, hn = _row_stripe_histograms(
            emb_stripe, emb_all, lab_stripe, lab_all, offset,
            num_classes, thr, metric, num_bins)
        out = jnp.stack([hp, hn])
        return jax.lax.psum(out, DATA_AXIS)

    out = jax.jit(run)(g_emb, g_labels, jnp.asarray(thresholds))
    out = np.asarray(out)
    return out[0], out[1]
