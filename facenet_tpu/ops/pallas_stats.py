"""Pallas TPU kernel for the validation hot loop: all-pairs distances ->
weighted below-threshold counts.

The reference computes 10-fold pair-validation statistics on CPU with numpy
gram matrices per class pair over 100 thresholds — 694-1540 s per validation
pass (SURVEY.md §6, reference statistics.py:124-138). The XLA path in
facenet_tpu.statistics chunks rows and scatters into histograms; this kernel
goes one level lower and fuses the whole thing:

  for each (row_tile, col_tile) of the [N, N] pair matrix:
      sims  = rows @ cols.T            (MXU, f32 HIGHEST)
      d     = 2(1-sims) or arccos(sims)
      below[k] += sum(w * (d < t_k))   (VPU masked reductions)

so the [N, N] distance matrix never exists in HBM — only the [2, T+1]
accumulator does. Lower-triangle tiles are skipped entirely (pl.when), the
output block is revisited across the grid (constant index_map), and all
per-pair weighting (1/pairs(c) for positives, 1/(n_i n_j) for negatives —
the reference's per-class-pair averaging) rides in a tiny [8, N] metadata
array.

Returns cumulative counts C[s, k] = sum of weights of pairs with d < t_k
(s=0 positives, s=1 negatives); column T holds the totals (t = +inf).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # rows/cols per grid step (MXU-aligned)
LANES = 128         # threshold capacity (one lane row)
BIG = 1e30          # +inf sentinel for padded thresholds

_cache_enabled = False


def _enable_compilation_cache():
    """Persist compiled kernels across processes where the backend supports
    it. Honors an existing JAX cache configuration."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    import os
    if os.environ.get('JAX_COMPILATION_CACHE_DIR'):
        return
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        cache_dir = os.path.expanduser('~/.cache/facenet_tpu/jax_cache')
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:
        pass


# threshold loop structure: INNER thresholds per outer iteration. The outer
# fori_loop stays a REAL loop (its only dynamic access is an 8-sublane-
# aligned ref slice), so Mosaic compile time scales with INNER, not with
# the threshold count — INNER=4 compiles in seconds where a fully unrolled
# 99-iteration loop took minutes.
INNER = 4
GROUP_ROWS = 8          # sublane alignment for dynamic ref slices


def _kernel(thr_ref, emb_row_ref, emb_col_ref, meta_row_ref, meta_col_ref,
            out_ref, *, metric, n_thr):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # tiles fully below the diagonal contain no unordered pairs
    @pl.when(j >= i)
    def _compute():
        rows = emb_row_ref[:]                      # [TILE, D]
        cols = emb_col_ref[:]                      # [TILE, D]

        sims = jax.lax.dot_general(
            rows, cols, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)   # [TILE, TILE]
        sims = jnp.clip(sims, -1.0, 1.0)
        # Distances never materialize: both metrics are monotone DECREASING
        # in cosine similarity (d0 = 2(1-s), d1 = arccos(s)), so
        # d < t  <=>  s > t' with host-side t' = 1 - t/2 or cos(t). This
        # keeps transcendentals out of the kernel entirely (Mosaic has no
        # acos lowering) and saves a per-tile transform.

        # metadata rows: 0 label, 1 w_pos (1/pos_pairs(c)), 2 inv_n (1/n_c),
        # 3 valid flag
        mr = meta_row_ref[:]                       # [8, TILE]
        mc = meta_col_ref[:]

        label_r = jnp.transpose(mr[0:1, :])        # [TILE, 1]
        wpos_r = jnp.transpose(mr[1:2, :])
        invn_r = jnp.transpose(mr[2:3, :])
        valid_r = jnp.transpose(mr[3:4, :])

        label_c = mc[0:1, :]                       # [1, TILE]
        invn_c = mc[2:3, :]
        valid_c = mc[3:4, :]

        gi = i * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        gj = j * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)

        # strict upper triangle in global indices: each unordered pair once
        valid = (gi < gj) & (valid_r * valid_c > 0.0)
        pos = label_r == label_c

        wp = jnp.where(valid & pos, wpos_r * jnp.ones((1, TILE)), 0.0)
        wn = jnp.where(valid & ~pos, invn_r * invn_c, 0.0)

        # Per-threshold masked reductions. Thresholds arrive pre-broadcast
        # as a [ceil(T/INNER) * GROUP_ROWS, LANES] array whose row
        # (g * GROUP_ROWS + kk) is threshold (g * INNER + kk) replicated
        # across lanes, so each outer iteration ref-slices one aligned
        # 8-row group and unrolls only INNER comparisons.
        lane = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1)

        def body(g, acc):
            t_group = thr_ref[pl.ds(g * GROUP_ROWS, GROUP_ROWS), :]
            for kk in range(INNER):
                t_row = t_group[kk:kk + 1, :]      # [1, LANES], all-equal
                below = sims > t_row               # == (distance < t)
                cp = jnp.sum(jnp.where(below, wp, 0.0))
                cn = jnp.sum(jnp.where(below, wn, 0.0))
                sel = (lane == g * INNER + kk).astype(jnp.float32)
                acc = acc + sel * jnp.stack(
                    [jnp.full((LANES,), cp), jnp.full((LANES,), cn)])
            return acc

        n_groups = -(-n_thr // INNER)
        acc = jax.lax.fori_loop(0, n_groups, body,
                                jnp.zeros((2, LANES), jnp.float32))
        out_ref[0:2, :] += acc


@partial(jax.jit, static_argnames=('metric', 'n_thr', 'interpret'))
def _pair_below_counts_padded(emb, meta, thr, metric, n_thr, interpret):
    n_pad = emb.shape[0]
    grid = (n_pad // TILE, n_pad // TILE)

    kernel = partial(_kernel, metric=metric, n_thr=n_thr)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((thr.shape[0], LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, emb.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, emb.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * emb.shape[1],
            bytes_accessed=2 * n_pad * emb.shape[1] * 4,
            transcendentals=n_pad * n_pad if metric else 0,
        ),
        interpret=interpret,
    )(thr, emb, emb, meta, meta)
    return out


def pair_below_counts(embeddings, labels, thresholds, metric=0,
                      num_classes=None, interpret=False):
    """Weighted counts of pairs with distance below each threshold.

    :param embeddings: [N, D] L2-normalized float32
    :param labels: [N] int dense class ids
    :param thresholds: [T] sorted ascending, T <= 127
    :param metric: 0 squared-Euclidean 2(1-cos), 1 arccos
    :returns: (below_pos [T], below_neg [T], total_pos, total_neg) — the
        same quantities statistics.confusion_counts derives from histograms;
        weights match the reference's per-class-pair averaging
        (1/pos_pairs(c) within class, 1/(n_i*n_j) across classes).
    """
    if not interpret and jax.default_backend() != 'tpu':
        interpret = True    # Mosaic kernels only compile for TPU
    if not interpret:
        _enable_compilation_cache()

    embeddings = np.ascontiguousarray(embeddings, dtype=np.float32)
    labels = np.asarray(labels, dtype=np.int64)
    thresholds = np.asarray(thresholds, dtype=np.float32)
    if thresholds.size > LANES - 1:
        raise ValueError(f'at most {LANES - 1} thresholds, '
                         f'got {thresholds.size}')

    n, dim = embeddings.shape
    if num_classes is None:
        num_classes = int(labels.max()) + 1 if n else 0

    counts = np.bincount(labels, minlength=num_classes).astype(np.float32)
    inv_n = np.divide(1.0, counts, out=np.zeros_like(counts),
                      where=counts > 0)
    pos_pairs = counts * (counts - 1) / 2
    inv_pos = np.divide(1.0, pos_pairs, out=np.zeros_like(pos_pairs),
                        where=pos_pairs > 0)

    # Quantizing N to coarse steps bounds the number of distinct compiled
    # shapes (10-fold validation produces two subset sizes per dataset).
    # Padded rows are masked out, so the only cost is <= quantum/N extra
    # tiles.
    quantum = TILE if interpret else 2048
    n_pad = max(-(-n // quantum) * quantum, TILE)
    d_pad = max(-(-dim // LANES) * LANES, LANES)

    emb = np.zeros((n_pad, d_pad), np.float32)
    emb[:n, :dim] = embeddings

    meta = np.zeros((8, n_pad), np.float32)
    meta[0, :n] = labels
    meta[0, n:] = -1.0
    meta[1, :n] = inv_pos[labels]
    meta[2, :n] = inv_n[labels]
    meta[3, :n] = 1.0

    # thresholds + one totals bin, inverse-transformed to the similarity
    # domain (the kernel compares sims > t'; see _kernel) and laid out in
    # GROUP_ROWS-row groups of INNER: row g*GROUP_ROWS + kk = threshold
    # g*INNER + kk, replicated across lanes. Sentinel -BIG => all pairs
    # count (the totals bin and unused padding).
    if metric == 0:
        sims_thr = 1.0 - thresholds / 2.0          # d0 = 2(1-s) < t
    else:
        sims_thr = np.cos(thresholds)              # d1 = arccos(s) < t
    n_thr_total = thresholds.size + 1
    n_groups = -(-n_thr_total // INNER)
    t = np.full((n_groups * GROUP_ROWS, LANES), -BIG, np.float32)
    flat = np.full((n_groups * INNER,), -BIG, np.float32)
    flat[:thresholds.size] = sims_thr.astype(np.float32)
    for k in range(n_groups * INNER):
        t[(k // INNER) * GROUP_ROWS + (k % INNER), :] = flat[k]

    out = np.asarray(_pair_below_counts_padded(
        jnp.asarray(emb), jnp.asarray(meta), jnp.asarray(t),
        metric=int(metric), n_thr=int(thresholds.size) + 1,
        interpret=bool(interpret)))

    tsz = thresholds.size
    return out[0, :tsz], out[1, :tsz], float(out[0, tsz]), float(out[1, tsz])
