"""Fused Pallas P-Net: conv1+PReLU+pool+conv2+conv3+heads in VMEM.

STATUS (round 3): numerically exact, NOT YET faster than XLA — kept as
infrastructure with the full measured-negative record below. The cascade
still runs the flax/XLA path.

Why attempted (VERDICT r2 next #1): P-Net's channel counts (3 -> 10 ->
16 -> 32) are tiny, and TPU feature-minor conv layouts pad them to 128
lanes. The compiled HLO proves it: conv1's [16,286,382,10] output is
tiled T(8,128) on the feature dim, i.e. ~450 MB physical for a 35 MB
logical tensor, and the whole level-0 net moves ~2.6 GB of HBM traffic —
matching the measured 4.2 ms/batch16 at ~820 GB/s. The XLA path is
HBM-amplification-bound, not compute-bound.

Measured alternatives on v5e, batch 16, level-0 geometry 288x384 (flax
XLA baseline 4.2 ms; all-levels resize+convs baseline 7.5 ms):

  * HBM im2col matmuls (round 2, commit 7c5ef00): 1.5x SLOWER — patch
    materialization through HBM dominates.
  * NCHW shifted-einsum XLA (tools/try_fast_pnet.py): 0.65x — K=3..16
    contractions are degenerate for the MXU and the 9-term sums
    materialize intermediates.
  * Batch-in-features grouped conv, feature_group_count=16
    (tools/try_grouped_pnet.py): 0.12x — XLA's grouped-conv lowering is
    far worse than the padding it avoids.
  * THIS KERNEL, v1 (full-plane f32 accumulators in a fori over output
    channels): 7.7 ms — the [286,382] accumulators spill to VMEM on
    every tap.
  * THIS KERNEL, v2 (8-row register-resident band accumulators, aligned
    16-row slab loads, channel-group passes): 8.9 ms — the per-tap
    scalar SMEM weight reads + broadcasts inside the fori bodies
    serialize the VPU (~1.25M scalar broadcasts per batch).
  * Int8 quantization of the trunk (tools/try_int8_pnet.py, round 3):
    0.77x at level 0, 0.96x at level 2 — unlike the embedding net
    (where int8 is 1.24-1.32x end-to-end), the quantize/requantize
    elementwise passes over the 42x lane-padded 3..32-channel tensors
    cost more than the int8 element width saves.

Next viable design (unimplemented, est. ~1.5x stage-level at best): build
a [K, w_out] patch matrix per 8-row band via [1, w] row-segment writes
and contract on the MXU with dot([co, K], [K, N]) — bounded by the
1-sublane segment writes at ~1.6 ms/batch16. The honest conclusion so
far: for THIS op shape on this Mosaic version, XLA's padded conv is
within ~2x of any reachable kernel, and the cascade's remaining levers
are elsewhere (R/O stages, selection).

Kernel structure (v2): grid = (batch,); one image's whole level per
invocation (even level 0 fits VMEM with all intermediates); activations
[C, H, W] with W on lanes; convs as banded VPU FMAs; 2x2/s2 maxpool via
shifted-slice maxima + even-index compaction as 0/1 selection matmuls
(strided slicing lowers to unsupported gathers); in-kernel cls softmax.

tests/test_pallas_pnet.py proves equivalence against the flax path in
interpret mode on CPU.

Rebuilds: MTCNN P-Net (Zhang et al. 2016, arXiv:1604.02878); the
reference delegates detection to the pip `mtcnn` package
(reference detectors/face_detector.py:63-66).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def out_geometry(sh, sw):
    """P-Net output grid (gh, gw) for an (sh, sw) input — matches the flax
    path: conv1 VALID 3x3 -> SAME 2x2/s2 pool -> two VALID 3x3 -> 1x1."""
    h1, w1 = sh - 2, sw - 2
    hp, wp = -(-h1 // 2), -(-w1 // 2)
    return hp - 4, wp - 4


def pack_weights(params):
    """Flax PNet param tree -> flat f32 arrays for the kernel's SMEM.

    Conv kernels flatten HWIO [kh, kw, ci, co] -> [(dy*kw + dx)*ci_n + ci,
    co]; biases/alphas become [1, C] rows.
    """
    def flat(kernel):
        kh, kw, ci, co = kernel.shape
        return np.asarray(kernel, np.float32).reshape(kh * kw * ci, co)

    def row(v):
        return np.asarray(v, np.float32).reshape(1, -1)

    return {
        'w1': flat(params['conv1']['kernel']),      # [27, 10]
        'b1': row(params['conv1']['bias']),
        'a1': row(params['prelu1']['alpha']),
        'w2': flat(params['conv2']['kernel']),      # [90, 16]
        'b2': row(params['conv2']['bias']),
        'a2': row(params['prelu2']['alpha']),
        'w3': flat(params['conv3']['kernel']),      # [144, 32]
        'b3': row(params['conv3']['bias']),
        'a3': row(params['prelu3']['alpha']),
        'wc': np.asarray(params['cls']['kernel'],
                         np.float32).reshape(32, 2),
        'bc': row(params['cls']['bias']),
        'wr': np.asarray(params['reg']['kernel'],
                         np.float32).reshape(32, 4),
        'br': row(params['reg']['bias']),
    }


WEIGHT_KEYS = ('w1', 'b1', 'a1', 'w2', 'b2', 'a2', 'w3', 'b3', 'a3',
               'wc', 'bc', 'wr', 'br')


def _even_select(n_out, n_in, transpose=False):
    """0/1 matrix picking every second row: S[i, 2i] = 1 ([n_out, n_in],
    or its transpose). Built from 2-D iota (Mosaic disallows 1-D iota);
    matmul by it is the stride-2 compaction — strided slicing lowers to
    an unsupported gather, while this rides the MXU."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    sel = (cols == 2 * rows).astype(jnp.bfloat16)
    return sel.T if transpose else sel


def _pool2_plane(x2, h, w, hp, wp):
    """SAME 2x2 stride-2 max pool of one [h, w] plane -> [hp, wp].

    Shifted-slice maxima (contiguous slices only) followed by even-index
    compaction as a selection matmul. The trailing odd row/column keeps
    its single-element window by concatenation before the compaction.
    """
    a = jnp.maximum(x2[0:h - 1, :], x2[1:h, :])
    mr = jnp.concatenate([a, x2[h - 1:h, :]], axis=0)          # [h, w]
    rows = jnp.dot(_even_select(hp, h), mr,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    b = jnp.maximum(rows[:, 0:w - 1], rows[:, 1:w])
    mc = jnp.concatenate([b, rows[:, w - 1:w]], axis=1)        # [hp, w]
    return jnp.dot(mc, _even_select(wp, w, transpose=True),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)


BH = 8          # row-band height: accumulators stay register-resident


def _round8(n):
    return -(-n // 8) * 8


def _pad_rows(h):
    """Padded buffer height: bands write [0, round8(h)) and 16-row input
    slabs read up to round8(h_out) + 8 <= round8(h_in) + 8."""
    return _round8(h) + 8


def _make_kernel(sh, sw):
    h1, w1 = sh - 2, sw - 2                   # conv1 output
    hp, wp = -(-h1 // 2), -(-w1 // 2)         # pooled
    h2, w2 = hp - 2, wp - 2                   # conv2 output
    h3, w3 = h2 - 2, w2 - 2                   # conv3 output == head grid

    def banded_conv(src_ref, dst_ref, w_s, b_s, a_s, n_ci, co_group,
                    h_out, w_out, prelu=True):
        """VALID 3x3 conv [n_ci, *, *] -> [len(co_group), h_out, w_out]
        written to dst_ref rows of co_group, one 8-row output band at a
        time. The band's f32 accumulators (one [BH, w_out] per output
        channel in the group) live in registers — v1's full-plane
        accumulators spilled to VMEM every tap and lost 2x to XLA.

        Alignment: Mosaic requires dynamic sublane offsets to be multiples
        of 8, so each (ci, dx) loads ONE aligned 16-row slab and the three
        dy shifts are static in-register sub-slices. Bands run unclamped
        over the rounded-up height; rows >= h_out land in the buffer's pad
        region (see _pad_rows) and are never consumed.
        """
        nb = _round8(h_out) // 8

        def band(bi, _):
            start = pl.multiple_of(bi * BH, 8)
            accs = [jnp.zeros((BH, w_out), jnp.float32) for _ in co_group]

            def ci_body(ci, accs):
                accs = list(accs)
                for dx in range(3):
                    slab = src_ref[ci, pl.ds(start, 16),
                                   pl.ds(dx, w_out)].astype(jnp.float32)
                    for dy in range(3):
                        t = dy * 3 + dx
                        s = slab[dy:dy + BH, :]
                        for g, co in enumerate(co_group):
                            accs[g] = accs[g] + w_s[t * n_ci + ci, co] * s
                return tuple(accs)

            accs = jax.lax.fori_loop(0, n_ci, ci_body, tuple(accs))
            for g, co in enumerate(co_group):
                z = accs[g] + b_s[0, co]
                if prelu:
                    z = jnp.where(z >= 0, z, a_s[0, co] * z)
                dst_ref[co, pl.ds(start, BH), :] = z.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, nb, band, 0)

    def kernel(x_ref, w1_s, b1_s, a1_s, w2_s, b2_s, a2_s, w3_s, b3_s, a3_s,
               wc_s, bc_s, wr_s, br_s, probs_ref, reg_ref,
               c1_ref, cp_ref, c2_ref, c3_ref):
        # ---- conv1 3x3 (3 -> 10) + bias + PReLU, in two 5-channel passes
        xin = x_ref.at[0]                      # [3, sh, sw] view
        banded_conv(xin, c1_ref, w1_s, b1_s, a1_s, 3, range(0, 5), h1, w1)
        banded_conv(xin, c1_ref, w1_s, b1_s, a1_s, 3, range(5, 10), h1, w1)

        # ---- 2x2/s2 SAME maxpool, channel by channel (logical regions
        # only — the buffers carry alignment pad rows)
        def pool_c(c, _):
            cp_ref[c, 0:hp, :] = _pool2_plane(c1_ref[c, 0:h1, :],
                                              h1, w1, hp, wp)
            return 0

        jax.lax.fori_loop(0, 10, pool_c, 0)

        # ---- conv2 3x3 (10 -> 16) + bias + PReLU, two 8-channel passes
        banded_conv(cp_ref, c2_ref, w2_s, b2_s, a2_s, 10, range(0, 8),
                    h2, w2)
        banded_conv(cp_ref, c2_ref, w2_s, b2_s, a2_s, 10, range(8, 16),
                    h2, w2)

        # ---- conv3 3x3 (16 -> 32) + bias + PReLU, four 8-channel passes
        for lo in range(0, 32, 8):
            banded_conv(c2_ref, c3_ref, w3_s, b3_s, a3_s, 16,
                        range(lo, lo + 8), h3, w3)

        # ---- 1x1 heads: cls (2) softmax + reg (4), banded over rows
        nb3 = _round8(h3) // 8

        def head_band(bi, _):
            start = pl.multiple_of(bi * BH, 8)
            accs = [jnp.zeros((BH, w3), jnp.float32) for _ in range(6)]

            def ci_body(ci, accs):
                accs = list(accs)
                s = c3_ref[ci, pl.ds(start, BH), :].astype(jnp.float32)
                for o in range(2):
                    accs[o] = accs[o] + wc_s[ci, o] * s
                for o in range(4):
                    accs[2 + o] = accs[2 + o] + wr_s[ci, o] * s
                return tuple(accs)

            accs = jax.lax.fori_loop(0, 32, ci_body, tuple(accs))
            z0 = accs[0] + bc_s[0, 0]
            z1 = accs[1] + bc_s[0, 1]
            m = jnp.maximum(z0, z1)
            e0 = jnp.exp(z0 - m)
            e1 = jnp.exp(z1 - m)
            probs_ref[0, pl.ds(start, BH), :] = e1 / (e0 + e1)
            for o in range(4):
                reg_ref[0, o, pl.ds(start, BH), :] = accs[2 + o] + br_s[0, o]
            return 0

        jax.lax.fori_loop(0, nb3, head_band, 0)

    return kernel, (h1, w1, hp, wp, h2, w2, h3, w3)


@partial(jax.jit, static_argnames=('interpret',))
def _run(x, *weights, interpret=False):
    b, _, sh, sw = x.shape
    kernel, dims = _make_kernel(sh, sw)
    h1, w1, hp, wp, h2, w2, h3, w3 = dims

    # zero-pad input rows so every aligned 16-row slab read is in bounds
    sh_pad = _pad_rows(sh)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, sh_pad - sh), (0, 0)))
    h3_pad = _round8(h3)

    smem = [pl.BlockSpec(w.shape, lambda bb, n=w.ndim: (0,) * n,
                         memory_space=pltpu.SMEM) for w in weights]
    probs, reg = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, sh_pad, sw), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + smem,
        out_specs=[
            pl.BlockSpec((1, h3_pad, w3), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h3_pad, w3), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h3_pad, w3), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, h3_pad, w3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((10, _pad_rows(h1), w1), jnp.bfloat16),
            pltpu.VMEM((10, _pad_rows(hp), wp), jnp.bfloat16),
            pltpu.VMEM((16, _pad_rows(h2), w2), jnp.bfloat16),
            pltpu.VMEM((32, _pad_rows(h3), w3), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x, *weights)
    return probs[:, :h3, :], reg[:, :, :h3, :]


def pnet_forward_pallas(weights, x_nchw, interpret=False):
    """P-Net forward via the fused kernel.

    :param weights: pack_weights(params) output
    :param x_nchw: [B, 3, sh, sw] normalized image, any float dtype
    :returns: (probs [B, gh, gw] f32, reg [B, gh, gw, 4] f32) — the same
        contract as networks.PNet.__call__ up to layout
    """
    x = x_nchw.astype(jnp.bfloat16)
    probs, reg = _run(x, *[jnp.asarray(weights[k]) for k in WEIGHT_KEYS],
                      interpret=interpret)
    return probs, jnp.transpose(reg, (0, 2, 3, 1))
