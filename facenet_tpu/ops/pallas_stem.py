"""Fused Pallas stem for the IRv1 serving path: conv1+conv2a+conv2b+pool.

Rebuilds the hot entry of the reference's Inception-ResNet-v1 stem
(reference facenet/models/inception_resnet_v1.py:380-430 — Conv2d_1a_3x3
s2 + Conv2d_2a_3x3 + Conv2d_2b_3x3 + MaxPool_3a 3x3/s2) as one Pallas
kernel in the flat-lane layout proven by the P-Net campaign
(detectors/mtcnn/pallas_pnet.py v3).

Why: the stem is the serving forward's dominant stage — 1.74 of 3.42
ms/chunk128 including preprocessing (tools/profile_embed.py) — because
its channel counts (12 -> 32 -> 32 -> 64) are far below the 128-lane
tile, so XLA's feature-minor conv layouts move ~1 GB of mostly-padding
HBM traffic per chunk. In the flat layout activations are [C_pad, H*W]
(channels on sublanes, the flattened image on lanes): traffic drops to
~120 MB and each conv is one [co_pad, K] @ [K, chunk] MXU dot.

Layout/geometry (160x160 input, static):
  * input is the space-to-depth grid: 16 channel planes (12 real:
    (dy2, dx2, c) block order matching irv1_fast's s2d reshape) of
    80 rows x 128 lanes (80 real columns, zero-padded). conv1 is the
    2x2-tap rewrite of the 3x3/s2 stem conv (K = 4x16 = 64).
  * conv2a/conv2b are 3x3 VALID taps (K = 9x32 = 288). All stages
    ReLU in f32 before the bf16 store.
  * the 3x3/s2 VALID maxpool H-compacts on the fly (pooled row p reads
    raw rows 2p..2p+2 — row indexing is free in the flat layout) and
    leaves W dilated (lane 2j = pooled column j); the NHWC grid is
    extracted with one strided slice + transpose in XLA.
  * every stage is VALID, so garbage columns/rows never reach a
    consumed output — no validity masks are needed (unlike P-Net's
    SAME pool). Zero padding keeps garbage finite.

Status: MEASURED NEGATIVE (round 3, v5e — don't redo without a new
idea). Kernel level (tools/try_stem_flat.py, chunk 128, exact to 0.0 vs
the XLA stem): XLA pre+stem 1.456 ms/chunk; s2d relayout alone 1.306
ms; relayout + this kernel 3.425 ms -> 0.43x. Serving level
(tools/time_stem_serving.py, chained): bf16 38.2k img/s XLA stem vs
25.8k Pallas; int8 49.9k vs 28.7k. The pre-measurement risk note below
was right: with co_pad <= 64 the MXU dot runs at <= 50% M-occupancy and
the stem's XLA padding waste is only 2-4x (32-64 channels) vs the 42x
that made P-Net's kernel a 5x isolated win — XLA's fused low-channel
conv layouts beat the flat-lane form here. The kernel stays wired
behind stem='pallas' (equivalence-tested in tests/test_pallas_stem.py)
as the recorded baseline for any future stem fusion attempt; the
serving default remains stem='xla'.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SH, SW = 80, 128        # s2d rows x 128-padded lane width (80 real cols)
TRUE_W = 80
HW = SH * SW
H1, W1 = 79, 79         # conv1 output valid extent (2x2 taps on 80x80)
H2A, W2A = 77, 77
H2B, W2B = 75, 75
HP, WP = 37, 37         # 3x3/s2 VALID pool output
HWP = HP * SW


def _round128(n):
    return -(-n // 128) * 128


def pack_stem(params):
    """irv1_fast params -> packed dot operands for the flat stem kernel.

    Expects the space-to-depth fast params (build_fast_params):
    Conv2d_1a_s2d [2,2,12,32], Conv2d_2a_3x3 [3,3,32,32],
    Conv2d_2b_3x3 [3,3,32,64], each {'k','b'} with BN already folded.
    Pure jnp so it traces inside a jitted serving function.
    """
    def pk(w, ci_pad, co_pad):
        k = jnp.asarray(w, jnp.float32)
        kh, kw, ci, co = k.shape
        out = jnp.transpose(k, (3, 0, 1, 2))
        out = jnp.pad(out, ((0, co_pad - co), (0, 0), (0, 0),
                            (0, ci_pad - ci)))
        return out.reshape(co_pad, kh * kw * ci_pad).astype(jnp.bfloat16)

    def pb(b, n):
        b = jnp.asarray(b, jnp.float32).reshape(-1, 1)
        return jnp.pad(b, ((0, n - b.shape[0]), (0, 0)))

    return {
        'w1': pk(params['Conv2d_1a_s2d']['k'], 16, 32),
        'b1': pb(params['Conv2d_1a_s2d']['b'], 32),
        'w2': pk(params['Conv2d_2a_3x3']['k'], 32, 32),
        'b2': pb(params['Conv2d_2a_3x3']['b'], 32),
        'w3': pk(params['Conv2d_2b_3x3']['k'], 32, 64),
        'b3': pb(params['Conv2d_2b_3x3']['b'], 64),
    }


STEM_KEYS = ('w1', 'b1', 'w2', 'b2', 'w3', 'b3')


def to_planes(x):
    """Normalized [B, 160, 160, 3] -> s2d channel planes [B, 16, HW].

    Channel order is (dy2, dx2, c) — identical to irv1_fast's
    space-to-depth reshape, so pack_stem's conv1 operand matches.
    """
    b = x.shape[0]
    xs = x.reshape(b, 80, 2, 80, 2, 3)
    xs = jnp.transpose(xs, (0, 2, 4, 5, 1, 3))         # [B,2,2,3,80,80]
    xs = xs.reshape(b, 12, 80, 80)
    xs = jnp.pad(xs, ((0, 0), (0, 4), (0, 0), (0, SW - TRUE_W)))
    return xs.reshape(b, 16, HW)


def _make_stem_kernel(chunk):
    assert chunk % 128 == 0

    def n_chunks(n):
        return -(-n // chunk)

    def stage_conv(src_ref, dst_ref, patch_ref, w_ref, b_ref,
                   ci_pad, co_pad, th, tw, n_lanes):
        k = th * tw * ci_pad

        def body(c, _):
            off = c * chunk
            for dy in range(th):
                base = src_ref[0:ci_pad, pl.ds(off + dy * SW, chunk + 128)]
                for dx in range(tw):
                    t = dy * tw + dx
                    patch_ref[t * ci_pad:(t + 1) * ci_pad, :] = \
                        base[:, dx:dx + chunk]
            z = jax.lax.dot_general(
                w_ref[...], patch_ref[0:k, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = jnp.maximum(z + b_ref[...], 0.0).astype(jnp.bfloat16)
            dst_ref[0:co_pad, pl.ds(off, chunk)] = z
            return 0

        jax.lax.fori_loop(0, n_chunks(n_lanes), body, 0, unroll=False)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               out_ref, c1_ref, c2_ref, c3_ref, patch_ref):
        stage_conv(x_ref.at[0], c1_ref, patch_ref, w1_ref, b1_ref,
                   16, 32, 2, 2, HW)
        stage_conv(c1_ref, c2_ref, patch_ref, w2_ref, b2_ref,
                   32, 32, 3, 3, HW)
        stage_conv(c2_ref, c3_ref, patch_ref, w3_ref, b3_ref,
                   32, 64, 3, 3, HW)

        def pool_body(p, _):
            a = c3_ref[0:64, pl.ds(2 * p * SW, 3 * SW + 128)]
            v = a[:, 0:SW]
            for r in range(3):
                for dx in range(3):
                    if r == 0 and dx == 0:
                        continue
                    v = jnp.maximum(v, a[:, r * SW + dx:r * SW + dx + SW])
            out_ref[0, 0:64, pl.ds(p * SW, SW)] = v
            return 0

        jax.lax.fori_loop(0, HP, pool_body, 0, unroll=False)

    return kernel


@partial(jax.jit, static_argnames=('interpret', 'chunk'))
def _stem_run(planes, w1, b1, w2, b2, w3, b3, interpret=False,
              chunk=10240):
    b = planes.shape[0]
    chunk = min(chunk, _round128(HW))
    hw_pad = -(-HW // chunk) * chunk + 2 * SW + 256

    xf = jnp.pad(planes.astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (0, hw_pad - HW)))

    kernel = _make_stem_kernel(chunk)
    weights = (w1, b1, w2, b2, w3, b3)
    vspec = [pl.BlockSpec(w.shape, lambda bb, n=w.ndim: (0,) * n,
                          memory_space=pltpu.VMEM) for w in weights]
    out_pad = _round128(HWP) + 2 * SW + 256
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 16, hw_pad), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM)] + vspec,
        out_specs=pl.BlockSpec((1, 64, out_pad), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 64, out_pad), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((32, hw_pad), jnp.bfloat16),    # conv1 out
            pltpu.VMEM((32, hw_pad), jnp.bfloat16),    # conv2a out
            pltpu.VMEM((64, hw_pad), jnp.bfloat16),    # conv2b out
            pltpu.VMEM((288, chunk), jnp.bfloat16),    # patch buffer
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xf, *weights)

    # dilated [B, 64, HP*SW] -> NHWC [B, 37, 37, 64]
    grid = out[:, :, :HWP].reshape(b, 64, HP, SW)
    grid = grid[:, :, :, 0:2 * WP:2]
    return jnp.transpose(grid, (0, 2, 3, 1))


def stem_forward_flat(packed, planes, interpret=False, chunk=10240):
    """[B, 16, 80*128] s2d planes -> [B, 37, 37, 64] pooled stem output.

    Equivalent to irv1_fast.fast_forward's conv1/conv2a/conv2b/maxpool
    prefix on a 160x160 input (bf16-level drift).
    """
    return _stem_run(planes, *[packed[k] for k in STEM_KEYS],
                     interpret=interpret, chunk=chunk)
