"""P-Net kernel v3 prototype: [C, H*W] flat-lane layout, MXU patch matmuls.

The v1/v2 Pallas kernels (detectors/mtcnn/pallas_pnet.py) lost to XLA
because banded VPU accumulation is FLOP-bound on the VPU (the useful
MACs / VPU-peak floor is ~4 ms at level 0 — no better than XLA). v3
moves the FLOPs to the MXU:

  * activations live as [C_pad, H*W] with the WHOLE image flattened on
    the lane dimension (C on sublanes). A (dy, dx) tap is a STATIC lane
    slice at offset dy*W + dx — no strided slicing, no gathers.
  * level-0 W is 384 = 3x128, so rows tile lanes exactly; tap reads
    that cross a row's end only contaminate the 2 rightmost output
    columns, which VALID convs discard anyway.
  * the 2x2/s2 SAME maxpool stays DILATED: pooled values sit at their
    raw positions, conv2/conv3 taps use 2x-dilated lane offsets, and
    the final head grid is extracted with one strided slice in XLA.
    Dense-grid compute wastes 4x at conv2/3 but avoids any lane
    compaction; the MXU padding already dominates.
  * per output chunk of lanes, patches stack as [9*C_pad, CH] with each
    tap block written at an 8-aligned sublane offset; one jnp.dot
    [co, K] @ [K, CH] per stage rides the MXU (K = 72/144/144 after
    channel padding, N amortizes the fill).

Expected ceiling ~1.2 ms/batch16 at level 0 vs 4.2 ms XLA (MAC math in
the repo round notes). Usage:
  python tools/try_pnet_v3.py cpu    # interpret-mode equivalence
  python tools/try_pnet_v3.py tpu    # level-0 timing vs XLA
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else 'cpu'
if MODE == 'cpu' and __name__ == '__main__':
    import jax
    jax.config.update('jax_platforms', 'cpu')
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9          # pool pad: large-negative finite (NaN-free)


# ---------------------------------------------------------------------------
# weight packing: HWIO conv kernels -> [co, 9 * ci_pad] rows for the dots
# ---------------------------------------------------------------------------

def pack3x3(w, ci_pad, co_pad):
    """[3, 3, ci, co] -> [co_pad, 9 * ci_pad] (zeros on padding)."""
    kh, kw, ci, co = w.shape
    out = np.zeros((co_pad, kh * kw * ci_pad), np.float32)
    for dy in range(kh):
        for dx in range(kw):
            t = dy * kw + dx
            out[:co, t * ci_pad:t * ci_pad + ci] = w[dy, dx].T
    return out


def make_weights(rng):
    w1 = rng.normal(0, 0.3, (3, 3, 3, 10)).astype(np.float32)
    w2 = rng.normal(0, 0.2, (3, 3, 10, 16)).astype(np.float32)
    w3 = rng.normal(0, 0.2, (3, 3, 16, 32)).astype(np.float32)
    wh = rng.normal(0, 0.3, (1, 1, 32, 6)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (10,)).astype(np.float32)
    b2 = rng.normal(0, 0.1, (16,)).astype(np.float32)
    b3 = rng.normal(0, 0.1, (32,)).astype(np.float32)
    bh = rng.normal(0, 0.1, (6,)).astype(np.float32)
    a1 = rng.uniform(0.1, 0.4, (10,)).astype(np.float32)
    a2 = rng.uniform(0.1, 0.4, (16,)).astype(np.float32)
    a3 = rng.uniform(0.1, 0.4, (32,)).astype(np.float32)
    return (w1, b1, a1, w2, b2, a2, w3, b3, a3, wh, bh)


def col(v, n):
    out = np.zeros((n, 1), np.float32)
    out[:len(v), 0] = v
    return out


# ---------------------------------------------------------------------------
# XLA reference (NHWC trunk, same as networks.py PNet without softmax)
# ---------------------------------------------------------------------------

def ref_trunk(x, weights):
    (w1, b1, a1, w2, b2, a2, w3, b3, a3, wh, bh) = weights
    dn = ('NHWC', 'HWIO', 'NHWC')

    def prelu(z, a):
        return jnp.maximum(z, 0) + jnp.asarray(a, z.dtype) * jnp.minimum(z, 0)

    def conv(z, w, b):
        return jax.lax.conv_general_dilated(
            z, jnp.asarray(w, z.dtype), (1, 1), 'VALID',
            dimension_numbers=dn) + jnp.asarray(b, z.dtype)

    x = prelu(conv(x, w1, b1), a1)
    x = jax.lax.reduce_window(x, jnp.finfo(x.dtype).min, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), 'SAME')
    x = prelu(conv(x, w2, b2), a2)
    x = prelu(conv(x, w3, b3), a3)
    return conv(x, wh, bh)


# ---------------------------------------------------------------------------
# v3 kernel
# ---------------------------------------------------------------------------

def make_kernel(sh, sw, chunk):
    """Build the per-image kernel for an (sh, sw) input. sw must be a
    multiple of 128. `chunk` = output lanes per patch/dot step."""
    assert sw % 128 == 0 and chunk % 128 == 0
    hw = sh * sw
    # conv1 runs on the raw grid; after the H-COMPACTED pool, conv2/3
    # run on [hp rows x sw lanes] with dy offsets of sw and dx of 2
    reach = 2 * (2 * sw + 2) + 128
    hw_pad = hw + ((reach + chunk - 1) // chunk) * chunk

    h1, w1 = sh - 2, sw - 2              # conv1 valid extents
    hp, wp = -(-h1 // 2), -(-w1 // 2)    # pooled (SAME ceil)
    h2, w2 = hp - 2, wp - 2
    h3, w3 = h2 - 2, w2 - 2
    hwp = hp * sw                        # pooled flat extent (compact H)

    def n_chunks(n):
        return n // chunk + (1 if n % chunk else 0)

    def stage_conv(src_ref, dst_ref, patch_ref, w_ref, b_ref, a_ref,
                   ci_pad, co_pad, drow, dcol, n_lanes, mask_ref=None,
                   prelu=True):
        """Dense VALID 3x3 conv over the flat lanes: tap (dy, dx) reads
        at lane offset dy*drow + dx*dcol. Patches stack in VMEM as
        [9*ci_pad, chunk]; one [co_pad, K] @ [K, chunk] dot per chunk.
        Lane loads start 128-aligned (drow is a multiple of sw); the
        +dx*dcol shifts happen as in-register value slices."""
        k = 9 * ci_pad

        def body(c, _):
            off = c * chunk
            for dy in range(3):
                base = src_ref[0:ci_pad,
                               pl.ds(off + dy * drow, chunk + 128)]
                for dx in range(3):
                    t = dy * 3 + dx
                    patch_ref[t * ci_pad:(t + 1) * ci_pad, :] = \
                        base[:, dx * dcol:dx * dcol + chunk]
            z = jax.lax.dot_general(
                w_ref[...], patch_ref[0:k, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = z + b_ref[...]
            if prelu:
                z = jnp.where(z >= 0, z, a_ref[...] * z)
            z = z.astype(jnp.bfloat16)
            if mask_ref is not None:
                m = mask_ref[0:1, pl.ds(off, chunk)]
                z = z * m + jnp.bfloat16(NEG) * (jnp.bfloat16(1.0) - m)
            dst_ref[0:co_pad, pl.ds(off, chunk)] = z
            return 0

        jax.lax.fori_loop(0, n_chunks(n_lanes), body, 0, unroll=False)

    def kernel(x_ref, w1_ref, b1_ref, a1_ref, w2_ref, b2_ref, a2_ref,
               w3_ref, b3_ref, a3_ref, wh_ref, bh_ref, mask1_ref,
               out_ref, c1_ref, cp_ref, c2_ref, c3_ref, patch_ref):
        # conv1: 3 -> 10 (ci_pad 8, co_pad 16) on the raw grid; the mask
        # epilogue sets invalid rows/cols to NEG for the SAME pool
        stage_conv(x_ref.at[0], c1_ref, patch_ref, w1_ref, b1_ref,
                   a1_ref, 8, 16, sw, 1, hw, mask_ref=mask1_ref)

        # 2x2/s2 SAME maxpool, H-COMPACTED: pooled row p reads raw rows
        # 2p/2p+1 (raw row r sits at lane r*sw — row indexing is free)
        # and writes contiguously at lane p*sw, halving conv2/3's grid.
        # W stays dilated: valid pooled cols are the even ones.
        def pool_body(p, _):
            a = c1_ref[0:16, pl.ds(2 * p * sw, 2 * sw + 128)]
            v = jnp.maximum(
                jnp.maximum(a[:, 0:sw], a[:, 1:sw + 1]),
                jnp.maximum(a[:, sw:2 * sw], a[:, sw + 1:2 * sw + 1]))
            cp_ref[0:16, pl.ds(p * sw, sw)] = v
            return 0

        jax.lax.fori_loop(0, hp, pool_body, 0, unroll=False)

        # conv2/conv3 on the pooled grid: dy offset sw, dx offset 2
        stage_conv(cp_ref, c2_ref, patch_ref, w2_ref, b2_ref, a2_ref,
                   16, 16, sw, 2, hwp)
        stage_conv(c2_ref, c3_ref, patch_ref, w3_ref, b3_ref, a3_ref,
                   16, 32, sw, 2, hwp)

        # heads: 1x1 (32 -> 6), f32 out
        def head_body(c, _):
            off = c * chunk
            z = jax.lax.dot_general(
                wh_ref[...], c3_ref[0:32, pl.ds(off, chunk)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, 0:8, pl.ds(off, chunk)] = z + bh_ref[...]
            return 0

        jax.lax.fori_loop(0, n_chunks(hwp), head_body, 0, unroll=False)

    return kernel, (hw, hw_pad, h1, w1, hp, wp, h2, w2, h3, w3)


def pack_all(weights):
    """numpy weight tuple -> kernel-ready packed arrays (host side)."""
    (w1, b1, a1, w2, b2, a2, w3, b3, a3, wh, bh) = weights
    wp1 = jnp.asarray(pack3x3(w1, 8, 16), jnp.bfloat16)
    wp2 = jnp.asarray(pack3x3(w2, 16, 16), jnp.bfloat16)
    wp3 = jnp.asarray(pack3x3(w3, 16, 32), jnp.bfloat16)
    wph = jnp.asarray(pack3x3(wh.reshape(1, 1, 32, 6), 32, 8)[:, :32],
                      jnp.bfloat16)
    cb1, ca1 = jnp.asarray(col(b1, 16)), jnp.asarray(col(a1, 16))
    cb2, ca2 = jnp.asarray(col(b2, 16)), jnp.asarray(col(a2, 16))
    cb3, ca3 = jnp.asarray(col(b3, 32)), jnp.asarray(col(a3, 32))
    cbh = jnp.asarray(col(bh, 8))
    return (wp1, cb1, ca1, wp2, cb2, ca2, wp3, cb3, ca3, wph, cbh)


@partial(jax.jit, static_argnames=('interpret', 'chunk'))
def pnet_v3(x, packed, interpret=False, chunk=16384):
    """uint8/float [B, sh, sw, 3] -> [B, h3, w3, 6] head outputs."""
    (wp1, cb1, ca1, wp2, cb2, ca2, wp3, cb3, ca3, wph, cbh) = packed
    b, sh, sw, _ = x.shape
    kernel, dims = make_kernel(sh, sw, chunk)
    hw, hw_pad, h1, w1e, hp, wp, h2, w2e, h3, w3e = dims

    # [B, sh, sw, 3] -> [B, 8, hw_pad] flat-lane layout
    xf = jnp.transpose(x.astype(jnp.bfloat16), (0, 3, 1, 2))
    xf = xf.reshape(b, 3, hw)
    xf = jnp.pad(xf, ((0, 0), (0, 5), (0, hw_pad - hw)))

    # conv1 validity mask over the flat grid (rows < h1, cols < w1)
    yy, xx = jnp.divmod(jnp.arange(hw), sw)
    m1 = ((yy < h1) & (xx < w1e)).astype(jnp.bfloat16).reshape(1, hw)
    m1 = jnp.pad(m1, ((0, 0), (0, hw_pad - hw)))

    vspec = lambda shp: pl.BlockSpec(
        shp, lambda bb: (0,) * len(shp), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 8, hw_pad), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [vspec(w.shape) for w in
                  (wp1, cb1, ca1, wp2, cb2, ca2, wp3, cb3, ca3, wph, cbh,
                   m1)],
        out_specs=pl.BlockSpec((1, 8, hw_pad), lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, hw_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, hw_pad), jnp.bfloat16),   # c1
            pltpu.VMEM((16, hw_pad), jnp.bfloat16),   # pooled (compact)
            pltpu.VMEM((16, hw_pad), jnp.bfloat16),   # c2
            pltpu.VMEM((32, hw_pad), jnp.bfloat16),   # c3
            pltpu.VMEM((144, chunk), jnp.bfloat16),   # patch
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xf, wp1, cb1, ca1, wp2, cb2, ca2, wp3, cb3, ca3, wph, cbh, m1)

    # head grid: rows compact (H-compacted pool), cols at stride 2
    out = out[:, :6, :hp * sw].reshape(b, 6, hp, sw)
    out = out[:, :, 0:h3, 0:2 * w3e:2]
    return jnp.transpose(out, (0, 2, 3, 1))


# ---------------------------------------------------------------------------

def run_cpu():
    rng = np.random.RandomState(0)
    weights = make_weights(rng)
    sh, sw = 40, 128
    x = rng.randint(0, 256, (2, sh, sw, 3)).astype(np.float32) / 128 - 1
    ref = np.asarray(ref_trunk(jnp.asarray(x, jnp.float32), weights))
    got = np.asarray(pnet_v3(jnp.asarray(x), pack_all(weights),
                             interpret=True, chunk=1280))
    print('ref', ref.shape, 'got', got.shape)
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    print(f'max rel err: {err:.2e}')
    assert got.shape == ref.shape
    assert err < 5e-2, 'MISMATCH'
    print('EQUIVALENT (bf16 tolerance)')


def run_tpu():
    rng = np.random.RandomState(0)
    weights = make_weights(rng)
    sh, sw = 288, 384
    batch = 16
    x = rng.randint(0, 256, (batch, sh, sw, 3)).astype(np.float32) \
        / 128 - 1
    xb = jnp.asarray(x, jnp.bfloat16)

    def chained(fn):
        data = jnp.stack([xb] * 4)

        def run(arr, prev):
            def body(carry, chk):
                out = fn(chk)
                flat = out.reshape(-1)
                return carry + flat[0].astype(jnp.float32) * 0, \
                    flat[:8].astype(jnp.float32)
            acc, probe = jax.lax.scan(body, jnp.float32(0), arr)
            return probe, arr + (acc * 0).astype(arr.dtype)

        f = jax.jit(run)
        out = jnp.zeros((4, 8), jnp.float32)
        cur = data
        for _ in range(2):
            out, cur = f(cur, out)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            out, cur = f(cur, out)
        np.asarray(out[0, 0])
        return (time.perf_counter() - t0) / (iters * 4)

    packed = pack_all(weights)
    t_ref = chained(lambda z: ref_trunk(z, weights))
    print(f'XLA reference: {t_ref * 1e3:7.3f} ms/batch{batch}', flush=True)
    t_v3 = chained(lambda z: pnet_v3(z, packed))
    print(f'v3 kernel:     {t_v3 * 1e3:7.3f} ms/batch{batch}  '
          f'({t_ref / t_v3:4.2f}x)', flush=True)

    ref = np.asarray(ref_trunk(xb, weights))
    got = np.asarray(pnet_v3(xb, packed))
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    print(f'max rel err vs XLA: {err:.2e}')


if __name__ == '__main__':
    if MODE == 'cpu':
        run_cpu()
    else:
        run_tpu()
