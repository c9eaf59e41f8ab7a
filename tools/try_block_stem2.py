"""Granular stem timings: which piece of the block-space stem wins/loses.

try_block_stem.py measured the full block stem 1.33x SLOWER than the
current s2d stem despite 3-4x less logical HBM traffic. This tool times
each piece in isolation (chained pattern, chunk=128) to find where the
time actually goes, and adds a shifted-matmul lowering of the 2x2 block
convs (4 explicit [M,128]@[128,N] dots over shifted slices) in case
XLA's conv lowering is the problem rather than the layout.

Usage: python tools/try_block_stem2.py [chunk]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from tools.try_block_stem import (block_kernel_s1, block_kernel_s2,
                                  make_params)

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = 16
DTYPE = jnp.bfloat16


def _conv(x, w, stride=1, padding='VALID'):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), (stride, stride), padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv2x2_matmul(x, w):
    """2x2 VALID conv as 4 shifted-slice matmuls. w: [2,2,IC,OC]."""
    b, h, wd, ic = x.shape
    oc = w.shape[-1]
    out = None
    for p in range(2):
        for q in range(2):
            sl = x[:, p:p + h - 1, q:q + wd - 1, :]
            t = jnp.einsum('bhwc,cd->bhwd', sl, jnp.asarray(w[p, q], x.dtype),
                           preferred_element_type=jnp.float32)
            out = t if out is None else out + t
    return out.astype(x.dtype)


def chained(fn, shape, dtype=np.uint8):
    rng = np.random.RandomState(0)
    if dtype == np.uint8:
        data = rng.randint(0, 256, (K,) + shape, dtype=np.uint8)
    else:
        data = rng.normal(0, 1, (K,) + shape).astype(dtype)
    data_d = jax.device_put(data, jax.devices()[0])

    def run(arr, prev):
        def body(carry, chk):
            out = fn(chk)
            flat = out.reshape(out.shape[0], -1)
            return carry + flat[0, 0].astype(jnp.float32) * 0, \
                flat[0, :8].astype(jnp.float32)
        acc, probe = jax.lax.scan(body, jnp.float32(0), arr)
        bump = (acc * 0).astype(arr.dtype)
        return probe, arr + bump
    f = jax.jit(run)

    out = jnp.zeros((K, 8), jnp.float32)
    cur = data_d
    for _ in range(2):
        out, cur = f(cur, out)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        out, cur = f(cur, out)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / (iters * K)


def main():
    rng = np.random.RandomState(0)
    (w1, b1, w2a, b2a, w2b, b2b), blk = make_params(rng)

    # s2d-12 form of conv1 (the current serving path)
    w1s = np.zeros((2, 2, 12, 32), np.float32)
    for ky in range(3):
        for kx in range(3):
            P, r = divmod(ky, 2)
            Q, c2 = divmod(kx, 2)
            w1s[P, Q, (r * 2 + c2) * 3:(r * 2 + c2 + 1) * 3] = w1[ky, kx]

    results = {}

    # ---- preprocessing variants (uint8 [B,160,160,3] -> normalized bf16)
    def pre_old(x):
        mn = jnp.min(x, axis=(-1, -2, -3), keepdims=True).astype(jnp.float32)
        mx = jnp.max(x, axis=(-1, -2, -3), keepdims=True).astype(jnp.float32)
        r = jnp.maximum(mx - mn, 1e-3)
        return (x.astype(jnp.float32) * (2.0 / r) - (mn + mx) / r).astype(DTYPE)

    def pre_flat(x):
        f = x.reshape(x.shape[0], -1)
        mn = jnp.min(f, axis=1)[:, None, None, None].astype(jnp.float32)
        mx = jnp.max(f, axis=1)[:, None, None, None].astype(jnp.float32)
        r = jnp.maximum(mx - mn, 1e-3)
        return (x.astype(jnp.float32) * (2.0 / r) - (mn + mx) / r).astype(DTYPE)

    results['pre old (NHWC reduce)'] = chained(pre_old, (CHUNK, 160, 160, 3))
    results['pre flat (B,-1 reduce)'] = chained(pre_flat, (CHUNK, 160, 160, 3))

    # ---- conv1 variants (from normalized image / raw image)
    def conv1_s2d(x):
        xn = pre_flat(x)
        b, h, w, c = xn.shape
        xs = xn.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 12)
        return jax.nn.relu(_conv(xs, w1s) + jnp.asarray(b1, DTYPE))

    def conv1_block(x):
        f = x.reshape(x.shape[0], -1)
        mn = jnp.min(f, axis=1)[:, None, None, None].astype(jnp.float32)
        mx = jnp.max(f, axis=1)[:, None, None, None].astype(jnp.float32)
        r = jnp.maximum(mx - mn, 1e-3)
        s, t = 2.0 / r, (mn + mx) / r
        b = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (0, 4), (0, 4), (0, 0)))
        xs = xp.reshape(b, 41, 4, 41, 4, 3).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, 41, 41, 48).astype(DTYPE)
        y = _conv(xs, blk['wb1'])
        return jax.nn.relu(y * s.astype(DTYPE)
                           - t.astype(DTYPE) * jnp.asarray(blk['ksum1'], DTYPE)
                           + jnp.asarray(blk['b1'], DTYPE))

    def conv1_block_mm(x):
        f = x.reshape(x.shape[0], -1)
        mn = jnp.min(f, axis=1)[:, None, None, None].astype(jnp.float32)
        mx = jnp.max(f, axis=1)[:, None, None, None].astype(jnp.float32)
        r = jnp.maximum(mx - mn, 1e-3)
        s, t = 2.0 / r, (mn + mx) / r
        b = x.shape[0]
        xp = jnp.pad(x, ((0, 0), (0, 4), (0, 4), (0, 0)))
        xs = xp.reshape(b, 41, 4, 41, 4, 3).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, 41, 41, 48).astype(DTYPE)
        y = conv2x2_matmul(xs, blk['wb1'])
        return jax.nn.relu(y * s.astype(DTYPE)
                           - t.astype(DTYPE) * jnp.asarray(blk['ksum1'], DTYPE)
                           + jnp.asarray(blk['b1'], DTYPE))

    results['conv1 s2d-12 (cur)'] = chained(conv1_s2d, (CHUNK, 160, 160, 3))
    results['conv1 block-48 conv'] = chained(conv1_block, (CHUNK, 160, 160, 3))
    results['conv1 block-48 mm'] = chained(conv1_block_mm, (CHUNK, 160, 160, 3))

    # ---- conv2a+2b variants (isolated, synthetic inputs of the real shape)
    def c2_std(x):                       # x: [B,79,79,32]
        y = jax.nn.relu(_conv(x, w2a) + jnp.asarray(b2a, DTYPE))
        return jax.nn.relu(_conv(y, w2b) + jnp.asarray(b2b, DTYPE))

    def c2_block(x):                     # x: [B,40,40,128]
        y = jax.nn.relu(_conv(x, blk['wb2a']) + jnp.asarray(blk['b2a'], DTYPE))
        return jax.nn.relu(_conv(y, blk['wb2b']) + jnp.asarray(blk['b2b'], DTYPE))

    def c2_block_mm(x):
        y = jax.nn.relu(conv2x2_matmul(x, blk['wb2a'])
                        + jnp.asarray(blk['b2a'], DTYPE))
        return jax.nn.relu(conv2x2_matmul(y, blk['wb2b'])
                           + jnp.asarray(blk['b2b'], DTYPE))

    results['conv2ab std (cur)'] = chained(c2_std, (CHUNK, 79, 79, 32),
                                           np.float32)
    results['conv2ab block conv'] = chained(c2_block, (CHUNK, 40, 40, 128),
                                            np.float32)
    results['conv2ab block mm'] = chained(c2_block_mm, (CHUNK, 40, 40, 128),
                                          np.float32)

    # ---- pool variants
    def pool_std(x):                     # [B,75,75,64]
        return jax.lax.reduce_window(
            x, jnp.finfo(x.dtype).min, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')

    def pool_block(x):                   # [B,38,38,256]
        b, nb = x.shape[0], x.shape[1]
        yb = x.reshape(b, nb, nb, 2, 2, 64)
        n4 = nb - 1
        out = None
        for r in (yb[:, :n4, :, 0], yb[:, :n4, :, 1], yb[:, 1:, :, 0]):
            for csel in (r[:, :, :n4, 0], r[:, :, :n4, 1], r[:, :, 1:, 0]):
                out = csel if out is None else jnp.maximum(out, csel)
        return out

    results['pool std reduce_w'] = chained(pool_std, (CHUNK, 75, 75, 64),
                                           np.float32)
    results['pool block 9max'] = chained(pool_block, (CHUNK, 38, 38, 256),
                                         np.float32)

    print(f'\nchunk={CHUNK} piecewise (ms/chunk):')
    for name, t in results.items():
        print(f'  {name:24s}: {t * 1e3:7.3f}')


if __name__ == '__main__':
    main()
