"""Probe: int8 P-Net conv stack vs bf16 at cascade level-0 geometry.

The compiled bf16 P-Net is HBM-amplification-bound: its 10/16/32-channel
activations tile feature-minor to 128 lanes (~2.6 GB physical traffic
for level 0 — see detectors/mtcnn/pallas_pnet.py). Int8 activations
would halve that padded traffic IF XLA keeps the conv inputs int8 in
memory, so this times the full P-Net trunk (conv1+PReLU+pool+conv2+
conv3+heads) bf16 vs int8-quantized at batch 16, 288x384 (level 0) and
the smaller pyramid levels.

PReLU(a*min(x,0)+max(x,0)) is NOT scale-invariant across the zero point
but symmetric int8 handles signed activations; each conv requantizes
from the previous dequantized PReLU output, exactly like the serving
path (models/quantize.py).

Usage: python tools/try_int8_pnet.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

BATCH = 16
K = 8
LEVELS = [(288, 384), (204, 272), (144, 192)]


def chained(fn, shape, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.normal(0, 1, (K,) + shape), dtype)

    def run(arr, prev):
        def body(carry, chk):
            out = fn(chk)
            flat = out.reshape(-1)
            return carry + flat[0].astype(jnp.float32) * 0, \
                flat[:8].astype(jnp.float32)
        acc, probe = jax.lax.scan(body, jnp.float32(0), arr)
        return probe, arr + (acc * 0).astype(arr.dtype)

    f = jax.jit(run)
    out = jnp.zeros((K, 8), jnp.float32)
    cur = data
    for _ in range(2):
        out, cur = f(cur, out)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        out, cur = f(cur, out)
    np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / (iters * K)


def main():
    rng = np.random.RandomState(0)
    dn = ('NHWC', 'HWIO', 'NHWC')

    def make(ic, oc, k):
        w = rng.normal(0, 0.1, (k, k, ic, oc)).astype(np.float32)
        a = rng.uniform(0.1, 0.3, (oc,)).astype(np.float32)
        return w, a

    w1, a1 = make(3, 10, 3)
    w2, a2 = make(10, 16, 3)
    w3, a3 = make(16, 32, 3)
    wc, _ = make(32, 2, 1)
    wr, _ = make(32, 4, 1)

    def prelu(x, a):
        a = jnp.asarray(a, x.dtype)
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)

    def conv(x, w, dtype=None):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w, x.dtype), (1, 1), 'VALID',
            dimension_numbers=dn)

    def pool(x):
        return jax.lax.reduce_window(
            x, jnp.finfo(x.dtype).min, jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), 'SAME')

    def pnet_bf16(x):
        x = prelu(conv(x, w1), a1)
        x = pool(x)
        x = prelu(conv(x, w2), a2)
        x = prelu(conv(x, w3), a3)
        return jnp.concatenate([conv(x, wc), conv(x, wr)], -1)

    def qconv(x, w, xs):
        # symmetric per-channel weights, per-tensor activations
        wmax = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12)
        ws = (wmax / 127.0).astype(np.float32)
        wq = jnp.asarray(np.clip(np.round(w / ws), -127, 127), jnp.int8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), 'VALID', dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (jnp.asarray(ws) * xs)

    def pnet_int8(x):
        x = prelu(qconv(x, w1, 0.05), a1).astype(jnp.bfloat16)
        x = pool(x)
        x = prelu(qconv(x, w2, 0.05), a2).astype(jnp.bfloat16)
        x = prelu(qconv(x, w3, 0.05), a3).astype(jnp.bfloat16)
        return jnp.concatenate(
            [qconv(x, wc, 0.05), qconv(x, wr, 0.05)], -1)

    for h, w_ in LEVELS:
        tb = chained(pnet_bf16, (BATCH, h, w_, 3))
        ti = chained(pnet_int8, (BATCH, h, w_, 3))
        print(f'  level {h}x{w_}: bf16 {tb*1e3:7.3f} ms  int8 '
              f'{ti*1e3:7.3f} ms  ratio {tb/ti:4.2f}x', flush=True)


if __name__ == '__main__':
    main()
