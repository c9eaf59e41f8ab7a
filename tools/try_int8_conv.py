"""Probe: does XLA-TPU run int8 convolutions at the MXU's 2x int8 rate?

v5e peak is ~394 TOPS int8 vs ~197 TFLOPS bf16. If XLA lowers an
int8xint8->int32 conv to the MXU int8 path, a quantized IRv1 serving
path could approach 2x the bf16 fast path. This times representative
IRv1 fast-path conv shapes in bf16 vs int8 (chained pattern — see
bench.py for why block_until_ready is unreliable here), including the
quantize/dequantize epilogue a real serving path would pay.

Usage: python tools/try_int8_conv.py [chunk]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = 8

# (name, spatial, in_ch, out_ch, kernel, stride)
SHAPES = [
    ('b17-1x1 17x17 896->256', 17, 896, 256, 1, 1),
    ('b17-7x1ish 17x17 128->128x7', 17, 128, 896, 1, 1),
    ('m6a-3x3s2 35x35 256->384', 35, 256, 384, 3, 2),
    ('stem-3x3 77x77 32->64', 77, 32, 64, 3, 1),
    ('4a-3x3 37x37 80->192', 37, 80, 192, 3, 1),
]


def chained(fn, x):
    data = jnp.stack([x] * K)

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
    print(f'chunk={CHUNK}')
    for name, hw, ic, oc, k, s in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (CHUNK, hw, hw, ic)),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (k, k, ic, oc)), jnp.bfloat16)
        wq = jnp.asarray(rng.randint(-127, 128, (k, k, ic, oc)), jnp.int8)
        wscale = jnp.asarray(rng.uniform(1e-3, 2e-3, (oc,)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 1, (oc,)), jnp.float32)
        pad = 'SAME' if s == 1 else 'VALID'

        def bf16_conv(xc, w=w, bias=bias, s=s, pad=pad):
            y = jax.lax.conv_general_dilated(
                xc, w, (s, s), pad, dimension_numbers=dn)
            return jax.nn.relu(y + bias.astype(y.dtype))

        def int8_conv(xc, wq=wq, wscale=wscale, bias=bias, s=s, pad=pad):
            xs = 127.0 / 4.0          # stand-in activation scale
            xq = jnp.clip(jnp.round(xc.astype(jnp.float32) * xs),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, (s, s), pad, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * (wscale / xs)
            return jax.nn.relu(yf + bias).astype(jnp.bfloat16)

        tb = chained(bf16_conv, x)
        ti = chained(int8_conv, x)
        macs = (hw // s) * (hw // s) * oc * ic * k * k * CHUNK
        print(f'  {name:28s} bf16 {tb*1e3:7.3f} ms ({2*macs/tb/1e12:5.1f} '
              f'TFLOP/s)  int8 {ti*1e3:7.3f} ms ({2*macs/ti/1e12:5.1f} '
              f'TOP/s)  ratio {tb/ti:4.2f}x')


if __name__ == '__main__':
    main()
