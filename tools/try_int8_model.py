"""End-to-end int8 vs bf16 serving throughput of the full IRv1-512.

tools/try_int8_conv.py measured isolated conv shapes at 0.79x-1.07x —
no clear int8 win. This measures the REAL quantized model (every conv
int8 via models/quantize.py, bottleneck bf16) against the bf16 fast
path with the bench.py chained-dispatch pattern, plus the embedding
agreement between the two paths on the same inputs.

Usage: python tools/try_int8_model.py [chunk] [k]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main():
    import jax
    import jax.numpy as jnp

    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models import irv1_fast
    from facenet_tpu.models.quantize import quantize_fast_params

    model = create_model()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (CHUNK, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=True)
    params, cfg = irv1_fast.build_fast_params(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, None)
    print('calibrating...', flush=True)
    qparams = quantize_fast_params(params, cfg, images[:32])

    def time_path(p, tag):
        def fwd(chk):
            return irv1_fast.fast_forward(p, cfg, chk)

        def run(arr, prev):
            def body(carry, chk):
                out = fwd(chk)
                return carry + out[0, 0] * 0, out[0, :8]
            acc, probe = jax.lax.scan(body, jnp.float32(0), arr)
            return probe, arr + (acc * 0).astype(arr.dtype)

        f = jax.jit(run)
        data = jnp.asarray(np.broadcast_to(images, (K,) + images.shape))
        out = jnp.zeros((K, 8), jnp.float32)
        cur = data
        t0 = time.perf_counter()
        out, cur = f(cur, out)
        np.asarray(out[0, 0])
        print(f'  {tag}: compile+first {time.perf_counter() - t0:.1f}s',
              flush=True)
        for _ in range(2):
            out, cur = f(cur, out)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            out, cur = f(cur, out)
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / (iters * K)
        print(f'  {tag}: {dt * 1e3:.3f} ms/chunk -> '
              f'{CHUNK / dt:,.0f} img/s', flush=True)
        return dt

    tb = time_path(params, 'bf16')
    ti = time_path(qparams, 'int8')
    print(f'ratio bf16/int8: {tb / ti:.2f}x')

    e_b = np.asarray(irv1_fast.fast_forward(params, cfg, images[:64]))
    e_i = np.asarray(irv1_fast.fast_forward(qparams, cfg, images[:64]))
    cos = np.sum(e_b * e_i, axis=1)
    print(f'embedding cosine bf16 vs int8: min {cos.min():.4f} '
          f'mean {cos.mean():.4f}')


if __name__ == '__main__':
    main()
