"""Measure the flat-lane Pallas stem vs XLA's in-context stem.

Compares, at the serving chunk (128 images):
  A. XLA pre+stem: image_processing + s2d conv1 + conv2a + conv2b +
     maxpool (the fast_forward prefix through MaxPool_3a) — the
     in-context cost this kernel must beat (1.74 ms/chunk measured
     by tools/profile_embed.py).
  B. planes relayout (XLA: normalize + s2d transpose + pad) alone.
  C. relayout + Pallas stem kernel (ops/pallas_stem.py).

Chained-output timing per CLAUDE.md (block_until_ready lies through the
axon tunnel). Run with --cpu for the interpret-mode numerics check only.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    cpu = '--cpu' in sys.argv
    chunk = 128

    import jax
    if cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models import irv1_fast as F
    from facenet_tpu.ops import pallas_stem as S
    from facenet_tpu.ops.preprocessing import image_processing

    model = create_model()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (chunk, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    params, cfg = F.build_fast_params(variables)
    dtype = jnp.bfloat16

    def xla_prefix(params, x):
        x = image_processing(x, 160, 0, dtype=dtype)
        b, h, w, c = x.shape
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = jax.nn.relu(F._conv(xs, params['Conv2d_1a_s2d'], 1, 'VALID'))
        x = F._crelu(x, params['Conv2d_2a_3x3'], 1, 'VALID')
        x = F._crelu(x, params['Conv2d_2b_3x3'], 1, 'VALID')
        return jax.lax.reduce_window(
            x, jnp.finfo(x.dtype).min, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')

    def relayout(x):
        xn = image_processing(x, 160, 0, dtype=dtype)
        return S.to_planes(xn)

    def pallas_prefix(params, x, interpret=False):
        planes = relayout(x)
        packed = S.pack_stem(params)
        return S.stem_forward_flat(packed, planes, interpret=interpret)

    # --- numerics ---------------------------------------------------------
    ref = np.asarray(xla_prefix(params, jnp.asarray(images[:4])),
                     np.float32)
    new = np.asarray(pallas_prefix(params, jnp.asarray(images[:4]),
                                   interpret=cpu), np.float32)
    err = np.abs(ref - new).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    print(f'stem output {ref.shape} vs {new.shape}; '
          f'max abs err {err:.4f} (rel {rel:.2e})', flush=True)
    assert ref.shape == new.shape
    assert rel < 0.03, 'numerics mismatch'
    if cpu:
        return

    # --- timing -----------------------------------------------------------
    def chain_time(fn, feed, iters=30, warmup=4):
        jfn = jax.jit(fn)
        cur = feed
        for _ in range(warmup):
            probe, cur = jfn(cur)
        float(np.asarray(probe))
        t0 = time.perf_counter()
        for _ in range(iters):
            probe, cur = jfn(cur)
        float(np.asarray(probe))
        return (time.perf_counter() - t0) / iters

    feed = jax.device_put(jnp.asarray(images))

    def chained(core):
        def fn(x):
            out = core(x)
            probe = out.astype(jnp.float32).sum()
            return probe, x + (probe * 0).astype(jnp.uint8)
        return fn

    t_xla = chain_time(chained(lambda x: xla_prefix(params, x)), feed)
    print(f'A xla pre+stem      : {t_xla*1e3:7.3f} ms/chunk '
          f'({t_xla/chunk*1e6:5.2f} us/img)', flush=True)
    t_rel = chain_time(chained(relayout), feed)
    print(f'B relayout only     : {t_rel*1e3:7.3f} ms/chunk', flush=True)
    t_pal = chain_time(chained(lambda x: pallas_prefix(params, x)), feed)
    print(f'C relayout + kernel : {t_pal*1e3:7.3f} ms/chunk '
          f'({t_pal/chunk*1e6:5.2f} us/img)  -> {t_xla/t_pal:.2f}x',
          flush=True)


if __name__ == '__main__':
    main()
