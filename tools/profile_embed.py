"""Per-stage timing of the fused IRv1 serving forward (VERDICT r2 next #7).

Times jitted PREFIXES of models/irv1_fast.py fast_forward at the bench
geometry (chained-output pattern from bench.py — block_until_ready is
unreliable through the axon tunnel). The difference between consecutive
prefixes attributes time to each stage group:

  pre    : image preprocessing (uint8 -> normalized bf16)
  stem   : s2d conv1 + conv2a + conv2b + maxpool + 3b_1x1 + 4a + 4b
  b35    : Block35 x5 stack
  m6a    : Mixed_6a reduction
  b17    : Block17 x10 stack
  m7a    : Mixed_7a reduction
  b8     : Block8 x6 stack
  head   : avgpool + bottleneck dense + L2

Usage: python tools/profile_embed.py [chunk] [k]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models import irv1_fast as F
    from facenet_tpu.ops.preprocessing import image_processing

    model = create_model()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (k, chunk, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), images[0, :1], train=False)
    params, cfg = F.build_fast_params(variables)

    dtype = jnp.bfloat16

    def prefix(params, x, upto):
        """fast_forward truncated after stage `upto` (same math/order)."""
        x = image_processing(x, 160, 0, dtype=dtype)
        if upto == 'pre':
            return x
        b, h, w, c = x.shape
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = jax.nn.relu(F._conv(xs, params['Conv2d_1a_s2d'], 1, 'VALID'))
        x = F._crelu(x, params['Conv2d_2a_3x3'], 1, 'VALID')
        x = F._crelu(x, params['Conv2d_2b_3x3'], 1, 'VALID')
        x = jax.lax.reduce_window(
            x, jnp.finfo(x.dtype).min, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
        x = F._crelu(x, params['Conv2d_3b_1x1'], 1, 'VALID')
        x = F._crelu(x, params['Conv2d_4a_3x3'], 1, 'VALID')
        x = F._crelu(x, params['Conv2d_4b_3x3'], 2, 'VALID')
        if upto == 'stem':
            return x
        scale35 = jnp.asarray(float(cfg.block35.scale), dtype)
        for i in range(int(cfg.block35.repeat)):
            w = params[f'Repeat.block35_{i + 1}']
            heads = F._crelu(x, w['heads'])
            t0, t1, t2 = heads[..., :32], heads[..., 32:64], heads[..., 64:96]
            t1 = F._crelu(t1, w['b1b'])
            t2 = F._crelu(F._crelu(t2, w['b2b']), w['b2c'])
            up = F._conv(jnp.concatenate([t0, t1, t2], axis=3), w['up'])
            x = jax.nn.relu(x + scale35 * up)
        if upto == 'b35':
            return x
        w = params['Mixed_6a']
        t0 = F._crelu(x, w['b0'], 2, 'VALID')
        t1 = F._crelu(F._crelu(F._crelu(x, w['b1a']), w['b1b']),
                      w['b1c'], 2, 'VALID')
        tp = jax.lax.reduce_window(
            x, jnp.finfo(x.dtype).min, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
        x = jnp.concatenate([t0, t1, tp], axis=3)
        if upto == 'm6a':
            return x
        scale17 = jnp.asarray(float(cfg.block17.scale), dtype)
        for i in range(int(cfg.block17.repeat)):
            w = params[f'Repeat_1.block17_{i + 1}']
            heads = F._crelu(x, w['heads'])
            t0, t1 = heads[..., :128], heads[..., 128:]
            t1 = F._crelu(F._crelu(t1, w['b1b']), w['b1c'])
            up = F._conv(jnp.concatenate([t0, t1], axis=3), w['up'])
            x = jax.nn.relu(x + scale17 * up)
        if upto == 'b17':
            return x
        w = params['Mixed_7a']
        heads = F._crelu(x, w['heads'])
        h0, h1, h2 = heads[..., :256], heads[..., 256:512], heads[..., 512:]
        t0 = F._crelu(h0, w['b0b'], 2, 'VALID')
        t1 = F._crelu(h1, w['b1b'], 2, 'VALID')
        t2 = F._crelu(F._crelu(h2, w['b2b']), w['b2c'], 2, 'VALID')
        tp = jax.lax.reduce_window(
            x, jnp.finfo(x.dtype).min, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
        x = jnp.concatenate([t0, t1, t2, tp], axis=3)
        if upto == 'm7a':
            return x
        n8 = int(cfg.block8_1.repeat)
        for i in range(n8 + 1):
            final = i == n8
            blk = 'Block8' if final else f'Repeat_2.block8_{i + 1}'
            w = params[blk]
            heads = F._crelu(x, w['heads'])
            t0, t1 = heads[..., :192], heads[..., 192:]
            t1 = F._crelu(F._crelu(t1, w['b1b']), w['b1c'])
            up = F._conv(jnp.concatenate([t0, t1], axis=3), w['up'])
            scale = float(cfg.block8_2.scale if final else cfg.block8_1.scale)
            act = cfg.block8_2.activation if final else cfg.block8_1.activation
            x = x + jnp.asarray(scale, dtype) * up
            if act:
                x = jax.nn.relu(x)
        if upto == 'b8':
            return x
        x = jax.lax.reduce_window(
            x, jnp.zeros((), x.dtype), jax.lax.add,
            (1, 3, 3, 1), (1, 3, 3, 1), 'VALID') / jnp.asarray(9.0, x.dtype)
        x = x.reshape((x.shape[0], -1))
        w = params['Bottleneck']
        x = (jnp.dot(x, w['k'], preferred_element_type=jnp.float32)
             + w['b'].astype(jnp.float32))
        norm = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(x), axis=1, keepdims=True), 1e-10))
        return x / norm

    stages = ['pre', 'stem', 'b35', 'm6a', 'b17', 'm7a', 'b8', 'head']

    device = jax.devices()[0]
    params_d = jax.device_put(params, device)
    imgs_d = jax.device_put(images, device)

    def make_fn(upto):
        def chained(params, images, prev):
            def body(carry, chk):
                out = prefix(params, chk, upto)
                flat = out.reshape(out.shape[0], -1)
                return carry + flat[0, 0].astype(jnp.float32) * 0, \
                    flat[0, :8].astype(jnp.float32)
            acc, probe = jax.lax.scan(body, jnp.float32(0), images)
            return probe, images + (acc * 0).astype(jnp.uint8)
        return jax.jit(chained)

    def timeit(fn, iters=6, warmup=2):
        out = jnp.zeros((k, 8), jnp.float32)
        cur = imgs_d
        for _ in range(warmup):
            out, cur = fn(params_d, cur, out)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out, cur = fn(params_d, cur, out)
        np.asarray(out[0, 0])
        return (time.perf_counter() - t0) / (iters * k)   # s per chunk

    times = {}
    for s in stages:
        fn = make_fn(s)
        t = timeit(fn)
        times[s] = t
        print(f'prefix {s:>5}: {t * 1e3:8.3f} ms/chunk  '
              f'({t / chunk * 1e6:6.2f} us/img cumulative)', flush=True)

    print(f'\nchunk={chunk} k={k}  per-stage attribution:')
    prev = 0.0
    for s in stages:
        dt = times[s] - prev
        print(f'  {s:>5}: {dt * 1e3:7.3f} ms/chunk   {dt / chunk * 1e6:6.2f} us/img')
        prev = times[s]
    total = times['head']
    print(f'  total: {total * 1e3:7.3f} ms/chunk -> '
          f'{chunk / total:,.0f} img/s')


if __name__ == '__main__':
    main()
