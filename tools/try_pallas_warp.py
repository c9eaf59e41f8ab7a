"""Time ONLY the fused Pallas warp chain (crop + dense_warp_pallas) and
check parity against the XLA dense path on device — the fast iteration
loop for ops/pallas_warp.py (full ladder: tools/try_align.py).

Run: python tools/try_pallas_warp.py [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from facenet_tpu.ops.image_ops import (
        canonical_landmarks, crop_and_resize, dense_warp, invert_affine,
        similarity_transform_from_points)
    from facenet_tpu.ops.pallas_warp import dense_warp_pallas
    from facenet_tpu.utils.synthetic import render_scene

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    S, T = 160, 224
    rng = np.random.RandomState(0)
    scenes = [render_scene(rng, shape=(480, 640),
                           n_faces=int(rng.randint(1, 3)))[0]
              for _ in range(batch)]
    images = jax.device_put(np.stack(scenes))

    tpl = canonical_landmarks(S) - S / 2.0
    lms = []
    for _ in range(batch):
        s = rng.uniform(0.7, 1.6)
        th = rng.uniform(-0.26, 0.26)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        c = np.array([rng.uniform(160, 480), rng.uniform(120, 360)])
        lms.append(tpl @ (s * R).T + c)
    landmarks = jnp.asarray(np.stack(lms).astype(np.float32))

    def geometry(lm):
        template = jnp.asarray(canonical_landmarks(S))
        inv = invert_affine(similarity_transform_from_points(lm, template))
        corners = jnp.asarray([[0.0, 0.0], [S - 1.0, 0.0], [0.0, S - 1.0],
                               [S - 1.0, S - 1.0]])
        src = corners @ inv[:, :2].T + inv[:, 2]
        lo = jnp.min(src, axis=0) - 4.0
        hi = jnp.max(src, axis=0) + 4.0
        sc = T / (hi - lo)
        a = inv[:, :2] * sc[:, None]
        t = (inv[:, 2] + 0.5 - lo) * sc - 0.5
        return jnp.concatenate([lo, hi]), jnp.concatenate(
            [a, t[:, None]], axis=1)

    def chain_time(fn, feed, iters=20, warmup=3):
        jfn = jax.jit(fn)
        cur = feed
        probe = None
        for _ in range(warmup):
            probe, cur = jfn(cur)
        float(np.asarray(probe))
        t0 = time.perf_counter()
        for _ in range(iters):
            probe, cur = jfn(cur)
        float(np.asarray(probe))
        return (time.perf_counter() - t0) / iters

    def make(warp):
        def step(x):
            img = x.astype(jnp.float32)
            boxes, mats = jax.vmap(geometry)(landmarks)
            inter = crop_and_resize(img, boxes[:, None, :], T)[:, 0]
            crops = warp(inter, mats)
            acc = jnp.sum(crops[..., 0].astype(jnp.float32))
            return acc, x + (acc * 0).astype(jnp.uint8)
        return step

    t_p = chain_time(make(lambda i, m: dense_warp_pallas(i, m, (S, S))),
                     images)
    print(f'crop+pallas: {1000 * t_p:8.2f} ms/batch{batch}')
    t_x = chain_time(make(lambda i, m: dense_warp(i, m, (S, S))), images)
    print(f'crop+xla:    {1000 * t_x:8.2f} ms/batch{batch} '
          f'(pallas = {t_x / t_p:.2f}x)')

    # device parity
    img = images.astype(jnp.float32)
    boxes, mats = jax.vmap(geometry)(landmarks)
    inter = crop_and_resize(img, boxes[:, None, :], T)[:, 0]
    a = np.asarray(dense_warp(inter, mats, (S, S)))
    b = np.asarray(dense_warp_pallas(inter, mats, (S, S)))
    d = np.abs(a - b)
    print(f'pallas vs xla dense: mean abs {d.mean():.3f}, '
          f'max {d.max():.3f} (0-255)')


if __name__ == '__main__':
    main()
