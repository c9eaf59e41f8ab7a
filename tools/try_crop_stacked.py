"""Crop-stage A/B: per-box interp matmuls vs K-stacked tall matmuls.

crop_and_resize's y-interp runs one [S, H] @ [H, W*C] matmul per box —
M = S = 24 rows, so the 128-row MXU runs at <1/5 utilization (measured
~19 TFLOP/s effective at B=64 K=64). Stacking the K boxes' interp
matrices of one image into a single [K*S, H] operand makes M = 1536 and
turns the whole y-stage into one efficient batched matmul per image; the
x-interp stays per-box (it is 20x smaller).

Run: python tools/try_crop_stacked.py [batch] [K] [S]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from facenet_tpu.ops.image_ops import _interp_matrix, crop_and_resize

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 24

    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 256, (batch, 480, 640, 3), np.uint8))
    boxes = rng.uniform(0, 1, (batch, K, 4)).astype(np.float32)
    boxes = boxes * np.array([640, 480, 100, 100], np.float32)
    boxes[..., 2:] += boxes[..., :2]
    boxes = jnp.asarray(boxes)

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

    def dense(x):
        crops = crop_and_resize(x.astype(jnp.float32), boxes, S)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_a = chain_time(dense, images)
    print(f'per-box matmuls:  {1000 * t_a:8.2f} ms  (B={batch} K={K} S={S})')

    def stacked(x):
        img = x.astype(jnp.float32)
        b, h, w, c = img.shape

        def mats(box):
            return (_interp_matrix(box[1], box[3], h, S),
                    _interp_matrix(box[0], box[2], w, S))

        ry, rx = jax.vmap(jax.vmap(mats))(boxes)     # [B,K,S,H], [B,K,S,W]
        ry_tall = ry.reshape(b, K * S, h)            # one tall matmul/img
        t = jnp.einsum('bmh,bhwc->bmwc', ry_tall, img)
        t = t.reshape(b, K, S, w, c)
        crops = jnp.einsum('bkswc,bktw->bkstc', t, rx)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_b = chain_time(stacked, images)
    print(f'K-stacked y-matmul:{1000 * t_b:8.2f} ms  '
          f'({t_a / t_b:.2f}x vs per-box)')

    # agreement
    a = crop_and_resize(images.astype(jnp.float32), boxes, S)

    def one(x):
        return stacked(x)[0]

    img = images.astype(jnp.float32)
    ry = _interp_matrix(boxes[0, 0, 1], boxes[0, 0, 3], 480, S)
    rx = _interp_matrix(boxes[0, 0, 0], boxes[0, 0, 2], 640, S)
    t = jnp.einsum('sh,hwc->swc', ry, img[0])
    b0 = jnp.einsum('swc,tw->stc', t, rx)
    diff = float(jnp.abs(a[0, 0] - b0).max())
    print(f'max abs diff (1 box): {diff:.5f}')


if __name__ == '__main__':
    main()
