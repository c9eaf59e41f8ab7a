"""Crop extraction A/B: dense interp matmuls vs row-gather + x-matmul.

The cascade's R/O crop stage (ops/image_ops.crop_and_resize) computes
separable bilinear resampling as TWO DENSE matmuls per box: ry [S, H] @
img [H, W, C] @ rx [W, S]. ry/rx are 2-banded (each output row/col mixes
<= 2 source rows/cols), so the dense y-matmul spends H/2 ~ 240x the
necessary FLOPs at S=24, H=480 — at batch 64 the two crop stages are
~20 ms of the ~27 ms cascade (tools/profile_cascade.py round 4).

Alternative measured here: gather the <= 2S source ROWS each box needs
(contiguous [W, C] rows vectorize on lanes, unlike the per-pixel gathers
that lost in round 2), blend the row pairs on the VPU, then apply the
small dense x-interp matmul [S, W] @ [W, S].

Run: python tools/try_crop_gather.py [batch] [K] [S]

RESULT (v5e, 2026-08-19): MEASURED NEGATIVE at scale. B=16: 1.08x
(noise); B=64 K=64 S=24: 0.49x; B=64 K=32 S=48: 0.55x. The row gather's
HBM traffic (B*K*2S full [W, C] rows) swamps the FLOPs the banded
structure saves — XLA tiles the dense einsum well enough that the crop
stage is traffic-bound either way, and gathers amplify traffic. The
dense interp-matmul form in ops/image_ops.py stays.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from facenet_tpu.ops.image_ops import crop_and_resize, _interp_matrix

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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

    # ---- A: current dense-matmul crop_and_resize
    def dense(x):
        crops = crop_and_resize(x.astype(jnp.float32), boxes, S)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_a = chain_time(dense, images)
    print(f'dense matmul crop:    {1000 * t_a:8.2f} ms  '
          f'(B={batch} K={K} S={S})')

    # ---- B: row gather + blend + x-matmul
    def gather_crop(x):
        img = x.astype(jnp.float32)
        b, h, w, c = img.shape

        def per_box(image, box):
            x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
            # same sampling geometry as _interp_matrix: centers of S cells
            sy = (y2 - y1) / S
            ys = y1 + (jnp.arange(S, dtype=jnp.float32) + 0.5) * sy - 0.5
            ys = jnp.clip(ys, 0.0, h - 1.0)
            y0 = jnp.floor(ys).astype(jnp.int32)
            y1i = jnp.minimum(y0 + 1, h - 1)
            wy = (ys - y0.astype(jnp.float32))[:, None, None]
            rows = (image[y0] * (1 - wy) + image[y1i] * wy)   # [S, W, C]
            rx = _interp_matrix(box[0], box[2], w, S)          # [S, W]
            return jnp.einsum('swc,tw->stc', rows, rx)

        crops = jax.vmap(lambda im, bx: jax.vmap(
            partial(per_box, im))(bx))(img, boxes)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_b = chain_time(gather_crop, images)
    print(f'row-gather + x-matmul:{1000 * t_b:8.2f} ms  '
          f'({t_a / t_b:.2f}x vs dense)')

    # numerical agreement (same geometry contract)
    a = crop_and_resize(images.astype(jnp.float32), boxes, S)

    def per_box_host(image, box):
        h, w = image.shape[:2]
        sy = (box[3] - box[1]) / S
        ys = box[1] + (np.arange(S, dtype=np.float32) + 0.5) * sy - 0.5
        ys = np.clip(ys, 0.0, h - 1.0)
        y0 = np.floor(ys).astype(np.int32)
        y1i = np.minimum(y0 + 1, h - 1)
        wy = (ys - y0)[:, None, None]
        rows = image[y0] * (1 - wy) + image[y1i] * wy
        rx = np.asarray(_interp_matrix(box[0], box[2], w, S))
        return np.einsum('swc,tw->stc', rows, rx)

    b0 = per_box_host(np.asarray(images[0], np.float32),
                      np.asarray(boxes[0, 0]))
    diff = np.abs(np.asarray(a[0, 0]) - b0).max()
    print(f'max abs diff vs dense (1 box): {diff:.4f}')


if __name__ == '__main__':
    main()
