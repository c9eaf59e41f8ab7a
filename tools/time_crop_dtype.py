"""Focused A/B of crop_and_resize compute_dtype (f32 vs bf16) on chip.

profile_cascade.py's single-shot crop24 readings disagreed with the
expectation behind commit 4cc5596 (bf16 interp matmuls): one run showed
bf16 at 0.87x. This harness interleaves the two variants A/B/A/B over
several rounds (chained device-resident timing per CLAUDE.md) so tunnel
drift cancels, and prints per-round times plus medians for crop24
(K=64) and crop48 (K=32) at the cascade's real geometries.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from facenet_tpu.ops.image_ops import crop_and_resize


def chain_time(fn, feed, iters=20, warmup=3):
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


rng = np.random.RandomState(0)
images = jax.device_put(rng.randint(0, 256, (16, 480, 640, 3), np.uint8))


def make(size, k, dtype):
    boxes = rng.uniform(0, 1, (16, k, 4)).astype(np.float32)
    # (x1, y1, w, h) scales for a 480(H) x 640(W) image: x by W, y by H.
    boxes = boxes * np.array([640, 480, 60, 60], np.float32)
    boxes[..., 2:] += boxes[..., :2]
    boxes = jnp.asarray(boxes)

    def fn(x):
        crops = crop_and_resize(x.astype(jnp.float32), boxes, size,
                                compute_dtype=dtype)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)
    return fn


for size, k in ((24, 64), (48, 32)):
    fns = {'f32': make(size, k, jnp.float32),
           'bf16': make(size, k, jnp.bfloat16)}
    times = {n: [] for n in fns}
    for rnd in range(5):
        for name, fn in fns.items():
            times[name].append(chain_time(fn, images))
    med = {n: float(np.median(v)) for n, v in times.items()}
    runs = {n: '/'.join(f'{1000 * t:.2f}' for t in v)
            for n, v in times.items()}
    print(f'crop{size} (K={k}): f32 med {1000 * med["f32"]:.2f} ms '
          f'[{runs["f32"]}]  bf16 med {1000 * med["bf16"]:.2f} ms '
          f'[{runs["bf16"]}]  -> bf16 {med["f32"] / med["bf16"]:.2f}x',
          flush=True)
