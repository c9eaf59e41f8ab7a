"""Alignment A/B: full-source affine warp vs pre-crop + small-source warp.

Round-4 finding: detect->align->embed ran at 452 aligned emb/s while the
cascade alone does 2,559 img/s — `align_by_landmarks`'s per-pixel gather
warp over the full [480, 640] source costs ~1.7 ms/img and dominates the
chain. Hypothesis: the gather's cost scales with the SOURCE working set
(HBM-resident vs VMEM-resident), so cropping the face region first with
the separable-matmul crop (fast, exact) and warping from the small
intermediate should recover most of the time at ~1 LSB resample cost
(two bilinear passes instead of one).

Variants:
  warp-full   current path: similarity warp from [480, 640]
  crop+warp   crop_and_resize to [176+pad] around the warp's source quad,
              then warp from the small intermediate (composed matrices)
  crop-only   axis-aligned crop at the landmark bbox (no rotation) — the
              rate ceiling and the quality floor

Run: python tools/try_align.py [batch]
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
        affine_warp, align_by_landmarks, canonical_landmarks,
        crop_and_resize, invert_affine, similarity_transform_from_points)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    S = 160
    rng = np.random.RandomState(0)
    # face-like content, not white noise: double-resample error on noise
    # is ~15 mean-abs by construction and says nothing about face crops
    from facenet_tpu.utils.synthetic import render_scene
    scenes = [render_scene(rng, shape=(480, 640),
                           n_faces=int(rng.randint(1, 3)))[0]
              for _ in range(batch)]
    images = jax.device_put(np.stack(scenes))

    # plausible landmark sets: template scaled to a 120-260 px face,
    # rotated up to ~15 deg, placed randomly
    tpl = canonical_landmarks(S) - S / 2.0
    lms = []
    for _ in range(batch):
        s = rng.uniform(0.7, 1.6)
        th = rng.uniform(-0.26, 0.26)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        c = np.array([rng.uniform(160, 480), rng.uniform(120, 360)])
        lms.append(tpl @ (s * R).T + c)
    landmarks = jnp.asarray(np.stack(lms).astype(np.float32))

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

    # ---- A: current full-source warp
    def full(x):
        crops = align_by_landmarks(x.astype(jnp.float32), landmarks, S)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_a = chain_time(full, images)
    print(f'warp-full:  {1000 * t_a:8.2f} ms/batch{batch}')

    # ---- B: pre-crop + small-source warp
    INTER = 224    # intermediate side: covers the rotated out quad + taps

    def crop_warp(x):
        img = x.astype(jnp.float32)
        template = jnp.asarray(canonical_landmarks(S))

        def matrices(lm):
            fwd = similarity_transform_from_points(lm, template)
            inv = invert_affine(fwd)          # out px -> src px
            # source quad of the output square, padded by 8 px
            corners = jnp.asarray(
                [[0.0, 0.0], [S - 1.0, 0.0], [0.0, S - 1.0],
                 [S - 1.0, S - 1.0]])
            src = corners @ inv[:, :2].T + inv[:, 2]
            lo = jnp.min(src, axis=0) - 8.0
            hi = jnp.max(src, axis=0) + 8.0
            box = jnp.concatenate([lo, hi])   # x1 y1 x2 y2
            # crop maps src -> intermediate: x_i = (x_s - lo) * sc
            sc = INTER / (hi - lo)            # [2]
            # composed: out px -> intermediate px
            a = inv[:, :2] * sc[:, None]
            t = (inv[:, 2] - lo) * sc
            return box, jnp.concatenate([a, t[:, None]], axis=1)

        boxes, mats = jax.vmap(matrices)(landmarks)
        inter = crop_and_resize(img, boxes[:, None, :], INTER)[:, 0]
        crops = affine_warp(inter, mats, (S, S))
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_b = chain_time(crop_warp, images)
    print(f'crop+warp:  {1000 * t_b:8.2f} ms/batch{batch} '
          f'({t_a / t_b:.2f}x vs full)')

    # ---- B2: full-source warp but with FLAT 1-D gathers (y*w+x take)
    def warp_flat(x):
        img = x.astype(jnp.float32)
        template = jnp.asarray(canonical_landmarks(S))

        def mat_one(lm):
            return invert_affine(
                similarity_transform_from_points(lm, template))

        mats = jax.vmap(mat_one)(landmarks)
        h, w = img.shape[1], img.shape[2]
        ys, xs = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                              jnp.arange(S, dtype=jnp.float32),
                              indexing='ij')

        def one(image, m):
            in_x = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
            in_y = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
            y0 = jnp.floor(in_y)
            x0 = jnp.floor(in_x)
            wy = (in_y - y0)[..., None]
            wx = (in_x - x0)[..., None]
            y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
            y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
            x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
            x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
            flat = image.reshape(h * w, -1)
            v00 = jnp.take(flat, y0i * w + x0i, axis=0)
            v01 = jnp.take(flat, y0i * w + x1i, axis=0)
            v10 = jnp.take(flat, y1i * w + x0i, axis=0)
            v11 = jnp.take(flat, y1i * w + x1i, axis=0)
            top = v00 * (1 - wx) + v01 * wx
            bot = v10 * (1 - wx) + v11 * wx
            return top * (1 - wy) + bot * wy

        crops = jax.vmap(one)(img, mats)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_b2 = chain_time(warp_flat, images)
    print(f'warp-flat:  {1000 * t_b2:8.2f} ms/batch{batch} '
          f'({t_a / t_b2:.2f}x vs full)')

    # ---- D: crop + DENSE-WEIGHT rotation warp (no gathers at all).
    # Bilinear tap weights are relu(1 - |idx - src|): built by broadcast
    # over an iota, so the whole warp is (weights build) + (one MXU matmul
    # over source rows) + (a VPU weighted reduce over source cols). The
    # axis-aligned crop handles scale so the dense operand is only
    # [S*S, T]; coordinates compose through crop_and_resize's half-pixel
    # convention (sample i reads lo + (i+.5)/T*(hi-lo) - .5).
    T = 224     # rotation intermediate side (covers 160*sqrt(2) + taps)

    def crop_dense(x, mm_dtype=jnp.float32):
        img = x.astype(jnp.float32)
        template = jnp.asarray(canonical_landmarks(S))

        def geometry(lm):
            inv = invert_affine(
                similarity_transform_from_points(lm, template))
            corners = jnp.asarray(
                [[0.0, 0.0], [S - 1.0, 0.0], [0.0, S - 1.0],
                 [S - 1.0, S - 1.0]])
            src = corners @ inv[:, :2].T + inv[:, 2]
            lo = jnp.min(src, axis=0) - 4.0
            hi = jnp.max(src, axis=0) + 4.0
            box = jnp.concatenate([lo, hi])
            sc = T / (hi - lo)                      # [2] (x, y) scales
            # composed out-pixel -> intermediate-pixel affine, honoring
            # the crop's half-pixel mapping: j = sc*(x_s + .5 - lo) - .5
            a = inv[:, :2] * sc[:, None]
            t = (inv[:, 2] + 0.5 - lo) * sc - 0.5
            return box, jnp.concatenate([a, t[:, None]], axis=1)

        boxes, mats = jax.vmap(geometry)(landmarks)
        inter = crop_and_resize(img, boxes[:, None, :], T)[:, 0]

        ys, xs = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                              jnp.arange(S, dtype=jnp.float32),
                              indexing='ij')
        idx = jnp.arange(T, dtype=jnp.float32)

        def one(image, m):
            jx = jnp.clip(m[0, 0] * xs + m[0, 1] * ys + m[0, 2], 0., T - 1.)
            iy = jnp.clip(m[1, 0] * xs + m[1, 1] * ys + m[1, 2], 0., T - 1.)
            wy = jnp.maximum(0., 1. - jnp.abs(idx[None, :]
                                              - iy.reshape(-1)[:, None]))
            wx = jnp.maximum(0., 1. - jnp.abs(idx[None, :]
                                              - jx.reshape(-1)[:, None]))
            rows = (wy.astype(mm_dtype)                  # [S*S, T*3] MXU
                    @ image.reshape(T, T * 3).astype(mm_dtype))
            rows = rows.astype(jnp.float32).reshape(S * S, T, 3)
            out = jnp.sum(rows * wx[:, :, None], axis=1)  # VPU reduce
            return out.reshape(S, S, 3)

        crops = jax.lax.map(lambda t: jax.vmap(one)(*t),
                            (inter.reshape(8, -1, T, T, 3),
                             mats.reshape(8, -1, 2, 3)))
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_d = chain_time(crop_dense, images)
    print(f'crop+dense: {1000 * t_d:8.2f} ms/batch{batch} '
          f'({t_a / t_d:.2f}x vs full)')

    import functools
    t_d16 = chain_time(
        functools.partial(crop_dense, mm_dtype=jnp.bfloat16), images)
    print(f'crop+dense bf16: {1000 * t_d16:8.2f} ms/batch{batch} '
          f'({t_a / t_d16:.2f}x vs full)')

    # ---- E: crop + fused Pallas dense warp (ops/pallas_warp.py): the
    # XLA dense form is bound by the [pixels, T, 3] HBM round-trip; the
    # kernel keeps it in VMEM.
    from facenet_tpu.ops.pallas_warp import dense_warp_pallas

    def crop_pallas(x):
        img = x.astype(jnp.float32)
        template = jnp.asarray(canonical_landmarks(S))

        def geometry(lm):
            inv = invert_affine(
                similarity_transform_from_points(lm, template))
            corners = jnp.asarray(
                [[0.0, 0.0], [S - 1.0, 0.0], [0.0, S - 1.0],
                 [S - 1.0, S - 1.0]])
            src = corners @ inv[:, :2].T + inv[:, 2]
            lo = jnp.min(src, axis=0) - 4.0
            hi = jnp.max(src, axis=0) + 4.0
            box = jnp.concatenate([lo, hi])
            sc = T / (hi - lo)
            a = inv[:, :2] * sc[:, None]
            t = (inv[:, 2] + 0.5 - lo) * sc - 0.5
            return box, jnp.concatenate([a, t[:, None]], axis=1)

        boxes, mats = jax.vmap(geometry)(landmarks)
        inter = crop_and_resize(img, boxes[:, None, :], T)[:, 0]
        crops = dense_warp_pallas(inter, mats, (S, S))
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_e = chain_time(crop_pallas, images)
    print(f'crop+pallas: {1000 * t_e:8.2f} ms/batch{batch} '
          f'({t_a / t_e:.2f}x vs full)')

    # ---- C: axis-aligned crop only (ceiling)
    def crop_only(x):
        img = x.astype(jnp.float32)
        lo = jnp.min(landmarks, axis=1) - 40.0
        hi = jnp.max(landmarks, axis=1) + 40.0
        boxes = jnp.concatenate([lo, hi], axis=1)[:, None, :]
        crops = crop_and_resize(img, boxes, S)[:, 0]
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_c = chain_time(crop_only, images)
    print(f'crop-only:  {1000 * t_c:8.2f} ms/batch{batch} '
          f'({t_a / t_c:.2f}x vs full)')

    # ---- quality: crop+dense vs full-warp agreement (double-resample
    # cost on worst-case random-noise content; natural images differ less)
    a = align_by_landmarks(images.astype(jnp.float32), landmarks, S)
    # rebuild variant D's crops for comparison (same math, kept crops)
    img = images.astype(jnp.float32)
    template = jnp.asarray(canonical_landmarks(S))

    def geometry_host(lm):
        inv = invert_affine(similarity_transform_from_points(lm, template))
        corners = jnp.asarray([[0.0, 0.0], [S - 1.0, 0.0], [0.0, S - 1.0],
                               [S - 1.0, S - 1.0]])
        src = corners @ inv[:, :2].T + inv[:, 2]
        lo = jnp.min(src, axis=0) - 4.0
        hi = jnp.max(src, axis=0) + 4.0
        sc = 224.0 / (hi - lo)
        a2 = inv[:, :2] * sc[:, None]
        t2 = (inv[:, 2] + 0.5 - lo) * sc - 0.5
        return jnp.concatenate([lo, hi]), jnp.concatenate(
            [a2, t2[:, None]], axis=1)

    T = 224
    boxes, mats = jax.vmap(geometry_host)(landmarks)
    inter = crop_and_resize(img, boxes[:, None, :], T)[:, 0]
    ys, xs = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                          jnp.arange(S, dtype=jnp.float32), indexing='ij')
    idx = jnp.arange(T, dtype=jnp.float32)

    def one(image, m):
        jx = jnp.clip(m[0, 0] * xs + m[0, 1] * ys + m[0, 2], 0., T - 1.)
        iy = jnp.clip(m[1, 0] * xs + m[1, 1] * ys + m[1, 2], 0., T - 1.)
        wy = jnp.maximum(0., 1. - jnp.abs(idx[None, :]
                                          - iy.reshape(-1)[:, None]))
        wx = jnp.maximum(0., 1. - jnp.abs(idx[None, :]
                                          - jx.reshape(-1)[:, None]))
        rows = (wy @ image.reshape(T, T * 3)).reshape(S * S, T, 3)
        return jnp.sum(rows * wx[:, :, None], axis=1).reshape(S, S, 3)

    b = jax.vmap(one)(inter, mats)
    diff = jnp.abs(a - b)
    print(f'crop+dense vs full: mean abs {float(diff.mean()):.3f}, '
          f'p99 {float(jnp.percentile(diff, 99)):.3f} (0-255 scale)')


if __name__ == '__main__':
    main()
