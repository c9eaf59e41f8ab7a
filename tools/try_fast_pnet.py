"""Equivalence + timing of the NCHW shifted-einsum P-Net vs the flax path.

Run on the real chip: python tools/try_fast_pnet.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def chain_time(jfn, feed, iters=20, warmup=3):
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


def main():
    import jax
    import jax.numpy as jnp

    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    from facenet_tpu.detectors.mtcnn import fast_pnet
    from facenet_tpu.detectors.mtcnn.networks import normalize_crops

    det = MTCNN(image_shape=(480, 640))
    params = det.params['pnet']
    rng = np.random.RandomState(0)

    # ---- numerics: NCHW path == flax path (bf16 tolerance), small input
    x = rng.randint(0, 256, (2, 100, 120, 3)).astype(np.float32)
    xn = np.asarray(normalize_crops(jnp.asarray(x)))
    p_ref, r_ref = jax.jit(
        lambda q: det.pnet.apply({'params': params}, q))(xn)
    p_new, r_new = jax.jit(
        lambda q: fast_pnet.pnet_forward_nchw(
            params, jnp.transpose(q, (0, 3, 1, 2))))(xn)
    p_err = float(jnp.max(jnp.abs(p_ref - p_new)))
    r_err = float(jnp.max(jnp.abs(r_ref - r_new)))
    print(f'max |probs diff| = {p_err:.5f}  max |reg diff| = {r_err:.5f}',
          flush=True)
    assert p_err < 0.02 and r_err < 0.05, 'numerics mismatch'

    # ---- timing: all pyramid levels, resize + convs, batch 16
    images = jax.device_put(
        rng.randint(0, 256, (16, 480, 640, 3), dtype=np.uint8))

    def old_path(imgs):
        base = normalize_crops(imgs.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for level in range(len(det.scales)):
            v, hm = det._resize_mats[level]
            t = jnp.einsum('iy,byxc->bixc', v, base)
            scaled = jnp.einsum('bixc,xj->bijc', t, hm)
            probs, reg = det.pnet.apply({'params': params}, scaled)
            acc = acc + jnp.sum(probs) + jnp.sum(reg[..., 0])
        return acc, imgs + (acc * 0).astype(jnp.uint8)

    def new_path(imgs):
        base = normalize_crops(imgs.astype(jnp.float32)).astype(jnp.bfloat16)
        base = jnp.transpose(base, (0, 3, 1, 2))    # NCHW once
        acc = jnp.float32(0)
        for level in range(len(det.scales)):
            v, hm = det._resize_mats[level]
            scaled = fast_pnet.resize_nchw(base, v, hm)
            probs, reg = fast_pnet.pnet_forward_nchw(params, scaled)
            acc = acc + jnp.sum(probs) + jnp.sum(reg[..., 0])
        return acc, imgs + (acc * 0).astype(jnp.uint8)

    t_old = chain_time(jax.jit(old_path), images)
    print(f'flax NHWC resize+convs:    {1000 * t_old:7.2f} ms/batch16',
          flush=True)
    t_new = chain_time(jax.jit(new_path), images)
    print(f'NCHW shifted-einsum path:  {1000 * t_new:7.2f} ms/batch16',
          flush=True)
    print(f'speedup: {t_old / t_new:.2f}x', flush=True)


if __name__ == '__main__':
    main()
