"""MEASURED NEGATIVE (round 3): NCHW shifted-einsum P-Net vs the flax path.

Result on v5e (2026-08-17): numerics match (max prob diff 0.001) but the
NCHW shifted-einsum form is 0.65x — 11.75 ms vs 7.66 ms/batch16 for all
pyramid levels' resize+convs. XLA's native NHWC convolutions beat a
manual einsum decomposition even though NHWC puts the tiny channel counts
on lanes; together with the round-2 HBM-im2col negative (commit 7c5ef00)
this pins the requirement: beating XLA here needs VMEM-resident fusion
(detectors/mtcnn/pallas_pnet.py), not an XLA-level relayout.

Self-contained: the candidate implementation lives in this file.
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
    from facenet_tpu.detectors.mtcnn.networks import normalize_crops

    class fast_pnet:
        """Candidate (rejected) implementation — see module docstring."""

        @staticmethod
        def conv_shifted(x, kernel, out_dtype=None):
            kh, kw, ci, co = kernel.shape
            h_out = x.shape[2] - kh + 1
            w_out = x.shape[3] - kw + 1
            acc = None
            for dy in range(kh):
                for dx in range(kw):
                    term = jnp.einsum(
                        'oc,bcyx->boyx', kernel[dy, dx].T,
                        x[:, :, dy:dy + h_out, dx:dx + w_out],
                        preferred_element_type=jnp.float32)
                    acc = term if acc is None else acc + term
            return acc.astype(out_dtype) if out_dtype is not None else acc

        @staticmethod
        def prelu_nchw(x, alpha):
            a = alpha.astype(x.dtype)[None, :, None, None]
            return jnp.where(x >= 0, x, a * x)

        @staticmethod
        def maxpool2_nchw(x):
            b, c, h, w = x.shape
            ph, pw = (-h) % 2, (-w) % 2
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)),
                            constant_values=-jnp.inf)
            h2, w2 = x.shape[2] // 2, x.shape[3] // 2
            return x.reshape(b, c, h2, 2, w2, 2).max(axis=(3, 5))

        @staticmethod
        def pnet_forward_nchw(params, x, dtype=jnp.bfloat16):
            f = fast_pnet
            x = x.astype(dtype)
            x = f.conv_shifted(x, params['conv1']['kernel'].astype(dtype),
                               dtype)
            x = x + params['conv1']['bias'].astype(dtype)[None, :, None,
                                                          None]
            x = f.prelu_nchw(x, params['prelu1']['alpha'])
            x = f.maxpool2_nchw(x)
            x = f.conv_shifted(x, params['conv2']['kernel'].astype(dtype),
                               dtype)
            x = x + params['conv2']['bias'].astype(dtype)[None, :, None,
                                                          None]
            x = f.prelu_nchw(x, params['prelu2']['alpha'])
            x = f.conv_shifted(x, params['conv3']['kernel'].astype(dtype),
                               dtype)
            x = x + params['conv3']['bias'].astype(dtype)[None, :, None,
                                                          None]
            x = f.prelu_nchw(x, params['prelu3']['alpha'])
            cls = f.conv_shifted(x, params['cls']['kernel'].astype(dtype))
            cls = cls + params['cls']['bias'].astype(
                jnp.float32)[None, :, None, None]
            reg = f.conv_shifted(x, params['reg']['kernel'].astype(dtype))
            reg = reg + params['reg']['bias'].astype(
                jnp.float32)[None, :, None, None]
            probs = jnp.exp(cls[:, 1] - jnp.logaddexp(cls[:, 0], cls[:, 1]))
            return probs, jnp.transpose(reg, (0, 2, 3, 1))

        @staticmethod
        def resize_nchw(base, v, hm):
            t = jnp.einsum('iy,bcyx->bcix', v, base)
            return jnp.einsum('bcix,xj->bcij', t, hm)

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
