"""Batch-in-features grouped-conv P-Net: the lane-padding fix without Pallas.

The XLA P-Net is HBM-bound because feature-minor conv layouts pad
3..32-channel activations to 128 lanes (12.8x traffic amplification —
see the HLO dump analysis in detectors/mtcnn/pallas_pnet.py docstring).
Folding the 16-image batch into the feature dimension with
feature_group_count=16 makes the feature sizes 48 / 160 / 256 / 512, so
the padded layouts waste at most 1.6x.

Run on the real chip: python tools/try_grouped_pnet.py
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


def grouped_weights(params, batch):
    """Tile the P-Net conv kernels across `batch` groups."""
    import jax.numpy as jnp

    def tile(k):
        return jnp.tile(jnp.asarray(k, jnp.float32), (1, 1, 1, batch))

    def trow(v):
        return jnp.tile(jnp.asarray(v, jnp.float32), (batch,))

    return {
        'w1': tile(params['conv1']['kernel']), 'b1': trow(params['conv1']['bias']),
        'a1': trow(params['prelu1']['alpha']),
        'w2': tile(params['conv2']['kernel']), 'b2': trow(params['conv2']['bias']),
        'a2': trow(params['prelu2']['alpha']),
        'w3': tile(params['conv3']['kernel']), 'b3': trow(params['conv3']['bias']),
        'a3': trow(params['prelu3']['alpha']),
        'wc': tile(params['cls']['kernel']), 'bc': trow(params['cls']['bias']),
        'wr': tile(params['reg']['kernel']), 'br': trow(params['reg']['bias']),
    }


def grouped_forward(gw, x, batch):
    """x: [B, sh, sw, 3] normalized -> (probs [B, gh, gw], reg [B, gh, gw, 4])."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 3), (1, 1, 1, 1),
                                        ('NHWC', 'HWIO', 'NHWC'))

    def conv(z, k, groups):
        return jax.lax.conv_general_dilated(
            z, k.astype(z.dtype), (1, 1), 'VALID', dimension_numbers=dn,
            feature_group_count=groups)

    def prelu(z, a):
        a = a.astype(z.dtype)
        return jnp.where(z >= 0, z, a * z)

    # [B, h, w, 3] -> [1, h, w, B*3]
    z = jnp.transpose(x, (1, 2, 0, 3)).reshape(
        (1,) + x.shape[1:3] + (batch * 3,)).astype(jnp.bfloat16)

    z = prelu(conv(z, gw['w1'], batch) + gw['b1'].astype(jnp.bfloat16),
              gw['a1'])
    z = nn.max_pool(z, (2, 2), strides=(2, 2), padding='SAME')
    z = prelu(conv(z, gw['w2'], batch) + gw['b2'].astype(jnp.bfloat16),
              gw['a2'])
    z = prelu(conv(z, gw['w3'], batch) + gw['b3'].astype(jnp.bfloat16),
              gw['a3'])

    cls = (conv(z, gw['wc'], batch) + gw['bc'].astype(jnp.bfloat16)
           ).astype(jnp.float32)
    reg = (conv(z, gw['wr'], batch) + gw['br'].astype(jnp.bfloat16)
           ).astype(jnp.float32)

    gh, gw_ = cls.shape[1], cls.shape[2]
    cls = cls.reshape(gh, gw_, batch, 2)
    reg = reg.reshape(gh, gw_, batch, 4)
    probs = jax.nn.softmax(cls, axis=-1)[..., 1]
    return (jnp.transpose(probs, (2, 0, 1)),
            jnp.transpose(reg, (2, 0, 1, 3)))


def main():
    import jax
    import jax.numpy as jnp

    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    from facenet_tpu.detectors.mtcnn.networks import normalize_crops

    det = MTCNN(image_shape=(480, 640))
    params = det.params['pnet']
    gw = grouped_weights(params, 16)
    rng = np.random.RandomState(0)

    # numerics on a small shape
    xs = rng.randint(0, 256, (16, 61, 83, 3)).astype(np.float32)
    xn = jnp.asarray(normalize_crops(jnp.asarray(xs)))
    p_ref, r_ref = jax.jit(
        lambda q: det.pnet.apply({'params': params}, q))(xn)
    p_new, r_new = jax.jit(
        lambda q: grouped_forward(gw, q, 16))(xn)
    print('p err', float(jnp.max(jnp.abs(p_ref - p_new))),
          'r err', float(jnp.max(jnp.abs(r_ref - r_new))), flush=True)

    images = jax.device_put(
        rng.randint(0, 256, (16, 480, 640, 3), dtype=np.uint8))

    def all_levels(path):
        def fn(imgs):
            base = normalize_crops(imgs.astype(jnp.float32)).astype(
                jnp.bfloat16)
            acc = jnp.float32(0)
            for level in range(len(det.scales)):
                v, hm = det._resize_mats[level]
                t_ = jnp.einsum('iy,byxc->bixc', v, base)
                scaled = jnp.einsum('bixc,xj->bijc', t_, hm)
                if path == 'grouped':
                    p, r = grouped_forward(gw, scaled, 16)
                else:
                    p, r = det.pnet.apply({'params': params}, scaled)
                acc = acc + jnp.sum(p) + jnp.sum(r[..., 0])
            return acc, imgs + (acc * 0).astype(jnp.uint8)
        return fn

    t_flax = chain_time(jax.jit(all_levels('flax')), images)
    print(f'flax all levels+resize:    {1000 * t_flax:7.2f} ms/batch16',
          flush=True)
    t_grp = chain_time(jax.jit(all_levels('grouped')), images)
    print(f'grouped all levels+resize: {1000 * t_grp:7.2f} ms/batch16',
          flush=True)
    print(f'speedup: {t_flax / t_grp:.2f}x', flush=True)


if __name__ == '__main__':
    main()
