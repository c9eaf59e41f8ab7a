"""Time the fused Pallas P-Net vs the flax path on the real chip.

Usage: python tools/try_pallas_pnet.py [level|-1 for all] [iters]
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
    from facenet_tpu.detectors.mtcnn import pallas_pnet
    from facenet_tpu.detectors.mtcnn.networks import normalize_crops

    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    det = MTCNN(image_shape=(480, 640))
    params = det.params['pnet']
    w = pallas_pnet.pack_weights(params)
    w_dev = {k: jax.device_put(jnp.asarray(v)) for k, v in w.items()}
    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 256, (16, 480, 640, 3), dtype=np.uint8))

    import math
    levels = [(int(math.ceil(480 * s)), int(math.ceil(640 * s)))
              for s in det.scales]
    print('levels:', levels, flush=True)

    # ---- level-0 only comparison (convs only, NCHW input prepared)
    sh, sw = levels[0]
    scaled0 = jnp.asarray(rng.normal(size=(16, 3, sh, sw)), jnp.bfloat16)
    scaled0 = jax.device_put(scaled0)

    def pallas_l0(x):
        p, r = pallas_pnet.pnet_forward_pallas(w_dev, x)
        acc = jnp.sum(p) + jnp.sum(r[..., 0])
        return acc, x + (acc * 0).astype(x.dtype)

    t = chain_time(jax.jit(pallas_l0), scaled0, iters)
    print(f'pallas level0 convs:      {1000 * t:7.2f} ms/batch16', flush=True)

    scaled0_nhwc = jax.device_put(jnp.transpose(scaled0, (0, 2, 3, 1)))

    def flax_l0(x):
        p, r = det.pnet.apply({'params': params}, x)
        acc = jnp.sum(p) + jnp.sum(r[..., 0])
        return acc, x + (acc * 0).astype(x.dtype)

    t = chain_time(jax.jit(flax_l0), scaled0_nhwc, iters)
    print(f'flax   level0 convs:      {1000 * t:7.2f} ms/batch16', flush=True)

    # ---- all levels: resize (NHWC einsum) + convs
    def all_pallas(imgs):
        base = normalize_crops(imgs.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for level in range(len(det.scales)):
            v, hm = det._resize_mats[level]
            t_ = jnp.einsum('iy,byxc->bixc', v, base)
            scaled = jnp.einsum('bixc,xj->bijc', t_, hm)
            x = jnp.transpose(scaled, (0, 3, 1, 2))
            p, r = pallas_pnet.pnet_forward_pallas(w_dev, x)
            acc = acc + jnp.sum(p) + jnp.sum(r[..., 0])
        return acc, imgs + (acc * 0).astype(jnp.uint8)

    t = chain_time(jax.jit(all_pallas), images, iters)
    print(f'pallas all levels+resize: {1000 * t:7.2f} ms/batch16', flush=True)


if __name__ == '__main__':
    main()
