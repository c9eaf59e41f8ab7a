"""Stage-level timing of the MTCNN cascade on the real chip.

Chained-execution timing (CLAUDE.md: block_until_ready lies through the
axon tunnel): each iteration's input depends on the previous iteration's
output, one scalar fetched at the end.

Usage: python tools/profile_cascade.py [batch] [iters]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def chain_time(fn, feed, iters=20, warmup=3):
    """fn(x) -> (probe_scalar, x_next); returns seconds/call."""
    import jax
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


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    from facenet_tpu.detectors.mtcnn.networks import normalize_crops
    from facenet_tpu.ops.nms import batched_nms_mask, top_k_boxes

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    det = MTCNN(image_shape=(480, 640))
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (batch, 480, 640, 3), dtype=np.uint8)
    images = jax.device_put(images)

    def perturb(x):
        # keeps the chain honest: next input depends on previous output
        return x

    # ---- full cascade
    def full(x):
        out = det._detect(det.params, x)
        probe = out['scores'].sum()
        return probe, x + (probe * 0).astype(jnp.uint8)

    t_full = chain_time(full, images, iters)
    print(f'full cascade:        {1000 * t_full:8.2f} ms/batch{batch}')

    # ---- P-Net stage only (levels + concat + cross-level topk/nms)
    def pnet_stage(x):
        base = normalize_crops(x.astype(jnp.float32)).astype(jnp.bfloat16)
        bs, ss, vs = [], [], []
        for level in range(len(det.scales)):
            b, s, v, _ = det._pnet_level(det.params, base, level)
            bs.append(b); ss.append(s); vs.append(v)
        boxes = jnp.concatenate(bs, axis=1)
        scores = jnp.concatenate(ss, axis=1)
        valid = jnp.concatenate(vs, axis=1)
        probe = jnp.sum(scores * valid)
        return probe, x + (probe * 0).astype(jnp.uint8)

    t_pnet = chain_time(pnet_stage, images, iters)
    print(f'P-Net levels+NMS:    {1000 * t_pnet:8.2f} ms')

    # ---- resizes only (all levels)
    def resizes(x):
        base = normalize_crops(x.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for level in range(len(det.scales)):
            v, hm = det._resize_mats[level]
            t = jnp.einsum('iy,byxc->bixc', v, base)
            scaled = jnp.einsum('bixc,xj->bijc', t, hm)
            acc = acc + jnp.sum(scaled[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_rs = chain_time(resizes, images, iters)
    print(f'pyramid resizes:     {1000 * t_rs:8.2f} ms')

    # ---- resize + pnet convs (no selection/NMS)
    def convs(x):
        base = normalize_crops(x.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.float32(0)
        for level in range(len(det.scales)):
            v, hm = det._resize_mats[level]
            t = jnp.einsum('iy,byxc->bixc', v, base)
            scaled = jnp.einsum('bixc,xj->bijc', t, hm)
            probs, reg = det.pnet.apply({'params': det.params['pnet']},
                                        scaled)
            acc = acc + jnp.sum(probs) + jnp.sum(reg[..., 0])
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_convs = chain_time(convs, images, iters)
    print(f'resize+convs:        {1000 * t_convs:8.2f} ms '
          f'(selection = {1000 * (t_pnet - t_convs):.2f})')

    # ---- level-0 only: resize / conv breakdown
    v, hm = det._resize_mats[0]

    def level0_resize(x):
        base = normalize_crops(x.astype(jnp.float32)).astype(jnp.bfloat16)
        t = jnp.einsum('iy,byxc->bixc', v, base)
        scaled = jnp.einsum('bixc,xj->bijc', t, hm)
        acc = jnp.sum(scaled[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_l0r = chain_time(level0_resize, images, iters)
    print(f'level0 resize:       {1000 * t_l0r:8.2f} ms')

    sh = int(np.ceil(480 * det.scales[0]))
    sw = int(np.ceil(640 * det.scales[0]))
    scaled0 = jnp.asarray(
        rng.normal(size=(batch, sh, sw, 3)).astype(np.float32),
        jnp.bfloat16)

    def level0_convs(x):
        probs, reg = det.pnet.apply({'params': det.params['pnet']}, x)
        acc = jnp.sum(probs) + jnp.sum(reg[..., 0])
        return acc, x + (acc * 0).astype(x.dtype)

    t_l0c = chain_time(level0_convs, scaled0, iters)
    print(f'level0 convs:        {1000 * t_l0c:8.2f} ms  ({sh}x{sw})')

    # ---- R/O-Net stages by difference
    print(f'R+O stages (diff):   {1000 * (t_full - t_pnet):8.2f} ms')

    # ---- R/O decomposition: crop-gather vs net convs (decides whether a
    # flat-lane R/O kernel or a cheaper crop extraction is the next lever)
    from facenet_tpu.ops.image_ops import crop_and_resize

    boxes_r = jnp.asarray(
        np.concatenate([
            rng.uniform(0, 400, (batch, det.k_rnet, 2)),
            rng.uniform(40, 140, (batch, det.k_rnet, 2))], axis=-1)
        .astype(np.float32))
    boxes_r = boxes_r.at[..., 2:].add(boxes_r[..., :2])

    def crop24(x):
        crops = crop_and_resize(x.astype(jnp.float32), boxes_r, 24)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_c24 = chain_time(crop24, images, iters)
    print(f'crop24 gather (K={det.k_rnet}): {1000 * t_c24:8.2f} ms')

    def crop24_bf16(x):
        crops = crop_and_resize(x.astype(jnp.float32), boxes_r, 24,
                                compute_dtype=jnp.bfloat16)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_c24b = chain_time(crop24_bf16, images, iters)
    print(f'crop24 bf16:         {1000 * t_c24b:8.2f} ms '
          f'({t_c24 / t_c24b:.2f}x vs f32)')

    crops24 = jnp.asarray(rng.normal(size=(
        batch * det.k_rnet, 24, 24, 3)).astype(np.float32), jnp.bfloat16)

    def rnet_convs(x):
        probs, reg = det.rnet.apply({'params': det.params['rnet']}, x)
        acc = jnp.sum(probs) + jnp.sum(reg[..., 0])
        return acc, x + (acc * 0).astype(x.dtype)

    t_rn = chain_time(rnet_convs, crops24, iters)
    print(f'R-Net convs ({batch * det.k_rnet} crops): {1000 * t_rn:8.2f} ms')

    boxes_o = boxes_r[:, :det.k_onet]

    def crop48(x):
        crops = crop_and_resize(x.astype(jnp.float32), boxes_o, 48)
        acc = jnp.sum(crops[..., 0].astype(jnp.float32))
        return acc, x + (acc * 0).astype(jnp.uint8)

    t_c48 = chain_time(crop48, images, iters)
    print(f'crop48 gather (K={det.k_onet}): {1000 * t_c48:8.2f} ms')

    crops48 = jnp.asarray(rng.normal(size=(
        batch * det.k_onet, 48, 48, 3)).astype(np.float32), jnp.bfloat16)

    def onet_convs(x):
        probs, reg, lmk = det.onet.apply({'params': det.params['onet']}, x)
        acc = jnp.sum(probs) + jnp.sum(reg[..., 0]) + jnp.sum(lmk[..., 0])
        return acc, x + (acc * 0).astype(x.dtype)

    t_on = chain_time(onet_convs, crops48, iters)
    print(f'O-Net convs ({batch * det.k_onet} crops): {1000 * t_on:8.2f} ms')
    t_sel = (t_full - t_pnet) - (t_c24 + t_rn + t_c48 + t_on)
    print(f'R/O selection (diff):{1000 * t_sel:8.2f} ms')


if __name__ == '__main__':
    main()
