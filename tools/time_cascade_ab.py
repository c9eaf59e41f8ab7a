"""Chained device-resident A/B of the cascade P-Net backends (flax vs flat).

Times MTCNN._detect per CLAUDE.md's chained pattern (block_until_ready is
unreliable through the axon tunnel): each call's input depends on the
previous output, one scalar fetched at the end. Decides whether the
flat-lane Pallas P-Net (pallas_pnet.py v3) stays the TPU default.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from facenet_tpu.detectors.mtcnn.cascade import MTCNN
from facenet_tpu.detectors.pretrained import load_bundled

def chain_time(fn, feed, iters=20, warmup=3):
    jfn = jax.jit(fn)
    cur = feed; probe = None
    for _ in range(warmup):
        probe, cur = jfn(cur)
    float(np.asarray(probe))
    t0 = time.perf_counter()
    for _ in range(iters):
        probe, cur = jfn(cur)
    float(np.asarray(probe))
    return (time.perf_counter() - t0) / iters

params = load_bundled('mtcnn')
rng = np.random.RandomState(0)

import sys
batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
images = jax.device_put(rng.randint(0, 256, (batch, 480, 640, 3), np.uint8))
# argv[2]: comma-separated impls, e.g. flax,pyramid,pyramid-dots,pyramid-skip
# ('pyramid-skip' is the assembly-cost probe — WRONG numerics, timing only)
impls = sys.argv[2].split(',') if len(sys.argv) > 2 else ('flax', 'pyramid')
for impl in impls:
    det = MTCNN(image_shape=(480, 640), params=params, pnet_impl=impl,
                allow_timing_probes=True)
    def full(x, det=det):
        out = det._detect(det.params, x)
        probe = out['scores'].sum()
        return probe, x + (probe * 0).astype(jnp.uint8)
    t = chain_time(full, images)
    print(f'{impl}: {t*1e3:8.2f} ms/batch{batch} ({batch/t:,.0f} img/s)', flush=True)
