"""Benchmark: single-chip embedding throughput of the flagship model.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference's published embedding throughput — 297 img/s on a
2020-era GPU with the frozen TF graph at batch 100 (BASELINE.md,
reference models/20200505-200824/logs/report.txt "time per image"). The
north-star target is >= 2,500 img/s/chip (20k/s on a v5e-8, BASELINE.json).

Measurement design (round-2 tuning, all measured on v5e through the axon
tunnel):
  * the fused serving path (models/irv1_fast.py: BN folded into conv
    biases, parallel branch-head 1x1 convs fused into wide convs) —
    +5% over model.apply at equal batch;
  * one dispatch runs a lax.scan over K chunks of B images, because each
    dispatch costs ~1.6 ms of fixed overhead (measured with a trivial
    chained op) and B=128 chunks run fastest per image (B=512: 27 us/img,
    B=128: 21.5 us/img, B=64: collapses to 33 us/img) — K=32 x B=128 was
    the best of a (K, B) sweep;
  * calls are chained through their outputs so the wall clock measures
    true serialized execution (async dispatch + the tunnel make
    block_until_ready alone unreliable — CLAUDE.md).

Round 3: the headline value is the INT8 serving path (models/quantize.py
per-channel PTQ, measured 1.24x the bf16 path end-to-end on v5e). It is
quality-free at the committed evidence geometry: the full 10-fold
validation report of the trained hard-mode model is IDENTICAL digit-for-
digit between bf16 and int8 embeddings (26,500 images, 530 classes —
tools/validate_int8.py), and embedding cosine agreement is >=0.9997.
The bf16 number is reported alongside for continuity with earlier rounds.
"""

import json
import time

import numpy as np

BASELINE_IMG_PER_S = 297.0
CHUNK = 128     # images per scan step (per-image fastest; see sweep above)
K = 32          # scan steps per dispatch (amortizes the ~1.6 ms dispatch)
WARMUP = 3
ITERS = 8


def _init_backend_with_watchdog(timeout_s=900,
                                metric='embeddings_per_sec_single_chip'):
    """jax backend init hangs FOREVER when the TPU tunnel is down (an
    observed multi-hour failure mode); emit a diagnostic JSON line and
    exit instead of stalling the driver. Normal init is ~75 s; the
    watchdog only covers init, not compiles."""
    import os
    import threading

    def expire():
        print(json.dumps({
            'metric': metric, 'value': 0.0,
            'unit': 'img/s', 'vs_baseline': 0.0,
            'error': f'TPU backend init exceeded {timeout_s}s '
                     '(tunnel outage?)'}), flush=True)
        os._exit(2)

    timer = threading.Timer(timeout_s, expire)
    timer.daemon = True
    timer.start()
    import jax
    jax.devices()
    timer.cancel()
    return jax


def main():
    jax = _init_backend_with_watchdog()
    import jax.numpy as jnp

    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models.irv1_fast import build_fast_params, fast_forward
    from facenet_tpu.models.quantize import quantize_fast_params

    model = create_model()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (K, CHUNK, 160, 160, 3), dtype=np.uint8)

    variables = model.init(jax.random.PRNGKey(0), images[0, :1], train=False)
    params, cfg = build_fast_params(variables)

    def forward_chained(params, images, prev):
        def body(carry, chunk):
            emb = fast_forward(params, cfg, chunk)
            return carry + emb[0, 0] * 0, emb[:, 0]
        acc, probe = jax.lax.scan(body, jnp.float32(0), images)
        return probe, images + (acc * 0).astype(jnp.uint8)

    fwd = jax.jit(forward_chained)
    device = jax.devices()[0]

    def measure(p):
        p = jax.device_put(p, device)
        cur = jax.device_put(images, device)
        out = None
        for _ in range(WARMUP):
            out, cur = fwd(p, cur, out if out is not None else
                           jnp.zeros((K, 512), jnp.float32))
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out, cur = fwd(p, cur, out)
        np.asarray(out[0, 0])     # forces completion of the whole chain
        return K * CHUNK * ITERS / (time.perf_counter() - t0)

    bf16_img_per_s = measure(params)
    qparams = quantize_fast_params(params, cfg, images[0, :32])
    int8_img_per_s = measure(qparams)

    img_per_s = max(int8_img_per_s, bf16_img_per_s)
    print(json.dumps({
        'metric': 'embeddings_per_sec_single_chip',
        'value': round(img_per_s, 1),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
        'serving': 'int8' if int8_img_per_s >= bf16_img_per_s else 'bf16',
        'int8_img_per_s': round(int8_img_per_s, 1),
        'bf16_img_per_s': round(bf16_img_per_s, 1),
    }))


if __name__ == '__main__':
    main()
