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
"""

import json
import time

import numpy as np

BASELINE_IMG_PER_S = 297.0
CHUNK = 128     # images per scan step (per-image fastest; see sweep above)
K = 32          # scan steps per dispatch (amortizes the ~1.6 ms dispatch)
WARMUP = 3
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models.irv1_fast import build_fast_params, fast_forward

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
    params = jax.device_put(params, device)
    cur = jax.device_put(images, device)

    out = None
    for _ in range(WARMUP):
        out, cur = fwd(params, cur, out if out is not None else
                       jnp.zeros((K, 512), jnp.float32))
    np.asarray(out[0, 0])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, cur = fwd(params, cur, out)
    np.asarray(out[0, 0])     # forces completion of the whole chain
    dt = time.perf_counter() - t0

    img_per_s = K * CHUNK * ITERS / dt

    print(json.dumps({
        'metric': 'embeddings_per_sec_single_chip',
        'value': round(img_per_s, 1),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
