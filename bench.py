"""Benchmark: single-chip embedding throughput of the flagship model.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference's published embedding throughput — 297 img/s on a
2020-era GPU with the frozen TF graph at batch 100 (BASELINE.md,
reference models/20200505-200824/logs/report.txt "time per image"). The
north-star target is >= 2,500 img/s/chip (20k/s on a v5e-8, BASELINE.json).
"""

import json
import time

import numpy as np

BASELINE_IMG_PER_S = 297.0
BATCH = 512
WARMUP = 3
ITERS = 20


def main():
    import jax

    from facenet_tpu.models.inception_resnet_v1 import create_model

    model = create_model()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (BATCH, 160, 160, 3), dtype=np.uint8)

    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)

    # The forward is chained through its own output (each call's input depends
    # on the previous call's embeddings) so the timing loop measures true
    # serialized execution — block_until_ready alone under-reports when the
    # runtime pipelines independent dispatches.
    @jax.jit
    def forward_chained(variables, images, prev):
        out = model.apply(variables, images, train=False)
        bump = (out[0, 0] * 0).astype(jnp.uint8)
        return out, images + bump

    import jax.numpy as jnp

    device = jax.devices()[0]
    variables = jax.device_put(variables, device)
    cur = jax.device_put(images, device)

    out = jnp.zeros((BATCH, 512), jnp.float32)
    for _ in range(WARMUP):
        out, cur = forward_chained(variables, cur, out)
    np.asarray(out[0, 0])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out, cur = forward_chained(variables, cur, out)
    np.asarray(out[0, 0])     # forces completion of the whole chain
    dt = time.perf_counter() - t0

    img_per_s = BATCH * ITERS / dt

    print(json.dumps({
        'metric': 'embeddings_per_sec_single_chip',
        'value': round(img_per_s, 1),
        'unit': 'img/s',
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
