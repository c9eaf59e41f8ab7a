"""Benchmark: single-chip TRAINING-step throughput of the flagship model.

Prints ONE JSON line:
  {"metric": "train_img_per_sec_single_chip", "value": N, "unit": "img/s",
   "vs_baseline": N, "pipeline_img_per_s": N, "step_ms": N}

Setup mirrors the reference's headline training run (BASELINE.md row
20200820-121641): full Inception-ResNet-v1, 8,631-class softmax head,
center loss, Adam(eps=0.1), batch 256 bf16 on one v5e chip.

The headline value is DEVICE step throughput, measured with the chained
pattern (batches resident on device; successive steps serialize through
the donated TrainState — the only reliable timing through the axon
tunnel, CLAUDE.md). Round-4 profiling (tools/profile_train.py) showed the
earlier 432 ms/step "compute" figure was tunnel-polluted: the true device
step is ~30 ms (fwd_eval 11.3 ms + train-BN ~17.6 ms; backward and Adam
hide under the BN/HBM passes), i.e. ~8,400 img/s/chip at ~70 TFLOP/s
effective. `pipeline_img_per_s` additionally reports the epoch-loop
number WITH per-step host->device transfer through the ~30 MB/s dev
tunnel (wire-bound here, PCIe-negligible on a real host).

Baseline: the reference never logs a training-step time. Derived proxy,
documented here: its frozen-graph INFERENCE ran 297 img/s on the same
2020-era GPU (BASELINE.md); training adds backward (~2x forward FLOPs) and
the optimizer, so ~100 img/s is a generous estimate of its training
throughput. vs_baseline uses that 100 img/s proxy.

Run on the real chip: `python bench_train.py` (first compile ~3 min).
"""

import json
import time

import numpy as np

BASELINE_TRAIN_IMG_PER_S = 100.0    # derived proxy, see module docstring
BATCH = 256
NROF_CLASSES = 8631
STEPS = 10
WARMUP_STEPS = 3


def run_epoch_like(trainer, state, n_steps, prefetch):
    rng = np.random.RandomState(0)
    batches = [(rng.randint(0, 256, (BATCH, 160, 160, 3), dtype=np.uint8),
                rng.randint(0, NROF_CLASSES, BATCH).astype(np.int32))
               for _ in range(n_steps)]
    trainer.cfg.train.prefetch = prefetch
    t0 = time.perf_counter()
    state, metrics = trainer.train_epoch(state, iter(batches), epoch=0,
                                         log_every=0)
    dt = time.perf_counter() - t0
    return state, dt, metrics


def measure_device_steps(jax, trainer, state, iters=8, warmup=2):
    """Chained on-device step time: one resident batch, steps serialized
    through the donated state; fetch one scalar at the end."""
    rng = np.random.RandomState(0)
    device = jax.devices()[0]
    images = jax.device_put(
        rng.randint(0, 256, (BATCH, 160, 160, 3), np.uint8), device)
    labels = jax.device_put(
        rng.randint(0, NROF_CLASSES, BATCH).astype(np.int32), device)

    step = trainer.step_fn
    metrics = None
    for _ in range(warmup):
        state, metrics = step(state, images, labels)
    float(np.asarray(metrics['loss']))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, images, labels)
    float(np.asarray(metrics['loss']))
    dt = (time.perf_counter() - t0) / iters
    return state, dt


def main():
    from bench import _init_backend_with_watchdog
    jax = _init_backend_with_watchdog()
    from facenet_tpu.config import Config
    from facenet_tpu.train.softmax import SoftmaxTrainer

    cfg = Config({
        'batch_size': BATCH,
        'image': {'size': 160, 'normalization': 0,
                  'random_crop': False, 'random_flip': False},
        'train': {'adam_epsilon': 0.1,
                  'epoch': {'size': STEPS, 'max_nrof_epochs': 1},
                  'learning_rate': {'schedule': [[100, 0.05]]}},
        'loss': {'center_alfa': 0.95, 'center_factor': 0.5},
    })
    trainer = SoftmaxTrainer(cfg, nrof_classes=NROF_CLASSES)
    state = trainer.init_state(seed=0)

    # device compute (headline)
    state, step_s = measure_device_steps(jax, trainer, state)
    compute = BATCH / step_s

    # epoch loop with per-step host->device transfer (tunnel-bound here)
    trainer.steps_per_epoch = STEPS
    state, dt_overlap, _ = run_epoch_like(trainer, state, STEPS, prefetch=2)
    pipeline = BATCH * STEPS / dt_overlap

    print(json.dumps({
        'metric': 'train_img_per_sec_single_chip',
        'value': round(compute, 1),
        'unit': 'img/s',
        'vs_baseline': round(compute / BASELINE_TRAIN_IMG_PER_S, 2),
        'step_ms': round(1000 * step_s, 2),
        'pipeline_img_per_s': round(pipeline, 1),
    }))


if __name__ == '__main__':
    main()
