"""Benchmark: single-chip TRAINING-step throughput of the flagship model.

Prints ONE JSON line:
  {"metric": "train_img_per_sec_single_chip", "value": N, "unit": "img/s",
   "vs_baseline": N, "no_overlap_img_per_s": N, "step_ms": N}

Setup mirrors the reference's headline training run (BASELINE.md row
20200820-121641): full Inception-ResNet-v1, 8,631-class softmax head,
center loss, Adam(eps=0.1) — but at batch 256 bf16 on one v5e chip, with
the epoch loop's double-buffered host->device transfer (train/softmax.py
`_placed_batches`) overlapping batch n+1's copy with step n's compute.

Baseline: the reference never logs a training-step time. Derived proxy,
documented here: its frozen-graph INFERENCE ran 297 img/s on the same
2020-era GPU (BASELINE.md); training adds backward (~2x forward FLOPs) and
the optimizer, so ~100 img/s is a generous estimate of its training
throughput. vs_baseline uses that 100 img/s proxy.

Run on the real chip: `python bench_train.py` (first compile ~3 min).
NOTE (axon tunnel): the host->device batch copy rides a ~30 MB/s network
tunnel here, so the absolute img/s UNDERSTATES real-host performance; the
overlap vs no-overlap delta is the mechanism being measured.
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


def main():
    from bench import _init_backend_with_watchdog
    jax = _init_backend_with_watchdog(metric='train_img_per_sec_single_chip')
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

    # warmup: compile + settle
    trainer.steps_per_epoch = WARMUP_STEPS
    state, _, _ = run_epoch_like(trainer, state, WARMUP_STEPS, prefetch=2)

    trainer.steps_per_epoch = STEPS
    state, dt_serial, _ = run_epoch_like(trainer, state, STEPS, prefetch=1)
    state, dt_overlap, _ = run_epoch_like(trainer, state, STEPS, prefetch=2)

    serial = BATCH * STEPS / dt_serial
    overlap = BATCH * STEPS / dt_overlap

    print(json.dumps({
        'metric': 'train_img_per_sec_single_chip',
        'value': round(overlap, 1),
        'unit': 'img/s',
        'vs_baseline': round(overlap / BASELINE_TRAIN_IMG_PER_S, 2),
        'no_overlap_img_per_s': round(serial, 1),
        'step_ms': round(1000 * dt_overlap / STEPS, 1),
    }))


if __name__ == '__main__':
    main()
