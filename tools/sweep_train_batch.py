"""Does a bigger batch lift training img/s/chip? (round-4 follow-up)

tools/profile_train.py localized the bs-256 step at 30-37 ms (~35% MFU),
dominated by train-mode BN's extra HBM passes. Those passes scale with
batch, but kernel launch / layout / head costs do not — so a larger
batch may amortize them. This sweeps the FULL production train step
(make_train_step: CE + center + L2 + Adam) over batch sizes with the
chained donated-state pattern (the only reliable timing through the
axon tunnel, CLAUDE.md).

Run on the real chip: python tools/sweep_train_batch.py [bs ...]
(default 256 384 512; each new shape compiles ~2-3 min).

MEASURED (v5e single chip, round 4): batch scaling is FLAT — the step
is per-image HBM-bound, exactly as the profile_train.py breakdown
predicts (train-BN batch-stat passes dominate and scale linearly with
batch; there is no fixed cost left to amortize):

    bs= 256     31.4 ms/step      8155 img/s  ( 122.6 us/img)
    bs= 384     51.4 ms/step      7475 img/s  ( 133.8 us/img)
    bs= 512     63.8 ms/step      8026 img/s  ( 124.6 us/img)

bs 256 stays the production/bench config. (bs 384's extra 9% is layout:
384 = 3x128 batch rows tile less evenly across the 8-core v5e than the
power-of-two sizes.)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

NROF_CLASSES = 8631
ITERS = 6
WARMUP = 2


def main():
    from bench import _init_backend_with_watchdog
    jax = _init_backend_with_watchdog()

    from facenet_tpu.config import Config
    from facenet_tpu.train.softmax import SoftmaxTrainer

    sizes = [int(a) for a in sys.argv[1:]] or [256, 384, 512]
    rng = np.random.RandomState(0)
    device = jax.devices()[0]

    for bs in sizes:
        cfg = Config({
            'batch_size': bs,
            'image': {'size': 160, 'normalization': 0,
                      'random_crop': False, 'random_flip': False},
            'train': {'adam_epsilon': 0.1,
                      'epoch': {'size': 10, 'max_nrof_epochs': 1},
                      'learning_rate': {'schedule': [[100, 0.05]]}},
            'loss': {'center_alfa': 0.95, 'center_factor': 0.5},
        })
        trainer = SoftmaxTrainer(cfg, nrof_classes=NROF_CLASSES)
        state = trainer.init_state(seed=0)
        images = jax.device_put(
            rng.randint(0, 256, (bs, 160, 160, 3), np.uint8), device)
        labels = jax.device_put(
            rng.randint(0, NROF_CLASSES, bs).astype(np.int32), device)

        step = trainer.step_fn
        t0 = time.perf_counter()
        metrics = None
        for _ in range(WARMUP):
            state, metrics = step(state, images, labels)
        float(np.asarray(metrics['loss']))
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, images, labels)
        float(np.asarray(metrics['loss']))
        dt = (time.perf_counter() - t0) / ITERS
        print(f'bs={bs:4d}  {dt*1e3:7.1f} ms/step  {bs/dt:8.0f} img/s  '
              f'({dt*1e6/bs:6.1f} us/img)  warm+compile={compile_s:.0f}s',
              flush=True)


if __name__ == '__main__':
    main()
