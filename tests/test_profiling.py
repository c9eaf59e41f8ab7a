"""Profiling/debug instrumentation (SURVEY.md §5 tracing plan)."""

import numpy as np
import pytest

from facenet_tpu.config import Config
from facenet_tpu.utils import profiling


def test_step_timer_counts_and_throughput():
    t = profiling.StepTimer(items_per_step=32)
    for _ in range(5):
        with t:
            sum(range(1000))
    assert t.count == 5
    assert t.ema_s > 0
    assert t.items_per_sec > 0
    assert 'items/s' in repr(t)


def test_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    with profiling.trace(tmp_path / 'tb'):
        jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    files = list((tmp_path / 'tb').rglob('*'))
    assert files, 'trace produced no files'


def test_apply_debug_config_nans():
    import jax
    old = jax.config.jax_debug_nans
    try:
        profiling.apply_debug_config(Config({'nans': True}))
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update('jax_debug_nans', old)


def test_annotate_context():
    import jax
    import jax.numpy as jnp
    with profiling.annotate('my-region'):
        jnp.ones(4).block_until_ready()


@pytest.mark.slow
def test_trainer_reports_throughput():
    from facenet_tpu.train.softmax import SoftmaxTrainer

    cfg = Config({
        'image': {'size': 160, 'normalization': 0},
        'model': {'config': {'block35': {'repeat': 1},
                             'block17': {'repeat': 1},
                             'block8_1': {'repeat': 1},
                             'output': {'size': 32}}},
        'mesh': {'data': 1, 'model': 1},
        'train': {'epoch': {'size': 2},
                  'learning_rate': {'schedule': [[1, 0.05]]}},
        'loss': {}, 'batch_size': 4, 'seed': 0,
    })
    trainer = SoftmaxTrainer(cfg, nrof_classes=4, model_cfg=cfg.model)
    state = trainer.init_state(seed=0)
    rng = np.random.RandomState(0)
    batches = [(rng.randint(0, 256, (4, 160, 160, 3), np.uint8),
                rng.randint(0, 4, 4).astype(np.int32)) for _ in range(2)]
    state, metrics = trainer.train_epoch(state, iter(batches), epoch=0,
                                         log_every=0)
    assert metrics['img_per_s'] > 0
    assert metrics['steps'] == 2
