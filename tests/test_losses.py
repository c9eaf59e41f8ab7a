import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facenet_tpu.ops import losses
from facenet_tpu.ops.lr_schedules import (
    LearningRateScheduler, exponential_decay_schedule, piecewise_schedule,
    schedule_from_config)
from facenet_tpu.config import Config


def test_softmax_ce_matches_manual():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 5).astype(np.float32)
    labels = rng.randint(0, 5, 8)

    got = float(losses.softmax_cross_entropy_with_logits(
        jnp.asarray(logits), jnp.asarray(labels)))

    # manual log-softmax NLL
    m = logits - logits.max(axis=1, keepdims=True)
    logp = m - np.log(np.exp(m).sum(axis=1, keepdims=True))
    want = -logp[np.arange(8), labels].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_center_loss_semantics():
    rng = np.random.RandomState(0)
    feats = rng.randn(6, 4).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2])
    centers = rng.randn(3, 4).astype(np.float32)
    alfa = 0.95

    loss, new_centers = losses.center_loss(
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(centers), alfa)

    # loss = mean squared distance to OLD centers (reference facenet.py:216)
    want_loss = np.mean((feats - centers[labels]) ** 2)
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)

    # update = scatter_sub of (1-alfa)(centers[l]-f), accumulated per class
    want = centers.copy()
    for f, l in zip(feats, labels):
        want[l] -= (1 - alfa) * (centers[l] - f)
    np.testing.assert_allclose(np.asarray(new_centers), want, rtol=1e-4,
                               atol=1e-6)


def test_center_loss_pulls_features_towards_centers():
    feats = jnp.asarray(np.ones((4, 3), np.float32))
    labels = jnp.asarray([0, 0, 1, 1])
    centers = jnp.zeros((2, 3))
    _, new_centers = losses.center_loss(feats, labels, centers, alfa=0.5)
    assert np.all(np.asarray(new_centers)[:2] > 0)


def test_binary_cross_entropy_pair_loss_matches_tf_formula():
    rng = np.random.RandomState(1)
    P, K = 3, 2
    B = P * K
    logits = rng.randn(B, B).astype(np.float32)

    got = float(losses.binary_cross_entropy_pair_loss(
        jnp.asarray(logits), P, K))

    iu, ku = np.triu_indices(B, k=1)
    labels = (iu // K == ku // K).astype(np.float64)
    x = logits[iu, ku].astype(np.float64)
    q = len(labels) / labels.sum() - 1
    # tf.nn.weighted_cross_entropy_with_logits stable formula
    lw = 1 + (q - 1) * labels
    want = np.mean((1 - labels) * x +
                   lw * (np.log1p(np.exp(-np.abs(x))) + np.maximum(-x, 0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triplet_semihard_basic():
    # two tight clusters far apart: loss should be ~0 (margin satisfied)
    a = np.tile([1, 0, 0, 0], (4, 1)).astype(np.float32)
    b = np.tile([0, 1, 0, 0], (4, 1)).astype(np.float32)
    embs = jnp.asarray(np.concatenate([a, b]))
    labels = jnp.asarray([0] * 4 + [1] * 4)
    loss = float(losses.triplet_semihard_loss(embs, labels, margin=0.2))
    assert loss == pytest.approx(0.0, abs=1e-6)

    # collapsed clusters: negatives at distance 0 -> loss = margin
    embs_bad = jnp.asarray(np.tile([1, 0, 0, 0], (8, 1)).astype(np.float32))
    loss_bad = float(losses.triplet_semihard_loss(embs_bad, labels, 0.2))
    assert loss_bad == pytest.approx(0.2, abs=1e-6)


def test_triplet_semihard_prefers_semihard_negative():
    # anchor/pos distance 0.5; negatives at 0.3 (hard) and 0.8 (semi-hard)
    # semi-hard mining must pick 0.8 (> d_ap), giving loss max(0.5+m-0.8, 0)
    d = {}
    embs = np.array([
        [0.0, 0.0],    # anchor (class 0)
        [np.sqrt(0.5), 0.0],  # positive at squared dist 0.5
        [0.0, np.sqrt(0.3)],  # negative at squared dist 0.3 (hard)
        [0.0, np.sqrt(0.8)],  # negative at squared dist 0.8 (semi-hard)
    ], dtype=np.float32)
    labels = jnp.asarray([0, 0, 1, 2])
    loss = float(losses.triplet_semihard_loss(jnp.asarray(embs), labels,
                                              margin=0.4))
    # pairs: (0,1) and (1,0). For anchor 0: d_ap=0.5, semi-hard neg = 0.8
    # -> max(0.5+0.4-0.8,0)=0.1. For anchor 1: d_ap=0.5,
    # negs at d(1,2)=0.5+0.3=0.8, d(1,3)=0.5+0.8=1.3 -> semi-hard min>0.5 is 0.8
    # -> 0.1. mean = 0.1
    assert loss == pytest.approx(0.1, abs=1e-5)


def test_lr_scheduler_piecewise_epochs():
    cfg = Config({'schedule': [[100, 0.05], [200, 0.005], [300, 0.0005]]})
    sched = LearningRateScheduler(cfg)
    assert sched(0) == 0.05
    assert sched(99) == 0.05
    assert sched(100) == 0.005
    assert sched(250) == 0.0005
    assert sched(500) == 0.0005


def test_lr_scheduler_constant_value():
    sched = LearningRateScheduler(Config({'value': 0.1, 'schedule': [[1, 9]]}))
    assert sched(0) == 0.1 and sched(1000) == 0.1


def test_piecewise_step_schedule_matches_epoch_table():
    table = [[100, 0.05], [200, 0.005], [300, 0.0005]]
    spe = 10
    fn = piecewise_schedule(table, spe)
    ref = LearningRateScheduler(Config({'schedule': table}))
    for epoch in [0, 50, 99, 100, 150, 299, 400]:
        step = epoch * spe
        assert float(fn(jnp.asarray(step))) == pytest.approx(ref(epoch))


def test_exponential_decay():
    fn = exponential_decay_schedule(0.01, 0.1, 100)
    assert float(fn(jnp.asarray(0))) == pytest.approx(0.01)
    assert float(fn(jnp.asarray(99))) == pytest.approx(0.01)
    assert float(fn(jnp.asarray(100))) == pytest.approx(0.001)
    assert float(fn(jnp.asarray(250))) == pytest.approx(1e-4)


def test_schedule_from_config():
    cfg = Config({'learning_rate': {'value': None,
                                    'schedule': [[2, 0.1], [4, 0.01]]}})
    fn = schedule_from_config(cfg, steps_per_epoch=5)
    assert float(fn(jnp.asarray(0))) == pytest.approx(0.1)
    assert float(fn(jnp.asarray(10))) == pytest.approx(0.01)
