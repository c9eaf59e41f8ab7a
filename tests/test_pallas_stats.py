"""Pallas pair-statistics kernel: parity with the XLA path and the numpy
oracle (interpret mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

from conftest import make_embeddings
from facenet_tpu import statistics
from facenet_tpu.ops.pallas_stats import pair_below_counts


@pytest.fixture(scope='module')
def clustered():
    rng = np.random.RandomState(0)
    return make_embeddings(rng, nrof_classes=7, images_per_class=23, dim=48)


@pytest.mark.parametrize('metric', [0, 1])
def test_matches_xla_path(clustered, metric):
    embs, labels = clustered
    hi = 4.0 if metric == 0 else np.pi
    thr = np.linspace(0, hi, 100)[1:99].astype(np.float32)

    bp, bn, tpt, tnt = pair_below_counts(embs, labels, thr, metric=metric,
                                         interpret=True)
    tp, fn, fp, tn = statistics.confusion_counts(embs, labels, thr,
                                                 metric=metric)
    nc = len(np.unique(labels))
    npairs = nc * (nc - 1) / 2
    np.testing.assert_allclose(bp / nc, tp, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(bn / npairs, fp, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose((tpt - bp) / nc, fn, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose((tnt - bn) / npairs, tn, rtol=2e-4, atol=1e-5)


def test_matches_numpy_oracle(clustered):
    """Direct check against a brute-force per-pair computation."""
    embs, labels = clustered
    thr = np.array([0.5, 1.0, 2.0], np.float32)

    bp, bn, tpt, tnt = pair_below_counts(embs, labels, thr, metric=0,
                                         interpret=True)

    d = ((embs[:, None] - embs[None, :]) ** 2).sum(-1)
    iu = np.triu_indices(len(embs), 1)
    same = labels[:, None] == labels[None, :]
    counts = np.bincount(labels).astype(np.float64)
    inv_pos = 1.0 / (counts * (counts - 1) / 2)
    inv_n = 1.0 / counts

    w = np.where(same, inv_pos[labels][:, None],
                 inv_n[labels][:, None] * inv_n[labels][None, :])
    for k, t in enumerate(thr):
        below = d[iu] < t
        exp_p = w[iu][below & same[iu]].sum()
        exp_n = w[iu][below & ~same[iu]].sum()
        np.testing.assert_allclose(bp[k], exp_p, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(bn[k], exp_n, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(tpt, w[iu][same[iu]].sum(), rtol=1e-4)
    np.testing.assert_allclose(tnt, w[iu][~same[iu]].sum(), rtol=1e-4)


def test_env_flag_dispatch(clustered, monkeypatch):
    embs, labels = clustered
    thr = np.linspace(0.01, 3.9, 50).astype(np.float32)

    base = statistics.confusion_counts(embs, labels, thr, metric=0)
    monkeypatch.setenv('FACENET_TPU_PALLAS', '1')
    forced = statistics.confusion_counts(embs, labels, thr, metric=0)
    for a, b in zip(base, forced):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_too_many_thresholds_raises(clustered):
    embs, labels = clustered
    with pytest.raises(ValueError, match='at most'):
        pair_below_counts(embs, labels, np.linspace(0, 4, 200), interpret=True)


def test_unpadded_edge_sizes():
    # N not a multiple of the 128 tile; D not a multiple of 128
    rng = np.random.RandomState(1)
    embs, labels = make_embeddings(rng, nrof_classes=3, images_per_class=5,
                                   dim=17)
    thr = np.array([1.0], np.float32)
    bp, bn, tpt, tnt = pair_below_counts(embs, labels, thr, interpret=True)
    assert tpt == pytest.approx(3.0, rel=1e-5)     # 3 classes, weight 1 each
    assert tnt == pytest.approx(3.0, rel=1e-5)     # 3 class pairs
