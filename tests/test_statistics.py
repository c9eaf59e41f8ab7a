import numpy as np
import pytest

from facenet_tpu import statistics
from facenet_tpu.config import Config

from oracle import oracle_confusion
from conftest import make_embeddings


def test_pairwise_similarities_metric0(clustered_embeddings):
    embs, labels = clustered_embeddings
    sims = statistics.pairwise_similarities(embs[:10], metric=0)
    assert sims.shape == (45,)
    assert np.all(sims >= 0) and np.all(sims <= 4)

    cross = statistics.pairwise_similarities(embs[:5], embs[5:12], metric=0)
    assert cross.shape == (5, 7)


def test_pairwise_similarities_metric1(clustered_embeddings):
    embs, _ = clustered_embeddings
    sims = statistics.pairwise_similarities(embs[:10], metric=1)
    assert np.all(sims >= 0) and np.all(sims <= np.pi)


def test_pairwise_rejects_unnormalized():
    x = np.full((4, 8), 3.0, dtype=np.float32)
    with pytest.raises(ValueError):
        statistics.pairwise_similarities(x)


def _midpoint_thresholds(embs, metric, count=25):
    """Thresholds placed strictly between observed distances, so that f32
    rounding of the distance computation cannot flip any comparison."""
    from oracle import oracle_pairwise
    d = np.sort(np.unique(oracle_pairwise(embs, metric=metric)))
    mids = (d[:-1] + d[1:]) / 2
    # drop midpoints too close to either neighbor to be rounding-safe
    gap = np.minimum(np.diff(d)[: len(mids)], 1)
    mids = mids[gap > 1e-4]
    idx = np.linspace(0, len(mids) - 1, count).astype(int)
    return np.unique(mids[idx])


@pytest.mark.parametrize('metric', [0, 1])
def test_confusion_counts_match_oracle_exact(clustered_embeddings, metric):
    embs, labels = clustered_embeddings
    thresholds = _midpoint_thresholds(embs, metric)

    got = statistics.confusion_counts(embs, labels, thresholds, metric=metric)
    want = oracle_confusion(embs, labels, thresholds, metric=metric)

    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


@pytest.mark.parametrize('metric', [0, 1])
def test_confusion_counts_match_oracle_linspace(clustered_embeddings, metric):
    # linspace thresholds may land within 1 ulp of a pair distance; allow a
    # few single-pair flips (weight of one pair here is <= 1/(6*28) ~ 6e-3)
    embs, labels = clustered_embeddings
    upper = 4 if metric == 0 else np.pi
    thresholds = np.linspace(0, upper, 25)

    got = statistics.confusion_counts(embs, labels, thresholds, metric=metric)
    want = oracle_confusion(embs, labels, thresholds, metric=metric)

    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-2)


def test_confusion_counts_uneven_classes(rng):
    # classes with a single image contribute no positive pairs (reference
    # skips sims.size < 1 blocks) but still count in the class totals
    embs, labels = make_embeddings(rng, nrof_classes=5, images_per_class=4)
    # drop images to make class sizes [1, 2, 3, 4, 4]
    keep = np.concatenate([[0], [4, 5], [8, 9, 10], np.arange(12, 20)])
    embs, labels = embs[keep], labels[keep]

    thresholds = _midpoint_thresholds(embs, metric=0, count=17)
    got = statistics.confusion_counts(embs, labels, thresholds, metric=0)
    want = oracle_confusion(embs, labels, thresholds, metric=0)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_confidence_matrix_properties(clustered_embeddings):
    embs, labels = clustered_embeddings
    calc = statistics.SimilarityCalculator(embs, labels, metric=0)
    m = statistics.ConfidenceMatrix(calc, np.linspace(0, 4, 50))

    acc = m.accuracy
    assert acc.shape == (50,)
    assert np.all(acc >= 0) and np.all(acc <= 1 + 1e-6)
    # clustered data must be separable well above chance
    assert acc.max() > 0.9
    # monotone behavior at extremes: t=0 -> nothing accepted; t=4 -> all
    assert m.tp[0] == 0 and m.fp[0] == 0
    np.testing.assert_allclose(m.tp[-1] + m.fn[-1], 1.0, atol=1e-5)


def test_face_to_face_validation(clustered_embeddings):
    embs, labels = clustered_embeddings
    cfg = Config({'metric': 0, 'nrof_folds': 3, 'far_target': 0.1})
    validation = statistics.FaceToFaceValidation(embs, labels, cfg)

    d = validation.dict
    assert 'MaximumAccuracy' in d
    max_acc = d['MaximumAccuracy']
    for key in ('accuracy', 'precision', 'tp_rates', 'tn_rates', 'threshold',
                'auc', 'eer'):
        assert key in max_acc
    assert max_acc['accuracy'] > 0.8
    assert 0 < max_acc['auc'] <= 1

    text = repr(validation)
    assert 'MaximumAccuracy' in text and 'Area under curve' in text


def test_validation_report_files(tmp_path, clustered_embeddings):
    embs, labels = clustered_embeddings
    cfg = Config({'metric': 1, 'nrof_folds': 2, 'far_target': 0.1})
    validation = statistics.FaceToFaceValidation(embs, labels, cfg)

    report = tmp_path / 'report.txt'
    validation.write_report(report)
    assert 'FaceToFaceValidation' in report.read_text()

    h5 = tmp_path / 'report.h5'
    validation.write_h5file(h5)
    from facenet_tpu import h5utils
    assert h5utils.read(h5, 'MaximumAccuracy/accuracy').size == 1


def test_similarity_calculator_evaluate_agrees_with_device_path(
        clustered_embeddings):
    """The per-class-pair probe `evaluate(i, k)` carries the same equal-
    class-pair weighting the device histogram path uses: reconstructing
    the confusion rates from the probe must reproduce ConfidenceMatrix."""
    embs, labels = clustered_embeddings
    calc = statistics.SimilarityCalculator(embs, labels, metric=0)
    c = calc.nrof_classes

    # the weights sum to 1 over positive blocks and 1 over negative blocks
    total = 0.0
    for i in range(c):
        for k in range(i, c):
            dists, weight = calc.evaluate(i, k)
            total += dists.size / weight
    np.testing.assert_allclose(total, 2.0, rtol=1e-12)

    thresholds = np.linspace(0.0, 4.0, 9)
    m = statistics.ConfidenceMatrix(calc, thresholds)

    tp = np.zeros_like(thresholds)
    tn = np.zeros_like(thresholds)
    for i in range(c):
        for k in range(i, c):
            dists, weight = calc.evaluate(i, k)
            flat = np.asarray(dists).ravel()
            below = (flat[None, :] < thresholds[:, None]).sum(axis=1)
            if i == k:
                tp += below / weight
            else:
                tn += (flat.size - below) / weight

    np.testing.assert_allclose(tp, m.tp, atol=1e-5)
    np.testing.assert_allclose(tn, m.tn, atol=1e-5)
