import numpy as np
import jax.numpy as jnp
import pytest

from facenet_tpu.config import Config
from facenet_tpu.faceclass import (FaceToFaceDistanceClassifier,
                                   FaceToFaceNormalizedEmbeddingsClassifier)


def test_normalized_classifier_distance():
    clf = FaceToFaceNormalizedEmbeddingsClassifier()
    x = np.eye(3, dtype=np.float32)
    d = np.asarray(clf.distance(x))
    # identical embeddings -> 0; orthogonal -> 2
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-6)
    np.testing.assert_allclose(d[0, 1], 2.0, atol=1e-6)


def test_normalized_classifier_logits_and_predict():
    clf = FaceToFaceNormalizedEmbeddingsClassifier(alpha=10, threshold=1)
    x = np.eye(2, dtype=np.float32)
    logits = np.asarray(clf(x))
    # diag distance 0 -> logits alpha*(1-0)=10; off-diag 2 -> -10
    np.testing.assert_allclose(np.diag(logits), 10.0, atol=1e-5)
    np.testing.assert_allclose(logits[0, 1], -10.0, atol=1e-5)

    pred = clf.predict(x)
    assert pred[0, 0] and not pred[0, 1]


def test_distance_classifier_norm_correction():
    clf = FaceToFaceDistanceClassifier(theta=1.0)
    # same direction, different norms: normalized part is 0, correction > 0
    x = np.array([[2.0, 0.0]], dtype=np.float32)
    y = np.array([[4.0, 0.0]], dtype=np.float32)
    d = float(np.asarray(clf.distance(x, y))[0, 0])
    want = (2 * (2 - 4) / (2 + 4)) ** 2      # theta * (2(|x|-|y|)/(|x|+|y|))^2
    assert d == pytest.approx(want, rel=1e-5)

    # theta = 0 removes the correction
    clf0 = FaceToFaceDistanceClassifier(theta=0.0)
    assert float(np.asarray(clf0.distance(x, y))[0, 0]) == pytest.approx(0, abs=1e-6)


def test_distance_classifier_self_distance_diag_zero():
    rng = np.random.RandomState(0)
    x = rng.randn(5, 8).astype(np.float32)
    clf = FaceToFaceDistanceClassifier()
    d = np.asarray(clf.distance(x))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)


def test_classifier_trainer_learns_separation():
    from facenet_tpu.train.classifier import ClassifierTrainer, ConfusionMatrix
    from facenet_tpu.dataset import equal_batches_input_pipeline
    from conftest import make_embeddings

    rng = np.random.RandomState(0)
    embs, labels = make_embeddings(rng, nrof_classes=4, images_per_class=12,
                                   dim=16, spread=0.1)
    per_class = [embs[labels == c] for c in range(4)]

    cfg = Config({
        'nrof_classes_per_batch': 4,
        'nrof_examples_per_class': 4,
        'train': {
            'epoch': {'max_nrof_epochs': 2, 'size': 30},
            'learning_rate_schedule': {'initial_value': 0.05,
                                       'decay_rate': 0.5},
        },
    })

    batch_iter = equal_batches_input_pipeline(per_class, cfg, seed=0)
    trainer = ClassifierTrainer(cfg, normalized=True)
    model = trainer.train(batch_iter, nrof_epochs=2, epoch_size=30,
                          p=4, k=4)

    conf = ConfusionMatrix(per_class, model)
    assert conf.accuracy > 0.8
    assert 0 <= conf.tp_rate <= 1 and 0 <= conf.tn_rate <= 1
    assert 'accuracy' in repr(conf)
