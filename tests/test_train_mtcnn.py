"""MTCNN cascade training: multi-task loss, OHEM, sample generation, and a
learn-something end-to-end check (paper recipe, arXiv:1604.02878)."""

import numpy as np
import pytest

import jax.numpy as jnp

from facenet_tpu.train import mtcnn as tm


def _loss(cls, box, lmk, labels, box_t, lmk_t, st, **kw):
    w = tm.TASK_WEIGHTS['onet']
    total, metrics = tm.multitask_loss(
        jnp.asarray(cls), jnp.asarray(box),
        None if lmk is None else jnp.asarray(lmk),
        jnp.asarray(labels), jnp.asarray(box_t), jnp.asarray(lmk_t),
        jnp.asarray(st), w, **kw)
    return float(total), {k: float(v) for k, v in metrics.items()}


def test_masks_select_losses():
    b = 4
    cls = np.zeros((b, 2), np.float32)
    box = np.ones((b, 4), np.float32)
    lmk = np.ones((b, 10), np.float32)
    labels = np.array([0, 1, 0, 0])
    box_t = np.zeros((b, 4), np.float32)
    lmk_t = np.zeros((b, 10), np.float32)

    # all negatives: box/lmk masks empty -> only cls contributes
    st = np.full(b, tm.NEGATIVE)
    _, m = _loss(cls, box, lmk, labels, box_t, lmk_t, st)
    assert m['box_loss'] == 0.0 and m['lmk_loss'] == 0.0
    assert m['cls_loss'] > 0

    # all landmark samples: only lmk contributes
    st = np.full(b, tm.LANDMARK)
    _, m = _loss(cls, box, lmk, labels, box_t, lmk_t, st)
    assert m['box_loss'] == 0.0 and m['lmk_loss'] == 10.0
    assert m['cls_loss'] == 0.0

    # part faces: box only
    st = np.full(b, tm.PART)
    _, m = _loss(cls, box, lmk, labels, box_t, lmk_t, st)
    assert m['box_loss'] == 4.0 and m['cls_loss'] == 0.0


def test_ohem_keeps_hardest_fraction():
    b = 10
    # one very-wrong sample, nine perfect: with keep=0.1 only the hard one
    cls = np.zeros((b, 2), np.float32)
    cls[:, 0] = 5.0                      # predicts class 0 strongly
    labels = np.zeros(b, np.int64)
    labels[0] = 1                        # sample 0 is wrong -> high CE
    st = np.full(b, tm.NEGATIVE)
    box_t = np.zeros((b, 4), np.float32)

    _, m_all = _loss(cls, np.zeros((b, 4)), None, labels, box_t,
                     np.zeros((b, 10)), st, ohem_keep=1.0)
    _, m_hard = _loss(cls, np.zeros((b, 4)), None, labels, box_t,
                      np.zeros((b, 10)), st, ohem_keep=0.1)
    # keeping only the hardest sample gives a much larger mean loss
    assert m_hard['cls_loss'] > 5 * m_all['cls_loss']


def test_generate_training_crops_invariants():
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (120, 160, 3), dtype=np.uint8)
    gt = np.array([[40, 30, 90, 80], [100, 60, 140, 100]], np.float32)

    crops, labels, targets, lmk_targets, types = tm.generate_training_crops(
        image, gt, out_size=12, rng=rng)

    assert crops.shape[1:] == (12, 12, 3)
    assert lmk_targets.shape == (len(crops), 10)
    assert len(crops) == len(labels) == len(targets) == len(types)
    assert (types == tm.NEGATIVE).sum() > 0
    assert ((types == tm.POSITIVE) | (types == tm.PART)).sum() > 0
    # negatives carry label 0 and zero targets
    neg = types == tm.NEGATIVE
    assert (labels[neg] == 0).all()
    assert (targets[neg] == 0).all()
    # positives carry label 1 and offsets bounded by ~the window size
    pos = types == tm.POSITIVE
    assert (labels[pos] == 1).all()
    assert np.abs(targets[pos]).max() < 1.0


@pytest.mark.parametrize('net', ['pnet', 'rnet', 'onet'])
def test_trainer_learns_bright_square_task(net):
    """Positives are bright center squares, negatives dark noise — two
    epochs of the stage trainer must push cls accuracy well above chance."""
    rng = np.random.RandomState(0)
    trainer = tm.MTCNNTrainer(net=net, learning_rate=3e-3)
    state = trainer.init_state(seed=0)
    s = trainer.size

    def batch(n=64):
        half = n // 2
        pos = rng.randint(100, 256, (half, s, s, 3))
        neg = rng.randint(0, 80, (n - half, s, s, 3))
        crops = np.concatenate([pos, neg]).astype(np.uint8)
        labels = np.array([1] * half + [0] * (n - half), np.int32)
        st = np.array([tm.POSITIVE] * half + [tm.NEGATIVE] * (n - half),
                      np.int32)
        box_t = np.zeros((n, 4), np.float32)
        lmk_t = np.zeros((n, 10), np.float32)
        return crops, labels, box_t, lmk_t, st

    metrics = None
    for _ in range(30):
        state, metrics = trainer.train_step(state, *batch())
    assert float(metrics['cls_accuracy']) > 0.9, dict(metrics)


def test_trained_pnet_slots_into_cascade():
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN

    trainer = tm.MTCNNTrainer(net='pnet')
    state = trainer.init_state(seed=0)

    det = MTCNN(image_shape=(128, 128))
    params = dict(det.params)
    params['pnet'] = state['params']
    det2 = MTCNN(image_shape=(128, 128), params=params)
    out = det2.detect_batch(np.zeros((1, 128, 128, 3), np.uint8))
    assert out['boxes'].shape[0] == 1


def test_train_accepts_generator_for_multiple_epochs():
    # regression: a generator passed with epochs > 1 silently trained only
    # the first epoch
    rng = np.random.RandomState(0)
    trainer = tm.MTCNNTrainer(net='pnet', learning_rate=1e-3)
    state = trainer.init_state(seed=0)
    s = trainer.size

    def one_batch():
        crops = rng.randint(0, 255, (8, s, s, 3)).astype(np.uint8)
        labels = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.int32)
        st = np.array([tm.POSITIVE] * 4 + [tm.NEGATIVE] * 4, np.int32)
        return (crops, labels, np.zeros((8, 4), np.float32),
                np.zeros((8, 10), np.float32), st)

    gen = (one_batch() for _ in range(3))
    state, _ = trainer.train(state, gen, epochs=2, log_every=0)
    assert int(state['step']) == 6     # 3 batches x 2 epochs

    # factory form
    state, _ = trainer.train(state, lambda: [one_batch() for _ in range(2)],
                             epochs=2, log_every=0)
    assert int(state['step']) == 10


def test_generate_landmark_samples():
    rng = np.random.RandomState(0)
    image = rng.randint(0, 256, (120, 160, 3), dtype=np.uint8)
    gt = np.array([[40, 30, 90, 80]], np.float32)
    # 5 landmarks inside the box
    lmk = np.array([[[52, 45], [78, 45], [65, 57], [55, 68], [75, 68]]],
                   np.float32)
    crops, labels, targets, lmk_t, types = tm.generate_training_crops(
        image, gt, out_size=48, rng=rng, gt_landmarks=lmk)
    lm = types == tm.LANDMARK
    assert lm.sum() > 0
    # landmark targets normalized into [0, 1], x-block then y-block
    assert lmk_t[lm].min() >= 0 and lmk_t[lm].max() <= 1
    # non-landmark samples carry zero landmark targets
    assert (lmk_t[~lm] == 0).all()
