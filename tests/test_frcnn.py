"""TPU-native Faster-RCNN face detector (the 'frcnnv3' backend rebuild)."""

import numpy as np
import pytest

from facenet_tpu.detectors.frcnn.detector import (FasterRCNN,
                                                  FasterRCNNTrainer,
                                                  match_anchors)
from facenet_tpu.detectors.frcnn.network import (anchor_grid, decode_deltas,
                                                 encode_deltas)

SHAPE = (128, 128)


def test_anchor_grid_covers_image():
    anchors = anchor_grid(*SHAPE)
    assert anchors.shape == ((SHAPE[0] // 16) * (SHAPE[1] // 16) * 12, 4)
    centers_x = (anchors[:, 0] + anchors[:, 2]) / 2
    assert centers_x.min() >= 0 and centers_x.max() <= SHAPE[1]


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = anchor_grid(*SHAPE)[:50]
    boxes = anchors + rng.uniform(-5, 5, anchors.shape).astype(np.float32)
    deltas = encode_deltas(anchors, boxes)
    import jax.numpy as jnp
    rec = np.asarray(decode_deltas(jnp.asarray(anchors), jnp.asarray(deltas)))
    np.testing.assert_allclose(rec, boxes, rtol=1e-4, atol=1e-3)


def test_detect_batch_shapes():
    det = FasterRCNN(image_shape=SHAPE, max_proposals=64, max_outputs=8)
    imgs = np.random.RandomState(0).randint(
        0, 256, (2,) + SHAPE + (3,), dtype=np.uint8)
    out = det.detect_batch(imgs)
    assert out['boxes'].shape == (2, 8, 4)
    assert out['scores'].shape == (2, 8)
    assert out['valid'].dtype == bool
    assert np.isfinite(out['boxes']).all()


def test_match_anchors_rules():
    anchors = anchor_grid(*SHAPE)
    gt = np.array([[30.0, 30.0, 70.0, 70.0]], np.float32)
    labels, targets = match_anchors(anchors, gt)
    assert (labels == 1).sum() >= 1            # best anchor always positive
    assert (labels == 0).sum() > 0
    pos = labels == 1
    # targets decode back onto the gt box
    import jax.numpy as jnp
    rec = np.asarray(decode_deltas(jnp.asarray(anchors[pos]),
                                   jnp.asarray(targets[pos])))
    np.testing.assert_allclose(rec, np.repeat(gt, pos.sum(), 0), atol=1e-2)

    # no gt -> all negatives
    labels0, _ = match_anchors(anchors, np.zeros((0, 4), np.float32))
    assert (labels0 == 0).all()


def test_trainer_learns_to_localize():
    """Bright squares on dark noise: after training, detections overlap gt."""
    rng = np.random.RandomState(0)
    det = FasterRCNN(image_shape=SHAPE, threshold=0.5, max_proposals=64,
                     max_outputs=8)
    trainer = FasterRCNNTrainer(det, learning_rate=2e-3)
    state = trainer.init_state(seed=0)

    def scene(n):
        imgs = rng.randint(0, 50, (n,) + SHAPE + (3,)).astype(np.uint8)
        gts = []
        for i in range(n):
            side = rng.randint(40, 70)
            x = rng.randint(0, SHAPE[1] - side)
            y = rng.randint(0, SHAPE[0] - side)
            imgs[i, y:y + side, x:x + side] = rng.randint(
                180, 255, (side, side, 3))
            gts.append(np.array([[x, y, x + side, y + side]], np.float32))
        return imgs, gts

    metrics = None
    for _ in range(30):
        imgs, gts = scene(4)
        state, metrics = trainer.train_step(state, imgs, gts)
    assert float(metrics['rpn_cls']) < 0.3, dict(metrics)

    det2 = FasterRCNN(image_shape=SHAPE, threshold=0.5, max_proposals=64,
                      max_outputs=8, params=state['params'])
    imgs, gts = scene(2)
    out = det2.detect_batch(imgs)
    hits = 0
    for i in range(2):
        boxes = out['boxes'][i][out['valid'][i]]
        g = gts[i][0]
        for b in boxes:
            ix = max(0, min(b[2], g[2]) - max(b[0], g[0]))
            iy = max(0, min(b[3], g[3]) - max(b[1], g[1]))
            inter = ix * iy
            union = ((b[2] - b[0]) * (b[3] - b[1]) +
                     (g[2] - g[0]) * (g[3] - g[1]) - inter)
            if inter / max(union, 1) > 0.3:
                hits += 1
                break
    assert hits >= 1, (out['scores'], gts)


def test_facade_frcnnv3_backend():
    from facenet_tpu.detectors.face_detector import FaceDetector
    fd = FaceDetector(detector='frcnnv3', image_shape=SHAPE,
                      max_proposals=64, max_outputs=8)
    imgs = np.random.RandomState(1).randint(
        0, 256, (1, 100, 140, 3), dtype=np.uint8)   # letterboxed internally
    results = fd.detect_images(imgs)
    assert isinstance(results, list) and len(results) == 1
    assert 'frcnnv3' in repr(fd)


def test_frcnn_detect_files_pipelined(tmp_path):
    """detect_files must take the two-deep async pipeline with the FRCNN
    backend (detect_batch_async/finalize_batch) and match detect_images."""
    from PIL import Image
    from facenet_tpu import native
    from facenet_tpu.detectors.face_detector import FaceDetector
    if not native.available():
        pytest.skip('native library unavailable')

    rng = np.random.RandomState(0)
    images, paths = [], []
    for i, (h, w) in enumerate([(100, 140), (90, 90), (120, 80)]):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f'{i}.png'
        Image.fromarray(img).save(p)
        images.append(img)
        paths.append(str(p))

    fd = FaceDetector(detector='frcnnv3', image_shape=SHAPE,
                      max_proposals=64, max_outputs=8)
    assert hasattr(fd._backend, 'detect_batch_async')
    from_files = fd.detect_files(paths, batch_size=2)
    from_arrays = fd.detect_images(images)
    assert len(from_files) == 3
    for got, want in zip(from_files, from_arrays):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (g.left, g.top, g.width, g.height) == \
                   (w.left, w.top, w.width, w.height)
