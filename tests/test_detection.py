import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facenet_tpu.ops import nms as nms_mod
from facenet_tpu.ops import image_ops


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def oracle_nms(boxes, scores, valid, thresh, mode='union'):
    """Literal greedy NMS in numpy."""
    order = np.argsort(-np.where(valid, scores, -np.inf), kind='stable')
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if not valid[i] or suppressed[i]:
            continue
        keep[i] = True
        for j in order:
            if j == i or keep[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            denom = min(a_i, a_j) if mode == 'min' else a_i + a_j - inter
            if inter / max(denom, 1e-10) > thresh:
                suppressed[j] = True
    return keep


@pytest.mark.parametrize('mode', ['union', 'min'])
def test_nms_matches_oracle(mode):
    rng = np.random.RandomState(0)
    k = 32
    xy = rng.uniform(0, 100, (k, 2))
    wh = rng.uniform(5, 40, (k, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, k).astype(np.float32)
    valid = rng.rand(k) > 0.2

    got = np.asarray(nms_mod.nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.4,
        mode=mode))
    want = oracle_nms(boxes, scores, valid, 0.4, mode=mode)
    np.testing.assert_array_equal(got, want)


def test_nms_keeps_best_of_overlapping_pair():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                        dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.5])
    valid = jnp.ones(3, bool)
    keep = np.asarray(nms_mod.nms_mask(boxes, scores, valid, 0.5))
    assert list(keep) == [True, False, True]


def test_nms_invalid_never_kept():
    boxes = jnp.asarray([[0, 0, 10, 10]], dtype=jnp.float32)
    keep = np.asarray(nms_mod.nms_mask(boxes, jnp.asarray([0.9]),
                                       jnp.asarray([False]), 0.5))
    assert not keep[0]


def test_iou_matrix_values():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 5, 10], [20, 20, 30, 30]],
                        dtype=jnp.float32)
    iou = np.asarray(nms_mod.iou_matrix(boxes))
    np.testing.assert_allclose(iou[0, 1], 0.5, atol=1e-6)  # half overlap
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
    # min mode: intersection / smaller area = 50/50 = 1
    iou_min = np.asarray(nms_mod.iou_matrix(boxes, mode='min'))
    np.testing.assert_allclose(iou_min[0, 1], 1.0, atol=1e-6)


def test_top_k_boxes():
    boxes = jnp.asarray(np.arange(20).reshape(5, 4).astype(np.float32))
    scores = jnp.asarray([0.1, 0.9, 0.5, 0.7, 0.3])
    valid = jnp.asarray([True, True, False, True, True])
    b, s, v = nms_mod.top_k_boxes(boxes, scores, valid, 3)
    np.testing.assert_allclose(np.asarray(s), [0.9, 0.7, 0.3])
    assert np.all(np.asarray(v))
    np.testing.assert_allclose(np.asarray(b)[0], boxes[1])


def test_square_boxes():
    boxes = jnp.asarray([[0, 0, 20, 10]], dtype=jnp.float32)
    sq = np.asarray(nms_mod.square_boxes(boxes))[0]
    assert sq[2] - sq[0] == pytest.approx(20)
    assert sq[3] - sq[1] == pytest.approx(20)
    # center preserved
    assert (sq[0] + sq[2]) / 2 == pytest.approx(10)
    assert (sq[1] + sq[3]) / 2 == pytest.approx(5)


def test_bbox_regression():
    boxes = jnp.asarray([[0, 0, 10, 20]], dtype=jnp.float32)
    reg = jnp.asarray([[0.1, 0.1, -0.1, -0.1]])
    out = np.asarray(nms_mod.apply_bbox_regression(boxes, reg))[0]
    np.testing.assert_allclose(out, [1.0, 2.0, 9.0, 18.0], atol=1e-6)


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------

def test_crop_and_resize_identity():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 16, 16, 3)).astype(np.float32)
    # crop the full image to the same size -> identity (within bilinear)
    boxes = jnp.asarray([[[0, 0, 16, 16]]], dtype=jnp.float32)
    out = np.asarray(image_ops.crop_and_resize(jnp.asarray(img), boxes, 16))
    np.testing.assert_allclose(out[0, 0], img[0], atol=1e-3)


def test_crop_and_resize_subregion():
    # constant-color quadrants: crop of top-left quadrant must be pure color
    img = np.zeros((1, 20, 20, 3), np.float32)
    img[0, :10, :10] = 100.0
    img[0, :10, 10:] = 200.0
    boxes = jnp.asarray([[[1, 1, 9, 9]]], dtype=jnp.float32)
    out = np.asarray(image_ops.crop_and_resize(jnp.asarray(img), boxes, 8))
    np.testing.assert_allclose(out[0, 0], 100.0, atol=1e-3)


def test_similarity_transform_recovers_known():
    # rotate by 30deg, scale 2, translate (3, 4)
    theta = np.deg2rad(30)
    s = 2.0
    r = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    src = np.random.RandomState(0).rand(5, 2).astype(np.float32) * 10
    dst = (s * src @ r.T + np.array([3, 4])).astype(np.float32)

    m = np.asarray(image_ops.similarity_transform_from_points(
        jnp.asarray(src), jnp.asarray(dst)))
    got = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-4)


def test_invert_affine():
    m = jnp.asarray([[2.0, 0.0, 3.0], [0.0, 0.5, -1.0]])
    inv = np.asarray(image_ops.invert_affine(m))
    pts = np.array([[1.0, 2.0], [5.0, -3.0]])
    fwd = pts @ np.asarray(m)[:, :2].T + np.asarray(m)[:, 2]
    back = fwd @ inv[:, :2].T + inv[:, 2]
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_align_by_landmarks_shapes():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.float32)
    # landmarks roughly at template positions scaled to a 64px face
    lmk = np.tile(image_ops.canonical_landmarks(64)[None], (2, 1, 1))
    out = np.asarray(image_ops.align_by_landmarks(
        jnp.asarray(imgs), jnp.asarray(lmk), 64))
    assert out.shape == (2, 64, 64, 3)
    # landmarks already at canonical -> identity warp
    np.testing.assert_allclose(out, imgs, atol=1e-2)


def test_dense_warp_matches_gather_warp():
    # the gather-free dense formulation is the same bilinear math,
    # including the clamp-to-edge behavior of samples outside the image
    rng = np.random.RandomState(1)
    imgs = rng.uniform(0, 255, (3, 40, 48, 3)).astype(np.float32)
    ths = [0.3, -0.2, 0.05]
    mats = np.stack([
        np.array([[np.cos(t), -np.sin(t), rng.uniform(-8, 8)],
                  [np.sin(t), np.cos(t), rng.uniform(-8, 8)]], np.float32)
        for t in ths])
    a = np.asarray(image_ops.affine_warp(jnp.asarray(imgs),
                                         jnp.asarray(mats), (16, 20)))
    b = np.asarray(image_ops.dense_warp(jnp.asarray(imgs),
                                        jnp.asarray(mats), (16, 20)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_dense_warp_chunked_padding():
    # batch > chunk goes through the padded lax.map path
    rng = np.random.RandomState(2)
    imgs = rng.uniform(0, 255, (5, 24, 24, 3)).astype(np.float32)
    mats = np.tile(np.eye(2, 3, dtype=np.float32)[None], (5, 1, 1))
    out = np.asarray(image_ops.dense_warp(jnp.asarray(imgs),
                                          jnp.asarray(mats), (24, 24),
                                          chunk=2))
    np.testing.assert_allclose(out, imgs, atol=1e-3)


def test_align_dense_matches_gather_on_linear_image():
    # bilinear resampling of a LINEAR image is exact, so the dense
    # method's extra crop resample costs nothing and any disagreement
    # with the gather path would be a geometry (composition) bug
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    img = np.stack([2 * xx, 3 * yy, xx + yy], axis=-1)[None]
    tpl = image_ops.canonical_landmarks(48) - 24.0
    th = 0.3
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    lmk = (tpl @ (1.1 * rot).T + np.array([50.0, 45.0]))[None]
    a = np.asarray(image_ops.align_by_landmarks(
        jnp.asarray(img), jnp.asarray(lmk, np.float32), 48,
        method='gather'))
    b = np.asarray(image_ops.align_by_landmarks(
        jnp.asarray(img), jnp.asarray(lmk, np.float32), 48,
        method='dense'))
    np.testing.assert_allclose(a, b, atol=2e-2)


# ---------------------------------------------------------------------------
# cascade
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def small_mtcnn():
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    return MTCNN(image_shape=(96, 96), min_face_size=20,
                 max_proposals=64, max_refined=16, max_outputs=8,
                 thresholds=(0.1, 0.1, 0.1), seed=0)


def test_pyramid_scales():
    from facenet_tpu.detectors.mtcnn.cascade import pyramid_scales
    scales = pyramid_scales(480, 640, min_face_size=20, factor=0.709)
    assert scales[0] == pytest.approx(12 / 20)
    assert all(s1 > s2 for s1, s2 in zip(scales, scales[1:]))
    # smallest scaled side stays >= 12
    assert 480 * scales[-1] >= 12


def test_cascade_shapes_and_masks(small_mtcnn):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 96, 96, 3), dtype=np.uint8)
    out = small_mtcnn.detect_batch(imgs)

    assert out['boxes'].shape == (2, 8, 4)
    assert out['scores'].shape == (2, 8)
    assert out['landmarks'].shape == (2, 8, 5, 2)
    assert out['valid'].shape == (2, 8)
    assert out['valid'].dtype == bool
    # scores of invalid slots are zeroed
    assert np.all(out['scores'][~out['valid']] == 0)


def test_cascade_deterministic(small_mtcnn):
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, (1, 96, 96, 3), dtype=np.uint8)
    a = small_mtcnn.detect_batch(imgs)
    b = small_mtcnn.detect_batch(imgs)
    np.testing.assert_array_equal(a['boxes'], b['boxes'])
    np.testing.assert_array_equal(a['valid'], b['valid'])


def test_cascade_high_threshold_rejects_everything():
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    det = MTCNN(image_shape=(96, 96), max_proposals=64, max_refined=16,
                max_outputs=8, thresholds=(0.9999, 0.9999, 0.9999), seed=0)
    imgs = np.random.RandomState(0).randint(
        0, 256, (1, 96, 96, 3), dtype=np.uint8)
    out = det.detect_batch(imgs)
    assert not out['valid'].any()


def test_cascade_overflow_accounting(caplog):
    """A dense 20-face scene through tiny capacities must REPORT its
    truncation (VERDICT r2 weak #7): per-stage dropped-proposal counts in
    the output and a logged warning — never silent loss."""
    import logging
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    from facenet_tpu.utils.synthetic import render_scene

    rng = np.random.RandomState(3)
    img, gt_boxes, _ = render_scene(rng, shape=(192, 192), n_faces=20,
                                    min_face=20, max_face=34)
    assert len(gt_boxes) >= 12  # the scene really is dense

    det = MTCNN(image_shape=(192, 192), max_proposals=32, max_refined=8,
                max_outputs=4, thresholds=(1e-6, 1e-6, 1e-6), seed=0)
    with caplog.at_level(logging.WARNING):
        out = det.detect_batch(img[None])

    assert set(out['overflow']) == {'pnet_level', 'pnet', 'rnet', 'onet'}
    for counts in out['overflow'].values():
        assert counts.shape == (1,) and counts.dtype == np.int32
        assert np.all(counts >= 0)
    # with ~everything above threshold, the P-Net grid vastly exceeds K=32
    assert out['overflow']['pnet_level'][0] > 0
    assert any('capacity overflow' in r.message for r in caplog.records)


def test_cascade_no_overflow_on_empty_scene(caplog):
    import logging
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    det = MTCNN(image_shape=(96, 96), max_proposals=64, max_refined=16,
                max_outputs=8, thresholds=(0.9999, 0.9999, 0.9999), seed=0)
    imgs = np.full((1, 96, 96, 3), 64, np.uint8)
    with caplog.at_level(logging.WARNING):
        out = det.detect_batch(imgs)
    assert all(int(c.sum()) == 0 for c in out['overflow'].values())
    assert not any('capacity overflow' in r.message for r in caplog.records)


def test_cascade_wrong_shape_raises(small_mtcnn):
    with pytest.raises(ValueError):
        small_mtcnn.detect_batch(np.zeros((1, 100, 100, 3), np.uint8))


def test_cascade_timing_probe_impl_gated():
    """'pyramid-skip' has WRONG numerics (stale patch buffer) — the
    constructor must refuse it unless a benchmark opts in explicitly."""
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    with pytest.raises(ValueError, match='timing-only probe'):
        MTCNN(image_shape=(96, 96), pnet_impl='pyramid-skip')
    det = MTCNN(image_shape=(96, 96), pnet_impl='pyramid-skip',
                allow_timing_probes=True)
    assert det.pnet_impl == 'pyramid-skip'


def test_letterbox_roundtrip():
    from facenet_tpu.detectors.mtcnn.cascade import letterbox_batch
    img = np.full((50, 100, 3), 128, np.uint8)
    batch, scales, pads = letterbox_batch([img], (96, 96))
    assert batch.shape == (1, 96, 96, 3)
    # 100 -> 96 wide: scale 0.96, height 48 centered with 24px pads
    assert scales[0] == pytest.approx(0.96)
    assert pads[0][0] == 0
    assert pads[0][1] == pytest.approx(24, abs=1)


def test_face_detector_facade():
    from facenet_tpu.detectors.face_detector import FaceDetector

    det = FaceDetector(detector='mtcnn', image_shape=(96, 96),
                       max_proposals=64, max_refined=16, max_outputs=8,
                       thresholds=(0.1, 0.1, 0.1))
    img = np.random.RandomState(0).randint(0, 256, (80, 120, 3),
                                           dtype=np.uint8)
    boxes = det.detect(img)
    assert isinstance(boxes, list)
    for b in boxes:
        assert hasattr(b, 'confidence') and b.landmarks.shape == (5, 2)


def test_detect_files_matches_detect_images(tmp_path):
    """The threaded native JPEG->boxes path must produce the same boxes as
    the in-memory path (PNG = lossless, shared letterbox geometry), and
    unreadable files must yield empty lists, not errors."""
    from PIL import Image
    from facenet_tpu import native
    from facenet_tpu.detectors.face_detector import FaceDetector

    rng = np.random.RandomState(0)
    images, paths = [], []
    for i, (h, w) in enumerate([(80, 120), (96, 96), (50, 70)]):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f'{i}.png'
        Image.fromarray(img).save(p)
        images.append(img)
        paths.append(p)
    bad = tmp_path / 'broken.png'
    bad.write_bytes(b'not an image')
    paths.append(bad)

    det = FaceDetector(detector='mtcnn', image_shape=(96, 96),
                       max_proposals=64, max_refined=16, max_outputs=8,
                       thresholds=(0.1, 0.1, 0.1))
    from_files = det.detect_files(paths, batch_size=2)
    from_arrays = det.detect_images(images)

    assert len(from_files) == 4
    assert from_files[3] == []
    if native.available():
        for got, want in zip(from_files[:3], from_arrays):
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert (g.left, g.top, g.width, g.height) == \
                       (w.left, w.top, w.width, w.height)


def test_detect_files_fallback_without_native(tmp_path, monkeypatch):
    """With the native loader unavailable, detect_files must fall back to
    PIL decode + detect_images and still give unreadable files an EMPTY
    list — never a dummy frame through the cascade (spurious boxes)."""
    from PIL import Image
    from facenet_tpu import native
    from facenet_tpu.detectors.face_detector import FaceDetector

    rng = np.random.RandomState(0)
    images, paths = [], []
    for i, (h, w) in enumerate([(80, 120), (96, 96), (50, 70)]):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f'{i}.png'
        Image.fromarray(img).save(p)
        images.append(img)
        paths.append(p)
    bad = tmp_path / 'broken.png'
    bad.write_bytes(b'not an image')
    paths.insert(1, bad)  # mid-batch, not just trailing

    monkeypatch.setattr(native, 'available', lambda: False)
    det = FaceDetector(detector='mtcnn', image_shape=(96, 96),
                       max_proposals=64, max_refined=16, max_outputs=8,
                       thresholds=(0.1, 0.1, 0.1))
    from_files = det.detect_files(paths, batch_size=2)
    from_arrays = det.detect_images(images)

    assert len(from_files) == 4
    assert from_files[1] == []
    for got, want in zip([from_files[0]] + from_files[2:], from_arrays):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (g.left, g.top, g.width, g.height) == \
                   (w.left, w.top, w.width, w.height)


def test_face_detector_unknown_backend():
    from facenet_tpu.detectors.face_detector import FaceDetector
    with pytest.raises(ValueError):
        FaceDetector(detector='nope')


def test_bounding_box_semantics():
    from facenet_tpu.detectors.face_detector import BoundingBox
    b = BoundingBox(left=10.4, top=20.6, width=30, height=40, confidence=0.9)
    assert b.left == 10 and b.top == 21
    assert b.width == 30 and b.height == 40
    assert b.left_upper == (10, 21)
    assert '0.9' in b.confidence_as_string


def test_margin_crop_image_processing():
    from PIL import Image
    from facenet_tpu.detectors.face_detector import (BoundingBox,
                                                     image_processing)
    from facenet_tpu.config import Config

    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (100, 100, 3), dtype=np.uint8))
    box = BoundingBox(left=20, top=20, width=40, height=40)
    out = image_processing(img, box, Config({'size': 32, 'margin': 0.2}))
    # output size = ceil(32 + 32*0.2)
    assert out.size == (39, 39)

    with pytest.raises(ValueError):
        image_processing(np.zeros((5, 5, 3)), box, Config({'size': 32}))


def test_pnet_base_boxes_conventions():
    """'exact' covers the true receptive window [2x, 2x+12)/scale;
    'caffe' reproduces upstream generateBoundingBox q1=(2x+1)/s,
    q2=(2x+12)/s (det*.npy regressors are trained against that base)."""
    from facenet_tpu.detectors.mtcnn.cascade import pnet_base_boxes

    scale = 0.5
    exact = np.asarray(pnet_base_boxes(3, 4, scale, 'exact'))
    caffe = np.asarray(pnet_base_boxes(3, 4, scale, 'caffe'))
    for y in range(3):
        for x in range(4):
            np.testing.assert_allclose(
                exact[y, x],
                [2 * x / scale, 2 * y / scale,
                 (2 * x + 12) / scale, (2 * y + 12) / scale], rtol=1e-6)
            np.testing.assert_allclose(
                caffe[y, x],
                [(2 * x + 1) / scale, (2 * y + 1) / scale,
                 (2 * x + 12) / scale, (2 * y + 12) / scale], rtol=1e-6)


def test_detect_handles_gray_and_rgba_inputs():
    """Grayscale/RGBA inputs must letterbox safely (the native letterbox
    reads exactly H*W*3 bytes — ungated these were an out-of-bounds read
    / channel-skewed garbage) and match the equivalent RGB detection."""
    from facenet_tpu.detectors.face_detector import FaceDetector
    from facenet_tpu.detectors.mtcnn.cascade import letterbox_batch

    rng = np.random.RandomState(0)
    gray = rng.randint(0, 256, (60, 80), np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    rgba = np.dstack([rgb, np.full((60, 80), 255, np.uint8)])

    got = letterbox_batch([gray, rgb, rgba, gray[:, :, None]], (96, 96))[0]
    np.testing.assert_array_equal(got[0], got[1])
    np.testing.assert_array_equal(got[2], got[1])
    np.testing.assert_array_equal(got[3], got[1])

    det = FaceDetector(detector='mtcnn', image_shape=(96, 96),
                       max_proposals=64, max_refined=16, max_outputs=8,
                       thresholds=(0.1, 0.1, 0.1))
    for img in (gray, rgba):
        boxes = det.detect(img)
        assert isinstance(boxes, list)

    with pytest.raises(ValueError):
        letterbox_batch([rng.randint(0, 256, (8, 8, 2), np.uint8)], (96, 96))


def test_frcnn_weights_npz_roundtrip(tmp_path):
    """FaceDetector(detector='frcnnv3', weights=<npz>) must accept the
    repo's own bundle format (pretrained.save_params)."""
    from facenet_tpu.detectors import pretrained
    from facenet_tpu.detectors.face_detector import FaceDetector

    params = pretrained.load_bundled('frcnnv3')
    p = tmp_path / 'frcnn.npz'
    pretrained.save_params(p, params)
    fd = FaceDetector(detector='frcnnv3', weights=str(p),
                      image_shape=(128, 128), max_proposals=64,
                      max_outputs=8)
    img = np.random.RandomState(0).randint(0, 256, (100, 120, 3), np.uint8)
    assert isinstance(fd.detect(img), list)


def test_bilinear_edge_clamp_left_top():
    """Samples left of pixel 0 must clamp to the edge pixel — the old
    second-tap-from-clipped-first derivation blended pixels 0 and 1 with
    inverted weights (asymmetric with the correctly-clamped right/bottom)."""
    ramp = jnp.asarray(
        np.arange(5, dtype=np.float32)[:, None, None] *
        np.ones((1, 4, 1), np.float32))     # [5, 4, 1], value = row index
    out = np.asarray(image_ops._bilinear_sample(
        ramp, jnp.asarray([-0.01, -0.9, 4.7]), jnp.asarray([1.0, 2.0, 1.0])))
    np.testing.assert_allclose(out[:, 0], [0.0, 0.0, 4.0], atol=1e-6)

    # interp-matrix form: box [0, 10) upsampled to 24 — the first output
    # sample sits left of pixel 0's center and must take pixel 0 entirely
    m = np.asarray(image_ops._interp_matrix(0.0, 10.0, 10, 24))
    np.testing.assert_allclose(m[0], np.eye(10, dtype=np.float32)[0],
                               atol=1e-6)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_cascade_output_valid_slots_first():
    """The final cascade output must compact valid detections to the
    FRONT, best score first: fixed-capacity consumers (FacePipeline
    reads the first num_faces slots) rely on slot order. Before round 5
    the slots kept the stage-3 entry order (R-Net top-k), so an
    O-Net-rejected candidate could sit ahead of a valid face — latent
    with the round-4 bundle, exposed by the round-5 retrain."""
    from facenet_tpu.detectors import pretrained
    from facenet_tpu.detectors.face_detector import FaceDetector
    from facenet_tpu.utils.synthetic import render_scene

    if pretrained.bundled_path('mtcnn') is None:
        pytest.skip('mtcnn bundle not built')

    rng = np.random.RandomState(11)
    scenes = np.stack([render_scene(rng, shape=(256, 256),
                                    n_faces=rng.randint(1, 3),
                                    min_face=48, max_face=140)[0]
                       for _ in range(6)])
    fd = FaceDetector(detector='mtcnn', image_shape=(256, 256))
    out = fd.backend_for((256, 256)).detect_batch(scenes)
    valid = np.asarray(out['valid'])
    scores = np.asarray(out['scores'])
    assert valid.any(), 'no faces found at all'
    for i in range(len(scenes)):
        v = valid[i].astype(np.int8)
        assert (np.diff(v) <= 0).all(), \
            f'image {i}: valid slots not compacted to the front: {v}'
        n = int(v.sum())
        s = scores[i, :n]
        assert (np.diff(s) <= 1e-6).all(), \
            f'image {i}: valid slots not score-sorted: {s}'
