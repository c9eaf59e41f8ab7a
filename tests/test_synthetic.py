"""Synthetic face data: rendering invariants + dataset writers."""

import json

import numpy as np

from facenet_tpu.utils import synthetic


def test_identity_params_deterministic_and_distinct():
    a = synthetic.identity_params(5)
    b = synthetic.identity_params(5)
    c = synthetic.identity_params(6)
    assert all(np.allclose(a[k], b[k]) for k in a)
    assert any(not np.allclose(a[k], c[k]) for k in a)


def test_render_scene_ground_truth():
    rng = np.random.RandomState(0)
    img, boxes, lmks = synthetic.render_scene(rng, shape=(200, 240),
                                              n_faces=3)
    assert img.shape == (200, 240, 3) and img.dtype == np.uint8
    assert boxes.shape == (3, 4) and lmks.shape == (3, 5, 2)

    for b, lm in zip(boxes, lmks):
        assert b[2] > b[0] and b[3] > b[1]
        assert 0 <= b[0] and b[2] <= 240 and 0 <= b[1] and b[3] <= 200
        # all five landmarks inside the (slightly padded) box
        assert (lm[:, 0] >= b[0] - 2).all() and (lm[:, 0] <= b[2] + 2).all()
        assert (lm[:, 1] >= b[1] - 2).all() and (lm[:, 1] <= b[3] + 2).all()
        # left eye left of right eye; eyes above mouth corners
        assert lm[0, 0] < lm[1, 0]
        assert lm[0, 1] < lm[3, 1] and lm[1, 1] < lm[4, 1]


def test_render_scene_zero_faces():
    rng = np.random.RandomState(1)
    img, boxes, lmks = synthetic.render_scene(rng, n_faces=0)
    assert boxes.shape == (0, 4) and lmks.shape == (0, 5, 2)


def test_render_face_patch_reproducible_identity():
    # same identity, same rng seed -> same image; different identity differs
    a = synthetic.render_face_patch(64, 3, np.random.RandomState(5))
    b = synthetic.render_face_patch(64, 3, np.random.RandomState(5))
    c = synthetic.render_face_patch(64, 4, np.random.RandomState(5))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    assert a.shape == (64, 64, 3)


def test_write_detection_dataset(tmp_path):
    ann = synthetic.write_detection_dataset(tmp_path / 'det', 5,
                                            shape=(96, 96), seed=0)
    records = [json.loads(line) for line in ann.read_text().splitlines()]
    assert len(records) == 5
    for rec in records:
        assert (tmp_path / 'det' / rec['image']).exists()
        for box in rec['boxes']:
            assert len(box) == 4

    # consumable by the train_detector app's annotation reader
    from facenet_tpu.apps.train_detector import load_annotations
    loaded = load_annotations(ann)
    assert len(loaded) == 5
    with_faces = [r for r in loaded if len(r['boxes'])]
    assert with_faces and with_faces[0]['landmarks'] is not None


def test_write_identity_dataset_database_compatible(tmp_path):
    root = synthetic.write_identity_dataset(tmp_path / 'ids', n_classes=4,
                                            images_per_class=3, size=48)
    from facenet_tpu import dataset
    dbase = dataset.Database(str(root))
    assert dbase.nrof_classes == 4
    assert dbase.nrof_images == 12
    # images decode at the written size
    from PIL import Image
    arr = np.asarray(Image.open(dbase.files[0]))
    assert arr.shape == (48, 48, 3)


def test_stress_family_renders_and_perturbs():
    """The 'stress' family (round 4): valid ground truth, and the frame is
    actually perturbed relative to the base renderer at the same seed."""
    rng = np.random.RandomState(11)
    img, boxes, lmks = synthetic.render_scene(
        rng, shape=(128, 128), n_faces=2, min_face=30, max_face=60,
        family='stress')
    assert img.dtype == np.uint8 and img.shape == (128, 128, 3)
    assert boxes.shape[1] == 4 and len(lmks) == len(boxes)
    assert (boxes[:, 2] > boxes[:, 0]).all()
    assert (boxes[:, :2] >= -1).all() and (boxes[:, 2] <= 129).all()

    base = synthetic.render_scene(
        np.random.RandomState(11), shape=(128, 128), n_faces=2,
        min_face=30, max_face=60, family='base')[0]
    # stress postprocess (lighting/blur/JPEG) must change the pixels
    assert np.abs(img.astype(np.int32) - base.astype(np.int32)).mean() > 2

    with np.testing.assert_raises(ValueError):
        synthetic.render_scene(rng, shape=(64, 64), family='nosuch')
