"""Multi-bucket detection geometry (VERDICT r3 weak #4).

A single fixed letterbox shape shrinks a small face in a large scene
below `min_face_size`, where the reference's native-resolution pyramid
(ref detectors/face_detector.py:63-78) would find it. With
`image_shapes` buckets the facade routes each input to the bucket that
avoids downscaling; these tests prove the routing rule and the recall
gain on exactly that scenario.
"""

import numpy as np
import pytest

from facenet_tpu.detectors import pretrained
from facenet_tpu.detectors.face_detector import FaceDetector
from facenet_tpu.utils.synthetic import render_scene

SMALL = (64, 80)      # a face of ~36 px letterboxed here lands at ~9 px
FULL = (256, 256)     # native scale for the test scenes


def _iou(a, b):
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    union = ((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter)
    return inter / union if union > 0 else 0.0


def _scenes(n=6, seed=77):
    rng = np.random.RandomState(seed)
    return [render_scene(rng, shape=FULL, n_faces=1,
                         min_face=34, max_face=44) for _ in range(n)]


def _recall(fd, scenes):
    hits = 0
    detections = fd.detect_images([s[0] for s in scenes])
    for (img, gt, _lmk), boxes in zip(scenes, detections):
        x1, y1, x2, y2 = np.asarray(gt[0], np.float32)[:4]
        hits += any(_iou((b.left, b.top, b.right, b.bottom),
                         (x1, y1, x2, y2)) >= 0.5 for b in boxes)
    return hits / len(scenes)


def test_route_shape_prefers_native_scale():
    fd = FaceDetector.__new__(FaceDetector)   # routing is pure geometry
    fd.image_shapes = [(64, 80), (256, 256), (512, 640)]
    # fits the small bucket without downscale -> cheapest bucket wins
    assert fd.route_shape(60, 80) == (64, 80)
    # needs the middle bucket to stay at native scale
    assert fd.route_shape(250, 250) == (256, 256)
    # larger than every bucket -> least-downscaling (largest) bucket
    assert fd.route_shape(1080, 1920) == (512, 640)
    # single bucket always returns it
    fd.image_shapes = [(480, 640)]
    assert fd.route_shape(4000, 6000) == (480, 640)


@pytest.mark.skipif(pretrained.bundled_path('mtcnn') is None,
                    reason='mtcnn bundle not built')
@pytest.mark.slow
def test_small_faces_need_the_large_bucket():
    scenes = _scenes()

    # routed multi-bucket detector: the 256x256 scenes hit the FULL bucket
    fd_multi = FaceDetector(detector='mtcnn', image_shapes=[SMALL, FULL])
    assert fd_multi.route_shape(*FULL) == FULL
    recall_multi = _recall(fd_multi, scenes)

    # the small bucket alone shrinks the faces below min_face_size: the
    # same scenes through the same weights become undetectable
    recall_small = _recall(
        FaceDetector(detector='mtcnn', image_shape=SMALL), scenes)

    print(f'recall small-bucket={recall_small:.2f} '
          f'multi-bucket={recall_multi:.2f}')
    assert recall_multi >= 0.8
    assert recall_small <= recall_multi - 0.5

    # lazy construction: only buckets actually routed to were compiled
    assert set(fd_multi._backends) == {SMALL, FULL}


@pytest.mark.skipif(pretrained.bundled_path('mtcnn') is None,
                    reason='mtcnn bundle not built')
@pytest.mark.slow
def test_detect_files_routes_by_probe(tmp_path):
    from PIL import Image

    from facenet_tpu import native
    if not native.available():
        pytest.skip('native loader unavailable')

    scenes = _scenes(n=4, seed=99)
    paths = []
    for i, (img, _gt, _lmk) in enumerate(scenes):
        p = tmp_path / f'scene_{i}.png'
        Image.fromarray(img).save(p)
        paths.append(p)
    # one tiny image that routes to the small bucket
    tiny = tmp_path / 'tiny.png'
    Image.fromarray(np.zeros((48, 60, 3), np.uint8)).save(tiny)
    paths.insert(2, tiny)

    fd = FaceDetector(detector='mtcnn', image_shapes=[SMALL, FULL])
    results = fd.detect_files(paths, batch_size=4)
    assert len(results) == len(paths)
    assert results[2] == []          # blank tiny image: no faces

    # the contract: the pipelined multi-bucket file path must agree with
    # the in-memory routed path, image for image, box for box
    arrays = [np.asarray(Image.open(p).convert('RGB')) for p in paths]
    expected = fd.detect_images(arrays)
    assert [len(r) for r in results] == [len(r) for r in expected]
    for got, want in zip(results, expected):
        for bg, bw in zip(got, want):
            assert (bg.left, bg.top, bg.right, bg.bottom) == \
                   (bw.left, bw.top, bw.right, bw.bottom)
    assert sum(map(bool, expected)) >= 1   # and something was detected


@pytest.mark.skipif(pretrained.bundled_path('mtcnn') is None,
                    reason='mtcnn bundle not built')
@pytest.mark.slow
def test_extract_faces_app_accepts_detector_shapes(tmp_path):
    """CLI surface: detector_shapes config reaches the facade's buckets."""
    import yaml
    from click.testing import CliRunner
    from PIL import Image

    from facenet_tpu.apps.extract_faces import main

    raw = tmp_path / 'raw'
    rng = np.random.RandomState(3)
    d = raw / 'p0'
    d.mkdir(parents=True)
    for i in range(2):
        img, _g, _l = render_scene(rng, shape=(200, 220), n_faces=1,
                                   min_face=70, max_face=120)
        Image.fromarray(img).save(d / f'{i}.png')

    cfg = {
        'dataset': {'path': str(raw)},
        'outdir': str(tmp_path / 'out'),
        'detector': 'mtcnn',
        'detector_shapes': [[96, 112], [256, 256]],
        'image': {'size': 160, 'margin': 0.2},
        'detect_multiple_faces': False,
    }
    cfg_file = tmp_path / 'extract.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))
    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    assert list((tmp_path / 'out').glob('p0/*.png'))
