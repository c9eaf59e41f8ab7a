"""Fused detect->align->embed pipeline (facenet_tpu/pipeline.py).

CPU-mesh tests on the TINY model config; the single-chip speed numbers
(2,181 aligned emb/s fused vs 1,368 chained) live in
tools/bench_detect_e2e.py / CLAUDE.md.
"""

import numpy as np
import pytest

import jax

from facenet_tpu.config import Config
from facenet_tpu.utils.synthetic import render_scene

TINY_MODEL = Config({'block35': {'repeat': 1}, 'block17': {'repeat': 1},
                     'block8_1': {'repeat': 1}, 'output': {'size': 32}})
SHAPE = (256, 256)


@pytest.fixture(scope='module')
def bundle_path(tmp_path_factory):
    from facenet_tpu import export
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    path = tmp_path_factory.mktemp('model') / 'bundle'
    model = InceptionResnetV1(config=TINY_MODEL)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 160, 160, 3), np.uint8), train=False)
    export.save_model(path, model, variables)
    return path


@pytest.fixture(scope='module')
def scenes():
    rng = np.random.RandomState(11)
    return np.stack([render_scene(rng, shape=SHAPE, n_faces=1,
                                  min_face=80, max_face=140)[0]
                     for _ in range(2)])


def test_pipeline_crop_mode(bundle_path, scenes):
    from facenet_tpu.pipeline import FacePipeline

    pipe = FacePipeline(bundle_path, image_shape=SHAPE, align='crop')
    out = pipe.process_batch(scenes)
    assert out['embeddings'].shape == (2, 1, 32)
    assert out['valid'].any(), 'no faces found in single-face scenes'
    for i in range(2):
        if out['valid'][i, 0]:
            # L2-normed embedding of a real crop
            assert abs(np.linalg.norm(out['embeddings'][i, 0]) - 1) < 1e-3
            x1, y1, x2, y2 = out['boxes'][i, 0]
            assert 0 <= x1 < x2 <= SHAPE[1] + 1
            assert 0 <= y1 < y2 <= SHAPE[0] + 1


def test_pipeline_landmarks_mode(bundle_path, scenes):
    from facenet_tpu.pipeline import FacePipeline

    pipe = FacePipeline(bundle_path, image_shape=SHAPE, align='landmarks')
    out = pipe.process_batch(scenes)
    assert out['valid'].any()
    i = int(np.argmax(out['valid'][:, 0]))
    assert abs(np.linalg.norm(out['embeddings'][i, 0]) - 1) < 1e-3


def test_pipeline_matches_staged_chain(bundle_path, scenes):
    """The fused step must equal the same stages run separately."""
    import jax.numpy as jnp
    from facenet_tpu import FaceNet
    from facenet_tpu.ops.image_ops import crop_and_resize
    from facenet_tpu.pipeline import FacePipeline

    pipe = FacePipeline(bundle_path, image_shape=SHAPE, align='crop',
                        margin=0.2)
    out = pipe.process_batch(scenes)

    det_out = pipe.backend.detect_batch(scenes)
    boxes = jnp.asarray(det_out['boxes'][:, :1])
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    lo = boxes[..., 0:2] - wh * 0.1
    hi = boxes[..., 2:4] + wh * 0.1
    crops = crop_and_resize(jnp.asarray(scenes, jnp.float32),
                            jnp.concatenate([lo, hi], axis=-1), 160)
    crops = np.clip(np.asarray(crops) + 0.5, 0, 255).astype(np.uint8)
    emb = FaceNet(Config({'path': str(bundle_path)})).evaluate(crops[:, 0])
    np.testing.assert_allclose(out['embeddings'][:, 0], emb, atol=2e-2)


def test_pipeline_process_files(bundle_path, scenes, tmp_path):
    from PIL import Image
    from facenet_tpu.pipeline import FacePipeline

    paths = []
    for i, img in enumerate(scenes):
        p = tmp_path / f's{i}.png'
        Image.fromarray(img).save(p)
        paths.append(p)
    # an unreadable file must yield an all-invalid row, not an error
    bad = tmp_path / 'bad.png'
    bad.write_bytes(b'not an image')
    paths.append(bad)

    pipe = FacePipeline(bundle_path, image_shape=SHAPE, align='crop')
    emb, boxes, valid = pipe.process_files(paths, batch_size=2)
    assert emb.shape == (3, 1, 32)
    assert valid[:2].any()
    assert not valid[2].any()
    ref = pipe.process_batch(scenes)
    got = emb[:2, 0][ref['valid'][:, 0]]
    want = ref['embeddings'][:, 0][ref['valid'][:, 0]]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pipeline_rejects_wrong_shape(bundle_path):
    from facenet_tpu.pipeline import FacePipeline

    pipe = FacePipeline(bundle_path, image_shape=SHAPE)
    with pytest.raises(ValueError, match='letterbox'):
        pipe.process_batch(np.zeros((1, 128, 128, 3), np.uint8))
