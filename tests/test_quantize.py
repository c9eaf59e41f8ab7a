"""Int8 post-training quantization of the serving path (models/quantize.py).

The quantized forward must stay close to the bf16 fast path: embeddings
are L2-normalized, so closeness is cosine similarity. PTQ with
per-channel weight scales loses ~1% cosine at int8 on a random-init
net — real trained nets (smoother weights) lose less.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from facenet_tpu.models.inception_resnet_v1 import create_model
from facenet_tpu.models import irv1_fast
from facenet_tpu.models.quantize import calibrate, quantize_fast_params

TINY = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
        'block8_1': {'repeat': 1}, 'output': {'size': 32}}


@pytest.fixture(scope='module')
def fast_setup(rng_images):
    model, images = rng_images
    import jax
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=True)
    params, cfg = irv1_fast.build_fast_params(
        {'params': variables['params'],
         'batch_stats': variables['batch_stats']}, TINY)
    return params, cfg, images


@pytest.fixture(scope='module')
def rng_images():
    model = create_model(TINY)
    rng = np.random.RandomState(7)
    images = rng.randint(0, 256, (8, 160, 160, 3), dtype=np.uint8)
    return model, images


def test_calibration_covers_every_conv(fast_setup):
    params, cfg, images = fast_setup
    absmax = calibrate(params, cfg, images[:4])
    from facenet_tpu.models.quantize import _walk_convs
    tags = {'/'.join(p) for p, _ in _walk_convs(params)}
    # the serving path never runs the un-rewritten stem conv (the s2d
    # form replaces it) and the bottleneck is a plain dot, not _conv
    assert set(absmax) == tags - {'Conv2d_1a_3x3', 'Bottleneck'}
    assert all(v > 0 for v in absmax.values())
    # and the instrumented pass must not leave tags behind
    assert all('tag' not in w for _, w in _walk_convs(params))


def test_int8_embeddings_close_to_bf16(fast_setup):
    params, cfg, images = fast_setup
    ref = np.asarray(irv1_fast.fast_forward(params, cfg, images))

    qparams = quantize_fast_params(params, cfg, images[:4])
    got = np.asarray(irv1_fast.fast_forward(qparams, cfg, images))

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)
    cos = np.sum(got * ref, axis=1)
    assert cos.min() > 0.95, f'int8 drifted: cosine {cos.min():.4f}'


def test_quantized_tree_structure(fast_setup):
    params, cfg, images = fast_setup
    qparams = quantize_fast_params(params, cfg, images[:4])
    # bottleneck stays float
    assert 'k' in qparams['Bottleneck'] and 'kq' not in qparams['Bottleneck']
    blk = qparams['Repeat.block35_1']['heads']
    assert blk['kq'].dtype == jnp.int8
    assert blk['ws'].shape == (blk['kq'].shape[-1],)
    # original tree untouched
    assert 'kq' not in params['Repeat.block35_1']['heads']


@pytest.mark.slow
def test_irv2_quantize_flag():
    import jax
    from facenet_tpu.models.inception_resnet_v2 import InceptionResnetV2
    from facenet_tpu.models.irv2_fast import FastEmbedderV2
    tiny2 = {'repeat': [1, 1, 1], 'embedding_size': 64}
    model = InceptionResnetV2(config=tiny2)
    rng = np.random.RandomState(3)
    images = rng.randint(0, 256, (4, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=True)
    ref = np.asarray(FastEmbedderV2(variables, config=tiny2)(images))
    emb = FastEmbedderV2(variables, config=tiny2, quantize='int8',
                         calib_images=images)
    got = np.asarray(emb(images))
    cos = np.sum(got * ref, axis=1)
    assert cos.min() > 0.95, f'int8 IRv2 drifted: cosine {cos.min():.4f}'


def test_fast_embedder_quantize_flag(rng_images):
    import jax
    model, images = rng_images
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=True)
    emb = irv1_fast.FastEmbedder(variables, TINY, quantize='int8',
                                 calib_images=images[:4])
    out = np.asarray(emb(images[:4]))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    with pytest.raises(ValueError):
        irv1_fast.FastEmbedder(variables, TINY, quantize='int8')
    with pytest.raises(ValueError):
        irv1_fast.FastEmbedder(variables, TINY, quantize='fp4',
                               calib_images=images[:4])


def test_calib_batch_from_mixed_size_directory(tmp_path):
    """FaceNet._calib_batch must resize directory-loaded calibration
    images to the model input so heterogeneous photos stack, and must
    treat quantize: null/false config values as 'disabled'."""
    from PIL import Image
    from facenet_tpu import FaceNet
    from facenet_tpu.config import Config

    rng = np.random.RandomState(3)
    for i, (h, w) in enumerate([(100, 80), (160, 160), (240, 320)]):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f'{i}.png')

    batch = FaceNet._calib_batch(Config({'calib': str(tmp_path)}), 160)
    assert batch.shape == (3, 160, 160, 3)
    assert batch.dtype == np.uint8

    with pytest.raises(ValueError):
        FaceNet._calib_batch(Config({}), 160)
