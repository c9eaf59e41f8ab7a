"""Interpret-mode tests for the flat-lane Pallas stem (ops/pallas_stem.py).

Verifies the fused conv1+conv2a+conv2b+maxpool kernel against the
irv1_fast XLA prefix it replaces (reference stem:
facenet/models/inception_resnet_v1.py:380-430).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facenet_tpu.models.inception_resnet_v1 import create_model
from facenet_tpu.models import irv1_fast as F
from facenet_tpu.ops import pallas_stem as S
from facenet_tpu.ops.preprocessing import image_processing

TINY = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
        'block8_1': {'repeat': 1}, 'output': {'size': 32}}


@pytest.fixture(scope='module')
def fast_params():
    model = create_model()
    x0 = np.zeros((1, 160, 160, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params, _ = F.build_fast_params(variables)
    return params


def _xla_prefix(params, x):
    x = image_processing(x, 160, 0, dtype=jnp.bfloat16)
    b, h, w, c = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    x = jax.nn.relu(F._conv(xs, params['Conv2d_1a_s2d'], 1, 'VALID'))
    x = F._crelu(x, params['Conv2d_2a_3x3'], 1, 'VALID')
    x = F._crelu(x, params['Conv2d_2b_3x3'], 1, 'VALID')
    return jax.lax.reduce_window(
        x, jnp.finfo(x.dtype).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')


def test_stem_flat_matches_xla_prefix(fast_params):
    rng = np.random.RandomState(3)
    images = rng.randint(0, 256, (2, 160, 160, 3), dtype=np.uint8)

    ref = np.asarray(_xla_prefix(fast_params, jnp.asarray(images)),
                     np.float32)
    planes = S.to_planes(image_processing(jnp.asarray(images), 160, 0,
                                          dtype=jnp.bfloat16))
    packed = S.pack_stem(fast_params)
    new = np.asarray(S.stem_forward_flat(packed, planes, interpret=True),
                     np.float32)

    assert new.shape == ref.shape == (2, 37, 37, 64)
    rel = np.abs(ref - new).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.03


def test_stem_flat_small_chunk(fast_params):
    """Multiple chunk iterations per stage must tile correctly."""
    rng = np.random.RandomState(4)
    images = rng.randint(0, 256, (1, 160, 160, 3), dtype=np.uint8)
    planes = S.to_planes(image_processing(jnp.asarray(images), 160, 0,
                                          dtype=jnp.bfloat16))
    packed = S.pack_stem(fast_params)
    full = np.asarray(S.stem_forward_flat(packed, planes, interpret=True),
                      np.float32)
    tiled = np.asarray(S.stem_forward_flat(packed, planes, interpret=True,
                                           chunk=2560), np.float32)
    np.testing.assert_allclose(full, tiled, atol=1e-3)


def test_fast_forward_pallas_stem_matches_xla():
    """fast_forward(stem='pallas-interpret') must match stem='xla' end to
    end (full TINY net, embeddings compared at f32)."""
    model = create_model(TINY)
    rng = np.random.RandomState(5)
    images = rng.randint(0, 256, (2, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(1), images[:1], train=False)
    params, cfg = F.build_fast_params(variables, TINY)

    ref = np.asarray(F.fast_forward(params, cfg, images), np.float32)
    new = np.asarray(F.fast_forward(params, cfg, images,
                                    stem='pallas-interpret'), np.float32)
    cos = (ref * new).sum(axis=1)
    assert cos.min() > 0.999, f'pallas-stem forward drifted: {cos.min():.5f}'


@pytest.mark.slow
def test_fast_forward_pallas_stem_rejects_quantized_stem():
    model = create_model(TINY)
    rng = np.random.RandomState(6)
    images = rng.randint(0, 256, (2, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(1), images[:1], train=False)

    from facenet_tpu.models.quantize import quantize_fast_params
    params, cfg = F.build_fast_params(variables, TINY)
    qdef = quantize_fast_params(params, cfg, images)   # stem quantized
    with pytest.raises(ValueError, match='bf16 s2d stem'):
        F.fast_forward(qdef, cfg, images, stem='pallas-interpret')

    # with skip=STEM_SKIP the stem stays bf16 and the pallas path runs
    qskip = quantize_fast_params(params, cfg, images, skip=F.STEM_SKIP)
    ref = np.asarray(F.fast_forward(qskip, cfg, images), np.float32)
    new = np.asarray(F.fast_forward(qskip, cfg, images,
                                    stem='pallas-interpret'), np.float32)
    cos = (ref * new).sum(axis=1)
    assert cos.min() > 0.999


def test_pack_stem_shapes(fast_params):
    w = S.pack_stem(fast_params)
    assert w['w1'].shape == (32, 64)
    assert w['w2'].shape == (32, 288)
    assert w['w3'].shape == (64, 288)
    assert w['b1'].shape == (32, 1)
    assert w['b3'].shape == (64, 1)
