import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facenet_tpu.config import Config
from facenet_tpu.models.inception_resnet_v1 import (
    InceptionResnetV1, check_input_config, create_model, l2_regularization)

# tiny config: one block per stage — same topology, fast to compile
TINY = {
    'block35': {'repeat': 1, 'scale': 0.17, 'activation': 'relu'},
    'block17': {'repeat': 1, 'scale': 0.10, 'activation': 'relu'},
    'block8_1': {'repeat': 1, 'scale': 0.2, 'activation': 'relu'},
    'output': {'size': 64},
}


@pytest.fixture(scope='module')
def tiny_model():
    model = InceptionResnetV1(config=TINY, image_size=160, normalization=0)
    imgs = np.random.RandomState(0).randint(
        0, 256, (2, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    return model, variables, imgs


def test_check_input_config_defaults():
    cfg = check_input_config(None)
    assert cfg.block35.repeat == 5
    assert cfg.block17.repeat == 10
    assert cfg.block8_1.repeat == 5
    assert cfg.output.size == 512
    assert cfg.reduction_a.filters == [[384], [192, 192, 256]]

    # partial override keeps other defaults
    cfg = check_input_config(Config({'block35': {'repeat': 2}}))
    assert cfg.block35.repeat == 2
    assert cfg.block17.repeat == 10


def test_forward_shape_and_normalization(tiny_model):
    model, variables, imgs = tiny_model
    out = model.apply(variables, imgs, train=False)
    assert out.shape == (2, 64)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               atol=1e-5)


def test_forward_unnormalized(tiny_model):
    model, variables, imgs = tiny_model
    raw = model.apply(variables, imgs, train=False, normalize=False)
    norms = np.linalg.norm(np.asarray(raw), axis=1)
    assert not np.allclose(norms, 1.0, atol=1e-3)


def test_train_mode_updates_batch_stats(tiny_model):
    model, variables, imgs = tiny_model
    out, mutated = model.apply(variables, imgs, train=True,
                               mutable=['batch_stats'])
    # train output is unnormalized by default (reference normalizes only at
    # inference, inception_resnet_v1.py:484-494)
    assert out.shape == (2, 64)
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(mutated['batch_stats'])
    changed = any(not np.allclose(o, n) for o, n in zip(old, new))
    assert changed


def test_deterministic_forward(tiny_model):
    model, variables, imgs = tiny_model
    a = model.apply(variables, imgs, train=False)
    b = model.apply(variables, imgs, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_l2_regularization_kernels_only(tiny_model):
    model, variables, _ = tiny_model
    reg = l2_regularization(variables['params'])
    assert float(reg) > 0

    # doubling kernels quadruples the penalty
    params2 = jax.tree_util.tree_map(lambda x: x * 2, variables['params'])
    np.testing.assert_allclose(float(l2_regularization(params2)),
                               4 * float(reg), rtol=1e-5)


def test_preprocessing_inside_model(tiny_model):
    model, variables, _ = tiny_model
    # constant image: normalization 0 maps to ~0 after dynamic-range scaling
    imgs = np.full((1, 160, 160, 3), 128, dtype=np.uint8)
    out = model.apply(variables, imgs, train=False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_create_model_from_config():
    m = create_model(image_cfg=Config({'size': 160, 'normalization': 1}))
    assert m.normalization == 1
    assert m.image_size == 160


def test_full_model_param_count():
    # full IRv1 has ~23.5M params (matches the reference Keras model)
    model = create_model()
    imgs = jnp.zeros((1, 160, 160, 3), jnp.uint8)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, train=False))
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(variables['params']))
    assert 23e6 < n < 24e6
