import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facenet_tpu.models.inception_resnet_v2 import (InceptionResnetV2,
                                                    check_input_config)

TINY_V2 = {'repeat': [1, 1, 1], 'embedding_size': 48}


@pytest.fixture(scope='module')
def tiny_v2():
    model = InceptionResnetV2(config=TINY_V2)
    imgs = np.random.RandomState(0).randint(
        0, 256, (2, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    return model, variables, imgs


def test_v2_defaults():
    cfg = check_input_config(None)
    assert list(cfg.repeat) == [10, 20, 9]
    assert cfg.embedding_size == 512
    assert cfg.keep_probability == 0.8
    assert cfg.mixed_5a.branch == [[96], [48, 64], [64, 96, 96], [64]]


def test_v2_forward(tiny_v2):
    model, variables, imgs = tiny_v2
    out = model.apply(variables, imgs, train=False)
    assert out.shape == (2, 48)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0,
                               atol=1e-5)


def test_v2_train_mode_dropout_and_stats(tiny_v2):
    model, variables, imgs = tiny_v2
    out1, mut = model.apply(variables, imgs, train=True,
                            mutable=['batch_stats'],
                            rngs={'dropout': jax.random.PRNGKey(1)})
    out2, _ = model.apply(variables, imgs, train=True,
                          mutable=['batch_stats'],
                          rngs={'dropout': jax.random.PRNGKey(2)})
    # dropout active in train mode -> different rngs give different outputs
    assert not np.allclose(np.asarray(out1), np.asarray(out2))

    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(mut['batch_stats'])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_v2_full_param_count():
    model = InceptionResnetV2()
    imgs = jnp.zeros((1, 160, 160, 3), jnp.uint8)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, train=False))
    n = sum(int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(variables['params']))
    # full Inception-ResNet-v2 backbone: ~55M parameters
    assert 50e6 < n < 60e6


def test_v2_export_roundtrip(tmp_path, tiny_v2):
    from facenet_tpu import export
    model, variables, imgs = tiny_v2
    want = np.asarray(model.apply(variables, imgs, train=False))

    path = export.save_model(tmp_path / 'v2bundle', model, variables,
                             extra_meta={'model_class': 'InceptionResnetV2'})
    bundle = export.load_model(path)
    assert isinstance(bundle.model, InceptionResnetV2)
    got = np.asarray(bundle.model.apply(bundle.variables, imgs, train=False))
    np.testing.assert_allclose(got, want, atol=1e-6)
