"""Model zoo registry: `module:`-key selection (the reference model-YAML
contract, reference models/configs/*.yaml `module: facenet.models.<net>`)."""

import numpy as np
import pytest

import jax

from facenet_tpu import models
from facenet_tpu.config import Config

TINY_V1 = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
           'block8_1': {'repeat': 1}, 'output': {'size': 32}}
TINY_V2 = {'repeat': [1, 1, 1], 'embedding_size': 32}


def test_zoo_names_resolve():
    m1 = models.create_model_from_config('inception_resnet_v1')
    m2 = models.create_model_from_config('inception_resnet_v2')
    assert type(m1).__name__ == 'InceptionResnetV1'
    assert type(m2).__name__ == 'InceptionResnetV2'


def test_reference_module_names_map():
    for ref, expected in [
            ('facenet.models.inception_resnet_v1', 'inception_resnet_v1'),
            ('facenet.models.inception_resnet_v2', 'inception_resnet_v2')]:
        mod = models.resolve_module(ref)
        assert mod.__name__ == f'facenet_tpu.models.{expected}'


def test_yaml_configs_load():
    for name in ('inception_resnet_v1', 'inception_resnet_v2'):
        cfg = models.load_model_config(name)
        assert cfg.module == f'facenet_tpu.models.{name}'
        assert cfg.config


def test_unknown_config_raises():
    with pytest.raises(ValueError, match='unknown model config'):
        models.load_model_config('resnet9000')


def test_module_key_selects_v2():
    model = models.create_model_from_config(
        Config({'module': 'inception_resnet_v2', 'config': TINY_V2}))
    assert type(model).__name__ == 'InceptionResnetV2'
    imgs = np.random.RandomState(0).randint(
        0, 256, (2, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), imgs[:1], train=False)
    out = model.apply(variables, imgs, train=False)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_bare_topology_defaults_to_v1():
    model = models.create_model_from_config(Config(TINY_V1))
    assert type(model).__name__ == 'InceptionResnetV1'


def test_model_block_ignores_run_keys():
    # cfg.model straight from an app config: path/checkpoint must not leak
    # into the topology
    model = models.create_model_from_config(
        Config({'path': '/tmp/x', 'checkpoint': None, 'config': TINY_V1}))
    assert type(model).__name__ == 'InceptionResnetV1'


def test_export_roundtrip_preserves_model_class(tmp_path):
    # regression: save_model used to hardcode InceptionResnetV1 in the
    # bundle meta, so load_model rebuilt the wrong template for IRv2
    from facenet_tpu import export

    model = models.create_model_from_config(
        Config({'module': 'inception_resnet_v2', 'config': TINY_V2}))
    imgs = np.zeros((1, 160, 160, 3), np.uint8)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    path = export.save_model(tmp_path / 'bundle', model, variables)

    bundle = export.load_model(path)
    assert type(bundle.model).__name__ == 'InceptionResnetV2'
    out = bundle.model.apply(bundle.variables, imgs, train=False)
    assert out.shape == (1, 32)
