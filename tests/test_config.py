from pathlib import Path

import pytest

from facenet_tpu import config as config_mod
from facenet_tpu.config import Config, LoadConfigError, load_config


def test_config_attr_access():
    cfg = Config({'a': 1, 'b': {'c': 'x', 'd': {'e': 2}}})
    assert cfg.a == 1
    assert cfg.b.c == 'x'
    assert cfg.b.d.e == 2


def test_config_missing_keys_are_falsy_empty():
    cfg = Config({'a': 1})
    assert not cfg.missing
    assert not cfg.missing.nested.deeper
    assert isinstance(cfg.missing, Config)
    assert bool(cfg)
    assert not Config()


def test_config_as_dict_roundtrip():
    d = {'a': 1, 'b': {'c': [1, 2], 'd': {'e': None}}}
    assert Config(d).as_dict == d


def test_config_exists_and_items():
    cfg = Config({'a': 1, 'b': {'c': 2}})
    assert cfg.exists('a') and not cfg.exists('z')
    assert dict(cfg.items())['a'] == 1


def test_config_update_deep():
    cfg = Config({'a': 1, 'b': {'c': 2, 'd': 3}})
    cfg.update({'b': {'c': 9}, 'e': 4})
    assert cfg.b.c == 9 and cfg.b.d == 3 and cfg.e == 4 and cfg.a == 1


def test_config_repr():
    s = repr(Config({'a': 1, 'b': {'c': 2}}))
    assert 'a: 1' in s and 'c: 2' in s


def test_load_config_cascade(tmp_path, monkeypatch):
    base = tmp_path / 'defaults'
    base.mkdir()
    (base / 'config.yaml').write_text('seed: 0\nbatch_size: 100\nimage:\n  size: 160\n')
    (base / 'myapp.yaml').write_text('image:\n  size: 182\nextra: 1\n')

    monkeypatch.setattr(config_mod, 'default_config_dir', base)
    monkeypatch.setattr(config_mod, 'default_config', base / 'config.yaml')
    monkeypatch.setattr(config_mod, 'user_config_dir', tmp_path / 'nouser')
    monkeypatch.setattr(config_mod, 'user_config', tmp_path / 'nouser/config.yaml')

    custom = tmp_path / 'custom.yaml'
    custom.write_text('batch_size: 10\n')

    cfg = load_config('myapp.py', {'config': custom})
    assert cfg.seed == 0
    assert cfg.batch_size == 10      # custom overrides default
    assert cfg.image.size == 182     # per-app overrides base
    assert cfg.extra == 1


def test_load_config_missing_everything(tmp_path, monkeypatch):
    monkeypatch.setattr(config_mod, 'default_config_dir', tmp_path / 'a')
    monkeypatch.setattr(config_mod, 'default_config', tmp_path / 'a/config.yaml')
    monkeypatch.setattr(config_mod, 'user_config_dir', tmp_path / 'b')
    monkeypatch.setattr(config_mod, 'user_config', tmp_path / 'b/config.yaml')

    with pytest.raises(LoadConfigError):
        load_config('myapp.py', {})


def test_default_configs_ship_with_package():
    assert config_mod.default_config.is_file(), \
        'facenet_tpu/apps/configs/config.yaml must exist'
    cfg = load_config('train_softmax.py', {})
    assert cfg.seed == 0
    assert cfg.image.size == 160


def test_set_seed_returns_key():
    key = config_mod.set_seed(0)
    assert key is not None
