"""Cascaded-YAML configuration system.

TPU-native re-implementation of the reference config layer
(/root/reference/facenet/config.py:32-262): the same four/five-layer cascade
(package default config.yaml -> package per-app yaml -> user config.yaml ->
user per-app yaml -> --config file), the same attribute-dict `Config` whose
missing keys return a falsy empty `Config` (reference config.py:85-89 — this
empty-falsy semantics is load-bearing: it lets application code write
``if cfg.x:`` for optional settings), and per-app config preparers that derive
output dirs, seed the RNGs and write provenance into the run directory.

Differences from the reference (deliberate, TPU-first):
 - no OmegaConf dependency: plain PyYAML + recursive dict merge;
 - `set_seed` seeds python/numpy and derives a `jax.random.PRNGKey` instead of
   seeding TF's global RNG;
 - preparers return the same artifact contract (arguments yaml + revision info)
   under models/<run>/logs.
"""

from __future__ import annotations

import random
import sys
from collections.abc import Mapping
from datetime import datetime
from pathlib import Path

import numpy as np
import yaml

# directory for default configs shipped with the package
default_config_dir = Path(__file__).parents[0].joinpath('apps', 'configs')
default_config = default_config_dir.joinpath('config.yaml')

# directory for user's configs (sibling of the package, like the reference)
user_config_dir = Path(__file__).parents[1].joinpath('configs')
user_config = user_config_dir.joinpath('config.yaml')

# directory for default trained model
default_model_path = Path(__file__).parents[1].joinpath('models/default')


def subdir():
    """Timestamped run-directory name, identical format to the reference."""
    return datetime.strftime(datetime.now(), '%Y%m%d-%H%M%S')


def config_paths(app_file_name, custom_config_file=None):
    """The config cascade for an app, lowest priority first.

    Mirrors reference config.py:32-45.
    """
    config_name = Path(app_file_name).stem + '.yaml'

    paths = [
        default_config,
        default_config_dir.joinpath(config_name),
        user_config,
        user_config_dir.joinpath(config_name),
    ]

    if custom_config_file is not None:
        paths.append(Path(custom_config_file))

    return tuple(paths)


def value_or(value, default):
    """`value` unless it is a *missing* config entry — None, '', or the
    falsy empty Config a missing key yields — else `default`.

    Use this instead of ``value or default`` whenever 0/False are
    legitimate settings (see CLAUDE.md conventions).
    """
    if value is None or value == '':
        return default
    if hasattr(value, 'as_dict') and not value:
        return default
    return value


def set_seed(seed):
    """Seed python/numpy RNGs and return a jax PRNG key for functional code."""
    seed = int(seed or 0)
    random.seed(seed)
    np.random.seed(seed)
    try:
        import jax
        return jax.random.PRNGKey(seed)
    except ImportError:  # pragma: no cover - jax is always present on TPU
        return None


def _yaml_lines(cfg, depth=0):
    """Render a Config tree as yaml-style ``key: value`` lines (one per leaf,
    nested sections indented), for `Config.__repr__` and the run-dir
    arguments dump (`ioutils.write_arguments`)."""
    pad = '   ' * depth
    for key, item in cfg.items():
        if isinstance(item, Config):
            yield f'{pad}{key}:'
            yield from _yaml_lines(item, depth + 1)
        else:
            yield f'{pad}{key}: {item}'


class Config:
    """YAML settings as a dict-like object with values as attributes.

    Missing attributes return an *empty, falsy* Config so application code can
    write ``if cfg.optional.nested.value:`` without existence checks — the
    same load-bearing semantics as the reference's attr-dict
    (reference config.py:85-89), implemented independently: construction
    delegates to the deep `update`, missing-key lookup special-cases dunder
    names so copy/pickle protocols keep working, and rendering lives in the
    module-level `_yaml_lines`.
    """

    def __init__(self, dct=None):
        if dct:
            self.update(dct)

    def __getattr__(self, name):
        # Normal attribute lookup failed. Dunder probes (copy, pickle,
        # inspect) must see a genuine AttributeError, not a falsy Config.
        if name.startswith('__') and name.endswith('__'):
            raise AttributeError(name)
        return Config()

    def __repr__(self):
        body = '\n'.join(_yaml_lines(self))
        return body + '\n' if body else ''

    def __bool__(self):
        return bool(self.__dict__)

    def __eq__(self, other):
        if isinstance(other, Config):
            return self.as_dict == other.as_dict
        return NotImplemented

    def __contains__(self, name):
        return name in self.__dict__

    @property
    def as_dict(self):
        return {key: item.as_dict if isinstance(item, Config) else item
                for key, item in self.__dict__.items()}

    def items(self):
        return self.__dict__.items()

    def exists(self, name):
        return name in self.__dict__

    def update(self, dct):
        """Deep-update from a dict or Config."""
        if isinstance(dct, Config):
            dct = dct.as_dict
        for key, item in dct.items():
            current = self.__dict__.get(key)
            if isinstance(item, Mapping) and isinstance(current, Config):
                current.update(item)
            elif isinstance(item, Mapping):
                setattr(self, key, Config(item))
            else:
                setattr(self, key, item)


class LoadConfigError(Exception):
    pass


def _deep_merge(base: dict, extra: dict) -> dict:
    """Recursively merge `extra` on top of `base` (OmegaConf.merge semantics)."""
    out = dict(base)
    for key, value in extra.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = value
    return out


def load_config(app_file_name, options=None):
    """Load the merged configuration for an app from the config cascade.

    :param app_file_name: path of the app module (its stem selects per-app yaml)
    :param options: optional dict with a 'config' key pointing at a custom file
    :return: merged Config
    """
    options = options or {}
    paths = config_paths(app_file_name, options.get('config'))

    merged = {}
    loaded_any = False

    for config_path in paths:
        config_path = Path(config_path).expanduser()
        if not config_path.is_file():
            continue
        try:
            with config_path.open('rt') as f:
                new_cfg = yaml.safe_load(f) or {}
            merged = _deep_merge(merged, new_cfg)
            loaded_any = True
        except Exception as err:
            raise LoadConfigError(
                f"Cannot load configuration from '{config_path}'\n{err}")

    if not loaded_any:
        raise LoadConfigError('The configuration has not been loaded.')

    return Config(merged)


# ---------------------------------------------------------------------------
# per-app config preparers (reference config.py:145-262)
# ---------------------------------------------------------------------------

def _write_provenance(cfg, logdir, app_file_name):
    from facenet_tpu import ioutils
    ioutils.write_arguments(cfg, Path(logdir) / (Path(app_file_name).stem + '.yaml'))
    ioutils.store_revision_info(logdir)


def extract_faces(app_file_name, options):
    cfg = load_config(app_file_name, options)

    if not cfg.outdir:
        cfg.outdir = f'{Path(str(cfg.dataset.path)).expanduser()}_extracted_{cfg.image.size}'

    cfg.outdir = Path(cfg.outdir).expanduser()
    cfg.logdir = cfg.outdir
    cfg.logfile = cfg.outdir / 'log.txt'
    cfg.h5file = cfg.outdir / 'statistics.h5'

    cfg.seed_key = set_seed(cfg.seed)
    _write_provenance(cfg, cfg.logdir, app_file_name)
    return cfg


def train_softmax(options, app_file_name=None):
    app_file_name = app_file_name or sys.argv[0]
    cfg = load_config(app_file_name, options)

    path = Path(str(cfg.model.path)).expanduser()
    cfg.model.path = path / subdir()

    cfg.logs = Config()
    cfg.logs.dir = cfg.model.path / 'logs'
    cfg.logs.file = cfg.model.path.stem + '.log'

    if cfg.model.checkpoint:
        cfg.model.checkpoint = Path(str(cfg.model.checkpoint)).expanduser()

    if not cfg.train.epoch.max_nrof_epochs:
        cfg.train.epoch.max_nrof_epochs = cfg.train.learning_rate.schedule[-1][0]

    if cfg.validate:
        cfg.validate.batch_size = cfg.batch_size
        cfg.validate.image.size = cfg.image.size
        cfg.validate.image.normalization = cfg.image.normalization

    cfg.seed_key = set_seed(cfg.seed)
    _write_provenance(cfg, cfg.logs.dir, app_file_name)
    return cfg


def train_detector(options, app_file_name=None):
    app_file_name = app_file_name or sys.argv[0]
    cfg = load_config(app_file_name, options)

    path = Path(str(cfg.model.path)).expanduser()
    cfg.model.path = path / subdir()

    cfg.logs = Config()
    cfg.logs.dir = cfg.model.path / 'logs'
    cfg.logs.file = cfg.model.path.stem + '.log'

    cfg.seed_key = set_seed(cfg.seed)
    _write_provenance(cfg, cfg.logs.dir, app_file_name)
    return cfg


def embeddings(app_file_name, options):
    cfg = load_config(app_file_name, options)

    if not cfg.model.path:
        cfg.model.path = default_model_path

    if cfg.suffix not in ('.h5', '.tfrecord', '.npz'):
        raise ValueError('Invalid suffix for output file, must be h5, npz or tfrecord.')

    cfg.outdir = Path(str(cfg.dataset.path) + '_' + Path(str(cfg.model.path)).stem).expanduser()
    cfg.logdir = cfg.outdir
    cfg.logfile = cfg.outdir.joinpath('log.txt')
    cfg.outfile = cfg.outdir.joinpath('embeddings').with_suffix(cfg.suffix)

    cfg.seed_key = set_seed(cfg.seed)
    _write_provenance(cfg, cfg.logdir, app_file_name)
    return cfg


def validate(app_file_name, options):
    cfg = load_config(app_file_name, options)

    if not cfg.model.path:
        cfg.model.path = default_model_path

    cfg.outdir = Path(str(cfg.dataset.path) + '_' + Path(str(cfg.model.path)).stem).expanduser()
    cfg.logdir = cfg.outdir
    cfg.logfile = cfg.outdir.joinpath('validate.txt')

    cfg.seed_key = set_seed(cfg.seed)
    _write_provenance(cfg, cfg.logdir, app_file_name)
    return cfg


def validate_on_lfw(app_file_name, options):
    """Preparer for the fixed-pairs (LFW-protocol) validation app."""
    cfg = load_config(app_file_name, options)

    if not cfg.model.path:
        cfg.model.path = default_model_path
    # lfw.get_paths/read_pairs receive these verbatim — expanduser here
    # so the shipped '~/...' defaults resolve (ADVICE r4, medium).
    cfg.dataset.path = Path(str(cfg.dataset.path)).expanduser()
    if not cfg.dataset.pairs:
        cfg.dataset.pairs = cfg.dataset.path.parent / 'pairs.txt'
    else:
        cfg.dataset.pairs = Path(str(cfg.dataset.pairs)).expanduser()

    cfg.outdir = Path(str(cfg.dataset.path) + '_'
                      + Path(str(cfg.model.path)).stem).expanduser()
    cfg.logdir = cfg.outdir
    cfg.logfile = cfg.outdir.joinpath('validate_on_lfw.txt')

    cfg.seed_key = set_seed(cfg.seed)
    _write_provenance(cfg, cfg.logdir, app_file_name)
    return cfg


def train_classifier(app_file_name, options):
    cfg = load_config(app_file_name, options)

    cfg.classifier.path = Path(str(cfg.classifier.path)).expanduser() / subdir()
    cfg.logdir = cfg.classifier.path
    cfg.logfile = cfg.logdir / 'log.txt'

    cfg.seed_key = set_seed(cfg.seed)
    _write_provenance(cfg, cfg.logdir, app_file_name)
    return cfg
