"""Model zoo: config-driven model selection.

The reference selects the embedding network through the `module:` key of the
model YAML (reference models/configs/inception_resnet_v1.yaml `module:
facenet.models.inception_resnet_v1`, loaded per-app via the config cascade).
The same contract here: `create_model_from_config` resolves the module named
in `cfg.model.module` (accepting both the reference's `facenet.models.*`
names and `facenet_tpu.models.*`) and calls its `create_model`.
"""

from __future__ import annotations

import importlib
from pathlib import Path

import yaml

from facenet_tpu.config import Config
from facenet_tpu.models import inception_resnet_v1  # noqa: F401
from facenet_tpu.models import inception_resnet_v2  # noqa: F401

config_dir = Path(__file__).parent / 'configs'


def load_model_config(name_or_path):
    """Load a model YAML (by zoo name like 'inception_resnet_v1' or path)."""
    path = Path(str(name_or_path)).expanduser()
    if not path.exists():
        path = config_dir / f'{name_or_path}.yaml'
    if not path.exists():
        raise ValueError(f'unknown model config: {name_or_path}')
    with open(path) as f:
        return Config(yaml.safe_load(f))


def resolve_module(module_name):
    """Map a reference-style module path to the facenet_tpu implementation."""
    name = str(module_name)
    # the reference's YAMLs say `facenet.models.<net>`; honor them directly
    if name.startswith('facenet.models.'):
        name = 'facenet_tpu.models.' + name[len('facenet.models.'):]
    elif '.' not in name:
        name = 'facenet_tpu.models.' + name
    return importlib.import_module(name)


def create_model_from_config(model_cfg, image_cfg=None, **kwargs):
    """Build the embedding network selected by a model config.

    `model_cfg` may be a zoo name / YAML path, or a Config/dict with the
    reference schema: {'module': ..., 'config': {...}}. Falls back to
    Inception-ResNet-v1 when no module is named.
    """
    if isinstance(model_cfg, (str, Path)):
        model_cfg = load_model_config(model_cfg)
    if model_cfg is not None and not isinstance(model_cfg, Config):
        model_cfg = Config(model_cfg)

    module_name = 'facenet_tpu.models.inception_resnet_v1'
    net_cfg = None
    if model_cfg:
        if model_cfg.module:
            module_name = str(model_cfg.module)
            net_cfg = model_cfg.config.as_dict if model_cfg.config else None
        elif model_cfg.config:
            net_cfg = model_cfg.config.as_dict
        else:
            # bare topology dict (no module/config nesting); drop run-dir
            # bookkeeping keys that ride along in cfg.model
            net_cfg = {k: v for k, v in model_cfg.as_dict.items()
                       if k not in ('path', 'checkpoint')}
            net_cfg = net_cfg or None

    module = resolve_module(module_name)
    return module.create_model(model_cfg=net_cfg, image_cfg=image_cfg,
                               **kwargs)
