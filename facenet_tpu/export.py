"""Model export and deployment bundles.

The TPU-native counterpart of the reference's freeze/export machinery
(SURVEY.md §2 #21, reference tfutils.py:56-129 frozen-graph export and
tfutils.py:132-264 per-layer h5 dump with BN folding). A frozen TF graph has
no JAX equivalent; the deployment artifact here is a *model bundle*
directory:

    <path>/
      model.yaml        — architecture config + image preprocessing contract
      params.msgpack    — flax serialized {params, batch_stats}

plus `export_h5` which dumps every intermediate activation for a fixed input
batch together with all weights — the layer-wise numeric-parity harness the
reference's export_h5 provides (its strongest testing pattern, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import numpy as np
import yaml
from flax import serialization

from facenet_tpu import h5utils
from facenet_tpu.config import Config
from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

MODEL_FILE = 'model.yaml'
PARAMS_FILE = 'params.msgpack'
COMPILED_FILE = 'model.stablehlo'


@dataclasses.dataclass
class ModelBundle:
    model: Any
    variables: Any
    meta: dict


def save_model(path, model, variables, extra_meta=None):
    """Write a deployable model bundle.

    :param model: zoo model instance, IRv1 or IRv2 (architecture source of
        truth; its class name is recorded so load_model rebuilds the same
        architecture)
    :param variables: {'params': ..., 'batch_stats': ...}
    """
    path = Path(str(path)).expanduser()
    path.mkdir(parents=True, exist_ok=True)

    cfg = model.config
    if isinstance(cfg, Config):
        cfg = cfg.as_dict
    elif cfg is not None and not isinstance(cfg, dict):
        cfg = dict(cfg)

    meta = {
        'model_class': type(model).__name__,
        'config': cfg,
        'image_size': int(model.image_size),
        'normalization': int(model.normalization),
        'version': 1,
    }
    if extra_meta:
        meta.update(extra_meta)

    with (path / MODEL_FILE).open('wt') as f:
        yaml.safe_dump(meta, f)

    variables = jax.device_get(variables)
    with (path / PARAMS_FILE).open('wb') as f:
        f.write(serialization.to_bytes(variables))

    return path


def load_model(path):
    """Load a model bundle saved by `save_model`."""
    path = Path(str(path)).expanduser()

    with (path / MODEL_FILE).open('rt') as f:
        meta = yaml.safe_load(f)

    if meta.get('model_class') == 'InceptionResnetV2':
        from facenet_tpu.models.inception_resnet_v2 import InceptionResnetV2
        model_cls = InceptionResnetV2
    else:
        model_cls = InceptionResnetV1

    model = model_cls(config=meta.get('config'),
                      image_size=int(meta.get('image_size', 160)),
                      normalization=int(meta.get('normalization', 0)))

    # build the variable structure, then overwrite with stored bytes
    dummy = np.zeros((1, model.image_size, model.image_size, 3), np.uint8)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)

    with (path / PARAMS_FILE).open('rb') as f:
        variables = serialization.from_bytes(template, f.read())

    return ModelBundle(model=model, variables=variables, meta=meta)


def save_compiled(path, model, variables, platforms=('cpu', 'tpu'),
                  quantize=None, calib_images=None):
    """Serialize the inference forward as a self-contained StableHLO module.

    The TPU-native analogue of the reference's frozen .pb with
    variables-to-constants conversion (reference tfutils.py:56-129,
    optimize_for_inference :121-123): the weights are baked into the module
    as constants and the batch dimension is symbolic, so the artifact runs
    ANY batch size on any listed platform with nothing but jax installed —
    no facenet_tpu, no model class, no params file (see `load_compiled`).

    With quantize='int8' (+ a representative `calib_images` uint8 batch)
    the serialized graph is the int8 serving path (models/quantize.py):
    int8 weight constants, quantize/dequantize affines inline — the
    artifact stays self-contained and ~4x smaller in weight bytes.

    Returns the artifact path (<path>/model.stablehlo).
    """
    from jax import export as jax_export

    path = Path(str(path)).expanduser()
    path.mkdir(parents=True, exist_ok=True)

    variables = jax.device_get(variables)

    # Inception-ResNet-v1 serializes the FUSED serving graph (BN folded,
    # branch heads merged — models/irv1_fast.py, equivalence-tested), so
    # the deployed artifact carries the fast computation; other models
    # serialize their plain apply. uint8 in, L2-normalized f32 out — the
    # serving contract (reference facenet/__init__.py:17-34).
    forward = None
    fast_mod = None
    if type(model).__name__ == 'InceptionResnetV1':
        from facenet_tpu.models import irv1_fast as fast_mod
    elif type(model).__name__ == 'InceptionResnetV2':
        from facenet_tpu.models import irv2_fast as fast_mod
    if fast_mod is not None:
        try:
            fparams, fcfg = fast_mod.build_fast_params(variables,
                                                       model.config)
            if quantize:
                if quantize != 'int8':
                    raise ValueError(f'unknown quantize mode {quantize!r}')
                if calib_images is None:
                    raise ValueError('quantize="int8" needs calib_images')
                from facenet_tpu.models.quantize import quantize_fast_params
                fparams = quantize_fast_params(
                    fparams, fcfg, calib_images, model.image_size,
                    model.normalization, forward=fast_mod.fast_forward)

            def forward(images):
                return fast_mod.fast_forward(fparams, fcfg, images,
                                             model.image_size,
                                             model.normalization)
        except Exception as exc:
            if quantize:
                raise
            # fall back to the unfused apply, but LOUDLY — a silent
            # fallback would ship a slower artifact (no BN folding /
            # branch fusion) while masking the underlying bug
            from facenet_tpu.logging import logger
            logger.warning(
                f'fused serving path unavailable for export ({exc!r}); '
                'serializing the plain model.apply graph instead')
            forward = None
    elif quantize:
        raise ValueError(f'quantize={quantize!r} needs a fused fast path; '
                         f'{type(model).__name__} has none')
    if forward is None:
        def forward(images):
            return model.apply(variables, images, train=False)

    batch = jax_export.symbolic_shape('b')[0]
    spec = jax.ShapeDtypeStruct(
        (batch, model.image_size, model.image_size, 3), np.uint8)
    exported = jax_export.export(jax.jit(forward),
                                 platforms=tuple(platforms))(spec)

    artifact = path / COMPILED_FILE
    artifact.write_bytes(exported.serialize())
    return artifact


class CompiledModel:
    """A deserialized standalone inference artifact.

    Wraps a StableHLO module produced by `save_compiled`; callable with a
    uint8 [B, H, W, 3] batch, returns L2-normalized f32 [B, D] embeddings.
    Requires only jax — deliberately touches no facenet_tpu model code.
    """

    def __init__(self, exported):
        self._exported = exported

    @classmethod
    def load(cls, path):
        from jax import export as jax_export

        path = Path(str(path)).expanduser()
        if path.is_dir():
            path = path / COMPILED_FILE
        return cls(jax_export.deserialize(path.read_bytes()))

    def __call__(self, images):
        return self._exported.call(np.asarray(images, dtype=np.uint8))

    @property
    def platforms(self):
        return self._exported.platforms

    def mlir_module(self):
        """StableHLO text of the module (for op dumps / inspection)."""
        return self._exported.mlir_module()

    def op_histogram(self):
        """Occurrence count per StableHLO op — the analogue of the
        reference's frozen-graph op listing (ref model_info.py:63-77)."""
        import re
        ops = re.findall(r'\b(?:stablehlo|func|call)\.(\w+)',
                         self.mlir_module())
        hist = {}
        for op in ops:
            hist[op] = hist.get(op, 0) + 1
        return dict(sorted(hist.items(), key=lambda kv: -kv[1]))


def load_compiled(path):
    """Load a standalone compiled artifact saved by `save_compiled`."""
    return CompiledModel.load(path)


def export_h5(h5file, model, variables, images, batch_size=None):
    """Dump per-layer activations + all weights to h5 for parity testing.

    Mirrors the role of reference tfutils.export_h5 (tfutils.py:132-264):
    activations of every submodule for a fixed input batch, plus every
    parameter array. BN folding is unnecessary — JAX inference BN is already
    a pure (scale, offset) affine read from batch_stats, which are exported
    as-is.
    """
    h5file = Path(str(h5file)).expanduser()

    images = np.asarray(images)
    _, intermediates = model.apply(
        variables, images, train=False,
        capture_intermediates=True, mutable=['intermediates'])

    def walk(tree, prefix, sink):
        if isinstance(tree, (dict,)) or hasattr(tree, 'items'):
            for key, item in tree.items():
                walk(item, f'{prefix}/{key}' if prefix else str(key), sink)
        elif isinstance(tree, (tuple, list)):
            for i, item in enumerate(tree):
                walk(item, f'{prefix}/{i}', sink)
        else:
            sink(prefix, np.asarray(tree))

    def write(name, arr):
        if str(arr.dtype) == 'bfloat16':   # h5py cannot store ml_dtypes bf16
            arr = arr.astype(np.float32)
        h5utils.write(h5file, name, arr)

    walk(jax.device_get(intermediates['intermediates']), 'activations', write)
    walk(jax.device_get(variables['params']), 'weights', write)
    walk(jax.device_get(variables['batch_stats']), 'batch_stats', write)
    h5utils.write(h5file, 'input', images)

    return h5file
