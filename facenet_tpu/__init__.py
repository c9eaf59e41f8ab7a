"""facenet_tpu — a TPU-native face-recognition framework (JAX/XLA/Pallas).

From-scratch rebuild of the sMedX/FaceNet capability surface
(see /root/repo/SURVEY.md): detection+alignment cascade, Inception-ResNet
embedding networks, training (softmax / center / triplet losses) under pjit
data parallelism, on-device pairwise-distance validation, pair classifiers,
and the same app-per-task CLI with cascaded-YAML configs.

The `FaceNet` class here is the inference runtime — the TPU-native equivalent
of the reference's frozen-graph serving class
(/root/reference/facenet/__init__.py:37-84): load exported params, feed uint8
images, get L2-normalized float32 [B, 512] embeddings from a single jitted
XLA computation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable

import numpy as np

__version__ = '0.1.0'

# node-name contract preserved from the reference (facenet/__init__.py:17-34)
nodes = {
    'input': {'name': 'input', 'type': 'uint8'},
    'output': {'name': 'embeddings', 'type': 'float32'},
}

config_nodes = {
    'image_size': {'name': 'image_size', 'type': 'uint8'},
}


class FaceNet:
    """Serving-time embedding extractor.

    Usage (mirrors reference facenet/__init__.py docstring):

        from facenet_tpu import FaceNet
        facenet = FaceNet(config)            # config.path -> exported model dir
        emb = facenet.image_to_embedding(np.zeros([160, 160, 3], np.uint8))

    The forward pass is jit-compiled once per batch shape; inputs are uint8
    NHWC batches, outputs are L2-normalized (or raw-bottleneck when
    ``config.normalize`` is falsy) float32 embeddings.
    """

    def __init__(self, config):
        import jax
        from facenet_tpu import export
        from facenet_tpu.config import Config

        if not isinstance(config, Config) and isinstance(config, (str, Path)):
            config = Config({'path': str(config), 'normalize': True})

        self.config = config
        if not config.path:
            raise ValueError(
                'FaceNet needs config.path pointing at an exported model '
                'directory (got an empty/missing path — pass the MODEL '
                "config, e.g. FaceNet(cfg.model), not the app config)")
        path = Path(str(config.path)).expanduser()

        bundle = export.load_model(path)
        self.model = bundle.model
        self.variables = bundle.variables
        # both spellings are honored: the app configs say
        # `model.normalization` (embeddings.yaml), the class API `normalize`
        if config.exists('normalize'):
            self.normalize = bool(config.normalize)
        elif config.exists('normalization'):
            self.normalize = bool(config.normalization)
        else:
            self.normalize = True

        model = self.model
        normalize = self.normalize

        # Serve both model families through their fused fast paths (BN
        # folded into conv biases, branch-head convs fused —
        # models/irv1_fast.py / irv2_fast.py; equivalence-tested); custom
        # zoo models fall back to the generic Flax apply.
        self._forward = None
        fast_cls = None
        if type(model).__name__ == 'InceptionResnetV1':
            from facenet_tpu.models.irv1_fast import FastEmbedder as fast_cls
        elif type(model).__name__ == 'InceptionResnetV2':
            from facenet_tpu.models.irv2_fast import \
                FastEmbedderV2 as fast_cls
        # `quantize: null` / `false` in YAML must mean "disabled", not the
        # truthy strings 'None'/'False' (CLAUDE.md: optional config values)
        quantize = config.quantize if config.exists('quantize') else None
        quantize = str(quantize) if quantize else None
        if fast_cls is not None:
            try:
                kwargs = {}
                if quantize:
                    # int8 serving (models/quantize.py): calibration
                    # images come from `config.calib` (array, or a
                    # directory of images — up to 64 are loaded)
                    kwargs = {'quantize': quantize,
                              'calib_images': self._calib_batch(
                                  config, int(model.image_size))}
                self._forward = fast_cls(
                    self.variables, config=model.config,
                    image_size=model.image_size,
                    normalization=model.normalization,
                    normalize=normalize, **kwargs)
            except Exception as exc:
                if quantize:
                    raise
                from facenet_tpu.logging import logger
                logger.warning(f'fast serving path unavailable ({exc}); '
                               'falling back to model.apply')
        elif quantize:
            raise ValueError(
                f'quantize={quantize!r} needs a fused fast path; '
                f'{type(model).__name__} serves via generic model.apply')
        if self._forward is None:
            self._forward = jax.jit(
                lambda images: model.apply(self.variables, images,
                                           train=False, normalize=normalize))

    @staticmethod
    def _calib_batch(config, image_size, limit=64):
        """Representative uint8 batch for int8 calibration.

        `config.calib` may be an array-like batch (already at the model's
        input size) or a directory of images, each resized to
        `image_size` x `image_size` on load so mixed-size photos stack.
        """
        calib = config.calib if config.exists('calib') else None
        if calib is None:
            raise ValueError("quantize='int8' needs config.calib: a "
                             'uint8 image batch or a directory of '
                             'representative images')
        if isinstance(calib, (str, Path)):
            from PIL import Image
            paths = sorted(p for p in Path(calib).expanduser().rglob('*')
                           if p.suffix.lower() in
                           ('.png', '.jpg', '.jpeg', '.bmp'))
            if not paths:
                raise ValueError(f'no calibration images under {calib}')
            # spread the sample across the directory (≈across classes)
            step = max(len(paths) // limit, 1)
            paths = paths[::step][:limit]
            size = (int(image_size), int(image_size))
            return np.stack([
                np.asarray(Image.open(p).convert('RGB').resize(
                    size, Image.BILINEAR))
                for p in paths])
        return np.asarray(calib, dtype=np.uint8)

    @property
    def embedding_size(self):
        return int(self.model.cfg.output.size) if hasattr(self.model, 'cfg') \
            else int(check_output_size(self.model))

    def dispatch(self, images):
        """Async forward: enqueue the batch and return the UN-FETCHED
        device array. facenet.evaluate_embeddings uses this to overlap
        batch n+1's host load + transfer with batch n's device compute;
        call np.asarray (or .block_until_ready) on the result to fetch.

        Device arrays pass through untouched so sharded inputs (see
        facenet.sharded_forward) keep their placement — coercing them to
        numpy here would silently undo the data-parallel split.
        """
        import jax
        if not isinstance(images, jax.Array):
            images = np.asarray(images, dtype=np.uint8)
        return self._forward(images)

    def evaluate(self, images):
        """Run forward pass to calculate embeddings for a uint8 NHWC batch."""
        return np.asarray(self.dispatch(images))

    def image_to_embedding(self, image_arrays: Iterable[np.ndarray]) -> np.ndarray:
        image_arrays = np.asarray(image_arrays)
        if image_arrays.ndim == 3:
            image_arrays = np.expand_dims(image_arrays, 0)
        return self.evaluate(image_arrays)


def check_output_size(model):
    from facenet_tpu.models.inception_resnet_v1 import check_input_config
    return check_input_config(model.config).output.size


def __getattr__(name):
    # lazy: pipeline imports FaceNet from this module at construction
    if name == 'FacePipeline':
        from facenet_tpu.pipeline import FacePipeline
        return FacePipeline
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
