"""Inception-ResNet-v1 embedding network, TPU-native (Flax/XLA).

A from-scratch JAX implementation of the architecture the reference builds in
Keras (/root/reference/facenet/models/inception_resnet_v1.py). Topology
constants match the reference exactly:

  stem: 6 convs + maxpool (ref :387-430); 5x Block35 scale .17 (ref :432-435,
  defaults :20-24); ReductionA filters [[384],[192,192,256]] (ref :14-16);
  10x Block17 scale .10; ReductionB [[256,384],[256,256],[256,256,256]]
  (ref :17-19); 5x Block8 scale .2 + final Block8 scale 1 without activation
  (ref :448-453); head AvgPool 3x3 -> Dense 512 no-bias -> BatchNorm
  (ref :459-468); inference-only L2 normalization with eps 1e-10 (ref :490-492).

BatchNorm uses center=True, scale=False (ref :56-63); every conv/dense kernel
carries L2(5e-4) weight decay (ref :65) — in JAX that is applied as an
explicit `l2_regularization(params)` loss term rather than a layer attribute.

TPU-first design decisions (not translations):
  * NHWC layout, bfloat16 activations / float32 params — convs hit the MXU in
    bf16, BN statistics accumulate in f32.
  * The whole network is a pure function of (params, batch_stats, images),
    jit-compiled once; XLA fuses BN+ReLU+residual-scale into the conv epilogs.
  * Image preprocessing (uint8 -> normalized f32) runs inside the model so the
    host->device transfer is uint8 (ops/preprocessing.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from facenet_tpu.config import Config
from facenet_tpu.ops.preprocessing import image_processing

# Reference defaults (inception_resnet_v1.py:13-43)
default_config = {
    'reduction_a': {'filters': [[384], [192, 192, 256]]},
    'reduction_b': {'filters': [[256, 384], [256, 256], [256, 256, 256]]},
    'block35': {'repeat': 5, 'scale': 0.17, 'activation': 'relu'},
    'block17': {'repeat': 10, 'scale': 0.10, 'activation': 'relu'},
    'block8_1': {'repeat': 5, 'scale': 0.2, 'activation': 'relu'},
    'block8_2': {'scale': 1.0, 'activation': None},
    'output': {'size': 512},
}

WEIGHT_DECAY = 0.0005  # L2(5e-4) on every kernel (ref :65)
BN_EPS = 1e-3          # Keras BatchNormalization default used by the reference
BN_MOMENTUM = 0.99


def check_input_config(cfg=None):
    """Fill missing model-config fields with reference defaults."""
    base = Config(default_config)
    if cfg is None:
        return base
    if not isinstance(cfg, Config):
        cfg = Config(cfg)
    base.update(cfg)
    return base


class ConvBnRelu(nn.Module):
    """Conv (no bias) -> BatchNorm(center, no scale) -> optional ReLU."""
    features: int
    kernel: Sequence[int] = (3, 3)
    strides: int = 1
    padding: str = 'SAME'
    relu: bool = True
    momentum: float = BN_MOMENTUM
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, tuple(self.kernel), strides=self.strides,
                    padding=self.padding, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.glorot_uniform(),
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.momentum, epsilon=BN_EPS,
                         use_bias=True, use_scale=False,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name='bn')(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Block35(nn.Module):
    """Inception-ResNet-A block (ref inception_resnet_v1.py:83-150)."""
    scale: float = 0.17
    activation: Any = 'relu'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        t0 = ConvBnRelu(32, (1, 1), dtype=d, name='Branch_0.Conv2d_1x1')(x, train)
        t1 = ConvBnRelu(32, (1, 1), dtype=d, name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = ConvBnRelu(32, (3, 3), dtype=d, name='Branch_1.Conv2d_0b_3x3')(t1, train)
        t2 = ConvBnRelu(32, (1, 1), dtype=d, name='Branch_2.Conv2d_0a_1x1')(x, train)
        t2 = ConvBnRelu(32, (3, 3), dtype=d, name='Branch_2.Conv2d_0b_3x3')(t2, train)
        t2 = ConvBnRelu(32, (3, 3), dtype=d, name='Branch_2.Conv2d_0c_3x3')(t2, train)

        mixed = jnp.concatenate([t0, t1, t2], axis=3)
        up = nn.Conv(x.shape[3], (1, 1), use_bias=True, dtype=d,
                     param_dtype=jnp.float32,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name='Conv2d_1x1')(mixed)
        x = x + jnp.asarray(self.scale, d) * up
        if self.activation:
            x = nn.relu(x)
        return x


class Block17(nn.Module):
    """Inception-ResNet-B block (ref inception_resnet_v1.py:153-204)."""
    scale: float = 0.10
    activation: Any = 'relu'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        t0 = ConvBnRelu(128, (1, 1), dtype=d, name='Branch_0.Conv2d_1x1')(x, train)
        t1 = ConvBnRelu(128, (1, 1), dtype=d, name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = ConvBnRelu(128, (1, 7), dtype=d, name='Branch_1.Conv2d_0b_1x7')(t1, train)
        t1 = ConvBnRelu(128, (7, 1), dtype=d, name='Branch_1.Conv2d_0c_7x1')(t1, train)

        mixed = jnp.concatenate([t0, t1], axis=3)
        up = nn.Conv(x.shape[3], (1, 1), use_bias=True, dtype=d,
                     param_dtype=jnp.float32,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name='Conv2d_1x1')(mixed)
        x = x + jnp.asarray(self.scale, d) * up
        if self.activation:
            x = nn.relu(x)
        return x


class Block8(nn.Module):
    """Inception-ResNet-C block (ref inception_resnet_v1.py:208-259)."""
    scale: float = 0.2
    activation: Any = 'relu'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        t0 = ConvBnRelu(192, (1, 1), dtype=d, name='Branch_0.Conv2d_1x1')(x, train)
        t1 = ConvBnRelu(192, (1, 1), dtype=d, name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = ConvBnRelu(192, (1, 3), dtype=d, name='Branch_1.Conv2d_0b_1x3')(t1, train)
        t1 = ConvBnRelu(192, (3, 1), dtype=d, name='Branch_1.Conv2d_0c_3x1')(t1, train)

        mixed = jnp.concatenate([t0, t1], axis=3)
        up = nn.Conv(x.shape[3], (1, 1), use_bias=True, dtype=d,
                     param_dtype=jnp.float32,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name='Conv2d_1x1')(mixed)
        x = x + jnp.asarray(self.scale, d) * up
        if self.activation:
            x = nn.relu(x)
        return x


class ReductionA(nn.Module):
    """17x17 -> 8x8 grid reduction (ref inception_resnet_v1.py:262-307)."""
    filters: Sequence[Sequence[int]] = ((384,), (192, 192, 256))
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        f0, f1 = self.filters
        t0 = ConvBnRelu(f0[0], (3, 3), strides=2, padding='VALID', dtype=d,
                        name='Branch_0.Conv2d_1a_3x3')(x, train)
        t1 = ConvBnRelu(f1[0], (1, 1), dtype=d,
                        name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = ConvBnRelu(f1[1], (3, 3), dtype=d,
                        name='Branch_1.Conv2d_0b_3x3')(t1, train)
        t1 = ConvBnRelu(f1[2], (3, 3), strides=2, padding='VALID', dtype=d,
                        name='Branch_1.Conv2d_1a_3x3')(t1, train)
        tp = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        return jnp.concatenate([t0, t1, tp], axis=3)


class ReductionB(nn.Module):
    """8x8 -> 3x3 grid reduction (ref inception_resnet_v1.py:310-377)."""
    filters: Sequence[Sequence[int]] = ((256, 384), (256, 256), (256, 256, 256))
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        f0, f1, f2 = self.filters
        t0 = ConvBnRelu(f0[0], (1, 1), dtype=d,
                        name='Branch_0.Conv2d_0a_1x1')(x, train)
        t0 = ConvBnRelu(f0[1], (3, 3), strides=2, padding='VALID', dtype=d,
                        name='Branch_0.Conv2d_1a_3x3')(t0, train)
        t1 = ConvBnRelu(f1[0], (1, 1), dtype=d,
                        name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = ConvBnRelu(f1[1], (3, 3), strides=2, padding='VALID', dtype=d,
                        name='Branch_1.Conv2d_1a_3x3')(t1, train)
        t2 = ConvBnRelu(f2[0], (1, 1), dtype=d,
                        name='Branch_2.Conv2d_0a_1x1')(x, train)
        t2 = ConvBnRelu(f2[1], (3, 3), dtype=d,
                        name='Branch_2.Conv2d_0b_3x3')(t2, train)
        t2 = ConvBnRelu(f2[2], (3, 3), strides=2, padding='VALID', dtype=d,
                        name='Branch_2.Conv2d_1a_3x3')(t2, train)
        tp = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        return jnp.concatenate([t0, t1, t2, tp], axis=3)


class InceptionResnetV1(nn.Module):
    """The full embedding network: uint8 images in, 512-d embeddings out.

    Behavior contract (ref inception_resnet_v1.py:380-494 + facenet.py:57-86):
      * preprocessing (cast/resize/normalize) happens inside the model;
      * the final BatchNorm output is the *unnormalized* embedding ("Bottleneck");
      * at inference (train=False) the output is L2-normalized with eps 1e-10.
    """
    config: Any = None
    image_size: int = 160
    normalization: int = 0
    dtype: Any = jnp.bfloat16
    preprocess: bool = True

    def setup(self):
        cfg = check_input_config(self.config)
        self.cfg = cfg
        d = self.dtype

        self.stem = [
            ConvBnRelu(32, (3, 3), strides=2, padding='VALID', dtype=d, name='Conv2d_1a_3x3'),
            ConvBnRelu(32, (3, 3), strides=1, padding='VALID', dtype=d, name='Conv2d_2a_3x3'),
            ConvBnRelu(64, (3, 3), strides=1, padding='VALID', dtype=d, name='Conv2d_2b_3x3'),
            # MaxPool_3a_3x3 applied in __call__
            ConvBnRelu(80, (1, 1), strides=1, padding='VALID', dtype=d, name='Conv2d_3b_1x1'),
            ConvBnRelu(192, (3, 3), strides=1, padding='VALID', dtype=d, name='Conv2d_4a_3x3'),
            ConvBnRelu(256, (3, 3), strides=2, padding='VALID', dtype=d, name='Conv2d_4b_3x3'),
        ]

        self.blocks35 = [
            Block35(scale=cfg.block35.scale, activation=cfg.block35.activation,
                    dtype=d, name=f'Repeat.block35_{i + 1}')
            for i in range(cfg.block35.repeat)
        ]
        self.reduction_a = ReductionA(
            filters=tuple(tuple(f) for f in cfg.reduction_a.filters),
            dtype=d, name='Mixed_6a')
        self.blocks17 = [
            Block17(scale=cfg.block17.scale, activation=cfg.block17.activation,
                    dtype=d, name=f'Repeat_1.block17_{i + 1}')
            for i in range(cfg.block17.repeat)
        ]
        self.reduction_b = ReductionB(
            filters=tuple(tuple(f) for f in cfg.reduction_b.filters),
            dtype=d, name='Mixed_7a')
        self.blocks8 = [
            Block8(scale=cfg.block8_1.scale, activation=cfg.block8_1.activation,
                   dtype=d, name=f'Repeat_2.block8_{i + 1}')
            for i in range(cfg.block8_1.repeat)
        ]
        self.block8_final = Block8(
            scale=cfg.block8_2.scale, activation=cfg.block8_2.activation,
            dtype=d, name='Block8')

        self.bottleneck = nn.Dense(
            cfg.output.size, use_bias=False, dtype=d, param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(), name='Bottleneck')
        self.bottleneck_bn = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, use_bias=True, use_scale=False,
            dtype=d, param_dtype=jnp.float32, name='Bottleneck.bn')

    def __call__(self, images, train: bool = False, normalize: bool = None):
        """Forward: [B,H,W,3] uint8 (or preprocessed float) -> [B,512] float32.

        `normalize` defaults to ``not train`` (the reference normalizes only at
        inference, inception_resnet_v1.py:484-494); pass False explicitly to
        read the raw "Bottleneck" embedding (the reference's unnormalized-output
        escape hatch, facenet/__init__.py:55).
        """
        if self.preprocess:
            x = image_processing(images, self.image_size, self.normalization,
                                 dtype=self.dtype)
        else:
            x = images.astype(self.dtype)

        for i, layer in enumerate(self.stem):
            x = layer(x, train)
            if i == 2:  # MaxPool_3a_3x3 after Conv2d_2b (ref :409)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')

        for block in self.blocks35:
            x = block(x, train)
        x = self.reduction_a(x, train)
        for block in self.blocks17:
            x = block(x, train)
        x = self.reduction_b(x, train)
        for block in self.blocks8:
            x = block(x, train)
        x = self.block8_final(x, train)

        # head: AvgPool 3x3 valid -> flatten -> dense -> BN (ref :459-468)
        x = nn.avg_pool(x, (3, 3), strides=(3, 3), padding='VALID')
        x = x.reshape((x.shape[0], -1))
        x = self.bottleneck(x)
        x = self.bottleneck_bn(x, use_running_average=not train)

        x = x.astype(jnp.float32)
        if normalize is None:
            normalize = not train
        if normalize:
            # inference-only L2 normalization (ref :490-492)
            norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x), axis=1,
                                                keepdims=True), 1e-10))
            x = x / norm
        return x


def l2_regularization(params, weight_decay=WEIGHT_DECAY):
    """Sum of L2 penalties over every conv/dense kernel.

    The reference attaches tf.keras.regularizers.L2(5e-4) to each layer
    (inception_resnet_v1.py:65); Keras L2 adds ``l2 * sum(w**2)`` — same here.
    Bias/BN params are excluded, matching kernel-only regularization.
    """
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0.0
    for path, leaf in leaves:
        names = [getattr(p, 'key', getattr(p, 'name', '')) for p in path]
        if any(str(n) == 'kernel' for n in names):
            total += jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return weight_decay * total


def create_model(model_cfg=None, image_cfg=None, dtype=jnp.bfloat16):
    """Build an InceptionResnetV1 from facenet-style config objects."""
    image_cfg = image_cfg or Config({'size': 160, 'normalization': 0})
    from facenet_tpu.config import value_or
    return InceptionResnetV1(
        config=model_cfg,
        image_size=int(image_cfg.size or 160),
        # normalization 0 is a legitimate mode — `or` would misread it
        normalization=int(value_or(image_cfg.normalization, 0)),
        dtype=dtype,
    )
