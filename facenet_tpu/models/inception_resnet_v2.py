"""Inception-ResNet-v2 embedding network, TPU-native (Flax/XLA).

From-scratch JAX implementation of the second model family the reference
ships (/root/reference/facenet/models/inception_resnet_v2.py, a TF1/tf_slim
functional graph). Topology constants match the reference:

  stem (ref :122-142): conv32 s2 V, conv32 V, conv64 S, maxpool3 s2 V,
    conv80 1x1 V, conv192 3x3 V, maxpool3 s2 V;
  Mixed_5a 4-branch inception from config (branch [[96],[48,64],[64,96,96],
    [64]], ref :145-163 + configs/inception_resnet_v2.yaml);
  repeat[0]=10 x Block35 (filters 32 / 32-32 / 32-48-64, scale .17, ref
    :40-57, :167); Mixed_6a ([[384],[256,256,384]] + maxpool, ref :170-182);
  repeat[1]=20 x Block17 (192 / 128-160-192, scale .10, ref :61-75, :186);
  Mixed_7a ([[256,384],[256,288],[256,288,320]] + maxpool, ref :188-205);
  repeat[2]=9 x Block8 (192 / 192-224-256, scale .2, ref :79-93, :209) +
  final Block8 without activation (ref :210); Conv2d_7b 1536 1x1 (ref :212);
  global avg-pool, dropout keep .8, Bottleneck FC to embedding_size + BN
  (ref :215-225; slim's arg_scope attaches batch_norm to the FC too).

BN uses decay .995 / eps .001 (ref :235-244); every conv/dense kernel
carries L2 weight decay from the config (ref :248). Same TPU-first stance as
the v1 module: NHWC, bf16 activations / f32 params, preprocessing in-model.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from facenet_tpu.config import Config
from facenet_tpu.models.inception_resnet_v1 import BN_EPS, ConvBnRelu
from facenet_tpu.ops.preprocessing import image_processing

BN_MOMENTUM_V2 = 0.995    # slim batch_norm decay (ref :237)

# reference models/configs/inception_resnet_v2.yaml
default_config = {
    'mixed_5a': {'branch': [[96], [48, 64], [64, 96, 96], [64]]},
    'mixed_6a': {'branch': [[384], [256, 256, 384]]},
    'mixed_7a': {'branch': [[256, 384], [256, 288], [256, 288, 320]]},
    'repeat': [10, 20, 9],
    'embedding_size': 512,
    'keep_probability': 0.8,
    'weight_decay': 0.0005,
}


def check_input_config(cfg=None):
    base = Config(default_config)
    if cfg is None:
        return base
    if not isinstance(cfg, Config):
        cfg = Config(cfg)
    base.update(cfg)
    return base


def _cbr(features, kernel=(1, 1), strides=1, padding='SAME', dtype=jnp.bfloat16,
         name=None, relu=True):
    return ConvBnRelu(features, kernel, strides=strides, padding=padding,
                      relu=relu, momentum=BN_MOMENTUM_V2, dtype=dtype,
                      name=name)


class Block35V2(nn.Module):
    """35x35 resnet block (ref inception_resnet_v2.py:40-57)."""
    scale: float = 0.17
    activation: Any = 'relu'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        t0 = _cbr(32, (1, 1), dtype=d, name='Branch_0.Conv2d_1x1')(x, train)
        t1 = _cbr(32, (1, 1), dtype=d, name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = _cbr(32, (3, 3), dtype=d, name='Branch_1.Conv2d_0b_3x3')(t1, train)
        t2 = _cbr(32, (1, 1), dtype=d, name='Branch_2.Conv2d_0a_1x1')(x, train)
        t2 = _cbr(48, (3, 3), dtype=d, name='Branch_2.Conv2d_0b_3x3')(t2, train)
        t2 = _cbr(64, (3, 3), dtype=d, name='Branch_2.Conv2d_0c_3x3')(t2, train)

        mixed = jnp.concatenate([t0, t1, t2], axis=3)
        up = nn.Conv(x.shape[3], (1, 1), use_bias=True, dtype=d,
                     param_dtype=jnp.float32,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name='Conv2d_1x1')(mixed)
        x = x + jnp.asarray(self.scale, d) * up
        if self.activation:
            x = nn.relu(x)
        return x


class Block17V2(nn.Module):
    """17x17 resnet block (ref inception_resnet_v2.py:61-75)."""
    scale: float = 0.10
    activation: Any = 'relu'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        t0 = _cbr(192, (1, 1), dtype=d, name='Branch_0.Conv2d_1x1')(x, train)
        t1 = _cbr(128, (1, 1), dtype=d, name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = _cbr(160, (1, 7), dtype=d, name='Branch_1.Conv2d_0b_1x7')(t1, train)
        t1 = _cbr(192, (7, 1), dtype=d, name='Branch_1.Conv2d_0c_7x1')(t1, train)

        mixed = jnp.concatenate([t0, t1], axis=3)
        up = nn.Conv(x.shape[3], (1, 1), use_bias=True, dtype=d,
                     param_dtype=jnp.float32,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name='Conv2d_1x1')(mixed)
        x = x + jnp.asarray(self.scale, d) * up
        if self.activation:
            x = nn.relu(x)
        return x


class Block8V2(nn.Module):
    """8x8 resnet block (ref inception_resnet_v2.py:79-93)."""
    scale: float = 0.2
    activation: Any = 'relu'
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        t0 = _cbr(192, (1, 1), dtype=d, name='Branch_0.Conv2d_1x1')(x, train)
        t1 = _cbr(192, (1, 1), dtype=d, name='Branch_1.Conv2d_0a_1x1')(x, train)
        t1 = _cbr(224, (1, 3), dtype=d, name='Branch_1.Conv2d_0b_1x3')(t1, train)
        t1 = _cbr(256, (3, 1), dtype=d, name='Branch_1.Conv2d_0c_3x1')(t1, train)

        mixed = jnp.concatenate([t0, t1], axis=3)
        up = nn.Conv(x.shape[3], (1, 1), use_bias=True, dtype=d,
                     param_dtype=jnp.float32,
                     kernel_init=nn.initializers.glorot_uniform(),
                     name='Conv2d_1x1')(mixed)
        x = x + jnp.asarray(self.scale, d) * up
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionResnetV2(nn.Module):
    """Inception-ResNet-v2: uint8 images in, embedding_size-d embeddings out."""
    config: Any = None
    image_size: int = 160
    normalization: int = 0
    dtype: Any = jnp.bfloat16
    preprocess: bool = True

    def setup(self):
        cfg = check_input_config(self.config)
        self.cfg = cfg
        d = self.dtype

        self.stem_a = [
            _cbr(32, (3, 3), strides=2, padding='VALID', dtype=d,
                 name='Conv2d_1a_3x3'),
            _cbr(32, (3, 3), padding='VALID', dtype=d, name='Conv2d_2a_3x3'),
            _cbr(64, (3, 3), padding='SAME', dtype=d, name='Conv2d_2b_3x3'),
        ]
        self.stem_b = [
            _cbr(80, (1, 1), padding='VALID', dtype=d, name='Conv2d_3b_1x1'),
            _cbr(192, (3, 3), padding='VALID', dtype=d, name='Conv2d_4a_3x3'),
        ]

        b = [list(x) for x in cfg.mixed_5a.branch]
        self.m5a_b0 = _cbr(b[0][0], (1, 1), dtype=d, name='Mixed_5a.Branch_0.Conv2d_1x1')
        self.m5a_b1a = _cbr(b[1][0], (1, 1), dtype=d, name='Mixed_5a.Branch_1.Conv2d_0a_1x1')
        self.m5a_b1b = _cbr(b[1][1], (5, 5), dtype=d, name='Mixed_5a.Branch_1.Conv2d_0b_5x5')
        self.m5a_b2a = _cbr(b[2][0], (1, 1), dtype=d, name='Mixed_5a.Branch_2.Conv2d_0a_1x1')
        self.m5a_b2b = _cbr(b[2][1], (3, 3), dtype=d, name='Mixed_5a.Branch_2.Conv2d_0b_3x3')
        self.m5a_b2c = _cbr(b[2][2], (3, 3), dtype=d, name='Mixed_5a.Branch_2.Conv2d_0c_3x3')
        self.m5a_b3 = _cbr(b[3][0], (1, 1), dtype=d, name='Mixed_5a.Branch_3.Conv2d_0b_1x1')

        repeat = list(cfg.repeat)
        self.blocks35 = [Block35V2(dtype=d, name=f'Repeat.block35_{i + 1}')
                         for i in range(int(repeat[0]))]

        b = [list(x) for x in cfg.mixed_6a.branch]
        self.m6a_b0 = _cbr(b[0][0], (3, 3), strides=2, padding='VALID', dtype=d,
                           name='Mixed_6a.Branch_0.Conv2d_1a_3x3')
        self.m6a_b1a = _cbr(b[1][0], (1, 1), dtype=d, name='Mixed_6a.Branch_1.Conv2d_0a_1x1')
        self.m6a_b1b = _cbr(b[1][1], (3, 3), dtype=d, name='Mixed_6a.Branch_1.Conv2d_0b_3x3')
        self.m6a_b1c = _cbr(b[1][2], (3, 3), strides=2, padding='VALID', dtype=d,
                            name='Mixed_6a.Branch_1.Conv2d_1a_3x3')

        self.blocks17 = [Block17V2(dtype=d, name=f'Repeat_1.block17_{i + 1}')
                         for i in range(int(repeat[1]))]

        b = [list(x) for x in cfg.mixed_7a.branch]
        self.m7a_b0a = _cbr(b[0][0], (1, 1), dtype=d, name='Mixed_7a.Branch_0.Conv2d_0a_1x1')
        self.m7a_b0b = _cbr(b[0][1], (3, 3), strides=2, padding='VALID', dtype=d,
                            name='Mixed_7a.Branch_0.Conv2d_1a_3x3')
        self.m7a_b1a = _cbr(b[1][0], (1, 1), dtype=d, name='Mixed_7a.Branch_1.Conv2d_0a_1x1')
        self.m7a_b1b = _cbr(b[1][1], (3, 3), strides=2, padding='VALID', dtype=d,
                            name='Mixed_7a.Branch_1.Conv2d_1a_3x3')
        self.m7a_b2a = _cbr(b[2][0], (1, 1), dtype=d, name='Mixed_7a.Branch_2.Conv2d_0a_1x1')
        self.m7a_b2b = _cbr(b[2][1], (3, 3), dtype=d, name='Mixed_7a.Branch_2.Conv2d_0b_3x3')
        self.m7a_b2c = _cbr(b[2][2], (3, 3), strides=2, padding='VALID', dtype=d,
                            name='Mixed_7a.Branch_2.Conv2d_1a_3x3')

        self.blocks8 = [Block8V2(dtype=d, name=f'Repeat_2.block8_{i + 1}')
                        for i in range(int(repeat[2]))]
        self.block8_final = Block8V2(scale=1.0, activation=None, dtype=d,
                                     name='Block8')

        self.conv_7b = _cbr(1536, (1, 1), dtype=d, name='Conv2d_7b_1x1')

        self.dropout = nn.Dropout(
            rate=1.0 - float(cfg.keep_probability or 0.8))
        self.bottleneck = nn.Dense(
            int(cfg.embedding_size), use_bias=False, dtype=d,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(), name='Bottleneck')
        self.bottleneck_bn = nn.BatchNorm(
            momentum=BN_MOMENTUM_V2, epsilon=BN_EPS, use_bias=True,
            use_scale=False, dtype=d, param_dtype=jnp.float32,
            name='Bottleneck.bn')

    def __call__(self, images, train: bool = False, normalize: bool = None):
        if self.preprocess:
            x = image_processing(images, self.image_size, self.normalization,
                                 dtype=self.dtype)
        else:
            x = images.astype(self.dtype)

        for layer in self.stem_a:
            x = layer(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        for layer in self.stem_b:
            x = layer(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')

        # Mixed_5a
        t0 = self.m5a_b0(x, train)
        t1 = self.m5a_b1b(self.m5a_b1a(x, train), train)
        t2 = self.m5a_b2c(self.m5a_b2b(self.m5a_b2a(x, train), train), train)
        tp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding='SAME')
        t3 = self.m5a_b3(tp, train)
        x = jnp.concatenate([t0, t1, t2, t3], axis=3)

        for block in self.blocks35:
            x = block(x, train)

        # Mixed_6a
        t0 = self.m6a_b0(x, train)
        t1 = self.m6a_b1c(self.m6a_b1b(self.m6a_b1a(x, train), train), train)
        tp = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        x = jnp.concatenate([t0, t1, tp], axis=3)

        for block in self.blocks17:
            x = block(x, train)

        # Mixed_7a
        t0 = self.m7a_b0b(self.m7a_b0a(x, train), train)
        t1 = self.m7a_b1b(self.m7a_b1a(x, train), train)
        t2 = self.m7a_b2c(self.m7a_b2b(self.m7a_b2a(x, train), train), train)
        tp = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        x = jnp.concatenate([t0, t1, t2, tp], axis=3)

        for block in self.blocks8:
            x = block(x, train)
        x = self.block8_final(x, train)

        x = self.conv_7b(x, train)

        # global average pool + dropout + bottleneck FC + BN
        x = jnp.mean(x, axis=(1, 2))
        x = self.dropout(x, deterministic=not train)
        x = self.bottleneck(x.astype(self.dtype))
        x = self.bottleneck_bn(x, use_running_average=not train)

        x = x.astype(jnp.float32)
        if normalize is None:
            normalize = not train
        if normalize:
            norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x), axis=1,
                                                keepdims=True), 1e-10))
            x = x / norm
        return x


def create_model(model_cfg=None, image_cfg=None, dtype=jnp.bfloat16):
    image_cfg = image_cfg or Config({'size': 160, 'normalization': 0})
    from facenet_tpu.config import value_or
    return InceptionResnetV2(
        config=model_cfg,
        image_size=int(image_cfg.size or 160),
        # normalization 0 is a legitimate mode — `or` would misread it
        normalization=int(value_or(image_cfg.normalization, 0)),
        dtype=dtype,
    )
