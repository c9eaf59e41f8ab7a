"""MTCNN P-Net / R-Net / O-Net in Flax.

The reference delegates the whole cascade to the external PyPI `mtcnn`
package (reference detectors/face_detector.py:63-66); the capability to
rebuild natively is specified in SURVEY.md §2 #13 and BASELINE.json. The
architectures follow the MTCNN paper (Zhang et al., 2016, arXiv:1604.02878;
see PAPERS.md): three small CNNs with PReLU activations.

  P-Net (fully convolutional, 12x12 receptive field, stride 2):
    conv3x3/10 - maxpool2 - conv3x3/16 - conv3x3/32 -> cls 2 + reg 4
  R-Net (24x24): conv3x3/28 - maxpool3s2 - conv3x3/48 - maxpool3s2 -
    conv2x2/64 - FC 128 -> cls 2 + reg 4
  O-Net (48x48): conv3x3/32 - maxpool3s2 - conv3x3/64 - maxpool3s2 -
    conv3x3/64 - maxpool2s2 - conv2x2/128 - FC 256 -> cls 2 + reg 4 +
    landmarks 10

TPU-first: NHWC, bf16 activations/f32 params, all three nets applied to
BATCHES of crops/pyramid levels (the reference path runs one image per
session call, SURVEY.md §3.2 — the batched redesign removes that bottleneck).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """Channel-wise parametric ReLU (MTCNN uses PReLU everywhere)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param('alpha', nn.initializers.constant(0.25),
                           (x.shape[-1],), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class PNet(nn.Module):
    """Proposal network — fully convolutional; input [B, H, W, 3] normalized.

    Returns (probs [B, H', W'], reg [B, H', W', 4]) with
    H' = (H - 2) // 2 - 4, mapping each output cell to a 12x12 window at
    stride 2 in the input.
    """
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, logits=False):
        d = self.dtype
        x = x.astype(d)
        x = nn.Conv(10, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv1')(x)
        x = PReLU(name='prelu1')(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding='SAME')
        x = nn.Conv(16, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv2')(x)
        x = PReLU(name='prelu2')(x)
        x = nn.Conv(32, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv3')(x)
        x = PReLU(name='prelu3')(x)

        cls = nn.Conv(2, (1, 1), dtype=d, param_dtype=jnp.float32,
                      name='cls')(x)
        reg = nn.Conv(4, (1, 1), dtype=d, param_dtype=jnp.float32,
                      name='reg')(x)

        if logits:
            return cls.astype(jnp.float32), reg.astype(jnp.float32)
        probs = nn.softmax(cls.astype(jnp.float32), axis=-1)[..., 1]
        return probs, reg.astype(jnp.float32)


class RNet(nn.Module):
    """Refinement network — input [B, 24, 24, 3] normalized crops."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, logits=False):
        d = self.dtype
        x = x.astype(d)
        x = nn.Conv(28, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv1')(x)
        x = PReLU(name='prelu1')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')
        x = nn.Conv(48, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv2')(x)
        x = PReLU(name='prelu2')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        x = nn.Conv(64, (2, 2), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv3')(x)
        x = PReLU(name='prelu3')(x)

        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(128, dtype=d, param_dtype=jnp.float32, name='fc1')(x)
        x = PReLU(name='prelu4')(x)

        cls = nn.Dense(2, dtype=d, param_dtype=jnp.float32, name='cls')(x)
        reg = nn.Dense(4, dtype=d, param_dtype=jnp.float32, name='reg')(x)

        if logits:
            return cls.astype(jnp.float32), reg.astype(jnp.float32)
        probs = nn.softmax(cls.astype(jnp.float32), axis=-1)[..., 1]
        return probs, reg.astype(jnp.float32)


class ONet(nn.Module):
    """Output network — input [B, 48, 48, 3]; adds 5-landmark regression."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, logits=False):
        d = self.dtype
        x = x.astype(d)
        x = nn.Conv(32, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv1')(x)
        x = PReLU(name='prelu1')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='SAME')
        x = nn.Conv(64, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv2')(x)
        x = PReLU(name='prelu2')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        x = nn.Conv(64, (3, 3), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv3')(x)
        x = PReLU(name='prelu3')(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding='SAME')
        x = nn.Conv(128, (2, 2), padding='VALID', dtype=d,
                    param_dtype=jnp.float32, name='conv4')(x)
        x = PReLU(name='prelu4')(x)

        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(256, dtype=d, param_dtype=jnp.float32, name='fc1')(x)
        x = PReLU(name='prelu5')(x)

        cls = nn.Dense(2, dtype=d, param_dtype=jnp.float32, name='cls')(x)
        reg = nn.Dense(4, dtype=d, param_dtype=jnp.float32, name='reg')(x)
        lmk = nn.Dense(10, dtype=d, param_dtype=jnp.float32,
                       name='landmarks')(x)

        if logits:
            return (cls.astype(jnp.float32), reg.astype(jnp.float32),
                    lmk.astype(jnp.float32))
        probs = nn.softmax(cls.astype(jnp.float32), axis=-1)[..., 1]
        return probs, reg.astype(jnp.float32), lmk.astype(jnp.float32)


def normalize_crops(x):
    """MTCNN input normalization: (pixel - 127.5) / 128."""
    return (x.astype(jnp.float32) - 127.5) * (1.0 / 128.0)
