"""Faster-RCNN face detector networks (backbone, RPN, RoI head), Flax.

The reference's second detection backend is a frozen TF1 Faster-RCNN graph
whose weights are missing from its tree (reference
detectors/frcnnv3/detector.py:25-56, .MISSING_LARGE_BLOBS:1) — it loads a
`frozen_inference_graph.pb`, runs a session per image, thresholds at 0.7
and rescales normalized boxes to pixels. This package is the TPU-native
equivalent: the same two-stage architecture (backbone -> region proposal
network -> RoIAlign -> box head), built for XLA with static shapes and
batched images, trainable in-framework (detectors/frcnn/train semantics in
detector.py's FasterRCNNTrainer).

TPU-first: NHWC, bf16 activations / f32 params, stride-16 single feature
map, fixed anchor grid, fixed-capacity proposal buffers with validity masks
(same design as the MTCNN cascade — SURVEY.md §7 "Hard parts"), RoIAlign as
the separable-matmul crop (ops/image_ops.crop_and_resize).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

STRIDE = 16
ANCHOR_SCALES = (32, 64, 128, 256)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
NUM_ANCHORS = len(ANCHOR_SCALES) * len(ANCHOR_RATIOS)


class Backbone(nn.Module):
    """Compact stride-16 conv backbone (4 stride-2 stages)."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        for i, feats in enumerate((32, 64, 128, 256)):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), padding='SAME',
                        dtype=d, param_dtype=jnp.float32,
                        name=f'conv{i + 1}')(x)
            x = nn.relu(x)
            x = nn.Conv(feats, (3, 3), padding='SAME', dtype=d,
                        param_dtype=jnp.float32, name=f'conv{i + 1}b')(x)
            x = nn.relu(x)
        return x                                  # [B, H/16, W/16, 256]


class RPN(nn.Module):
    """Region proposal head: objectness + box deltas per anchor."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        d = self.dtype
        x = nn.Conv(256, (3, 3), padding='SAME', dtype=d,
                    param_dtype=jnp.float32, name='conv')(feats)
        x = nn.relu(x)
        obj = nn.Conv(NUM_ANCHORS, (1, 1), dtype=d,
                      param_dtype=jnp.float32, name='obj')(x)
        deltas = nn.Conv(NUM_ANCHORS * 4, (1, 1), dtype=d,
                         param_dtype=jnp.float32, name='deltas')(x)
        b, gh, gw, _ = obj.shape
        return (obj.astype(jnp.float32).reshape(b, -1),
                deltas.astype(jnp.float32).reshape(b, -1, 4))


class RoIHead(nn.Module):
    """Second stage: pooled RoI features -> face score + box refinement."""
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rois):
        # rois: [B, K, P, P, C]
        d = self.dtype
        b, k = rois.shape[0], rois.shape[1]
        x = rois.reshape(b * k, -1).astype(d)
        x = nn.Dense(512, dtype=d, param_dtype=jnp.float32, name='fc1')(x)
        x = nn.relu(x)
        x = nn.Dense(256, dtype=d, param_dtype=jnp.float32, name='fc2')(x)
        x = nn.relu(x)
        cls = nn.Dense(2, dtype=d, param_dtype=jnp.float32, name='cls')(x)
        reg = nn.Dense(4, dtype=d, param_dtype=jnp.float32, name='reg')(x)
        return (cls.astype(jnp.float32).reshape(b, k, 2),
                reg.astype(jnp.float32).reshape(b, k, 4))


def anchor_grid(height, width):
    """Fixed [G*A, 4] anchor boxes (x1, y1, x2, y2) for an input H x W."""
    gh, gw = height // STRIDE, width // STRIDE
    cy = (np.arange(gh) + 0.5) * STRIDE
    cx = (np.arange(gw) + 0.5) * STRIDE

    anchors = []
    for y in cy:
        for x in cx:
            for s in ANCHOR_SCALES:
                for r in ANCHOR_RATIOS:
                    w = s * np.sqrt(r)
                    h = s / np.sqrt(r)
                    anchors.append([x - w / 2, y - h / 2,
                                    x + w / 2, y + h / 2])
    return np.asarray(anchors, np.float32)


def decode_deltas(anchors, deltas):
    """Standard RCNN box decoding: (dx, dy, dw, dh) vs anchor -> box."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    acx = anchors[..., 0] + aw / 2
    acy = anchors[..., 1] + ah / 2

    dx, dy, dw, dh = (deltas[..., 0], deltas[..., 1],
                      deltas[..., 2], deltas[..., 3])
    cx = acx + dx * aw
    cy = acy + dy * ah
    w = aw * jnp.exp(jnp.clip(dw, -4.0, 4.0))
    h = ah * jnp.exp(jnp.clip(dh, -4.0, 4.0))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def encode_deltas(anchors, boxes):
    """Inverse of decode_deltas (training targets)."""
    aw = np.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ah = np.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)
    acx = anchors[..., 0] + aw / 2
    acy = anchors[..., 1] + ah / 2

    bw = np.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    bh = np.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    bcx = boxes[..., 0] + bw / 2
    bcy = boxes[..., 1] + bh / 2

    return np.stack([(bcx - acx) / aw, (bcy - acy) / ah,
                     np.log(bw / aw), np.log(bh / ah)], axis=-1)
