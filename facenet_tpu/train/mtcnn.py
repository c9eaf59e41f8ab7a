"""MTCNN cascade training: multi-task loss with online hard example mining.

The reference cannot train its detector at all — it delegates to the
pretrained PyPI `mtcnn` package (reference detectors/face_detector.py:63-66).
This module makes the cascade trainable in-framework, following the MTCNN
paper's recipe (Zhang et al. 2016, arXiv:1604.02878, §II-B/III-A; PAPERS.md):

  * three sample kinds drive three losses — face classification (2-class
    softmax CE), bounding-box regression (L2 to normalized offsets), and
    5-landmark regression (L2);
  * sample-type masks select which losses each crop contributes to:
    negatives (IoU < 0.3) -> cls only; positives (IoU > 0.65) -> cls + box;
    part faces (0.4-0.65) -> box only; landmark crops -> landmarks only;
  * online hard example mining (OHEM): only the hardest 70% of
    classification losses in each minibatch backprop;
  * per-net task weights: P/R-Net (cls 1.0, box 0.5, lmk 0.5),
    O-Net (cls 1.0, box 0.5, lmk 1.0);
  * stage-wise training: P-Net first, its proposals mine hard negatives
    for R-Net, then O-Net (the stage protocol lives in the data
    generation; each net trains independently here).

TPU-first: one jitted step per net, fixed-shape batches of (crops, labels,
box targets, landmark targets, sample types), OHEM as a sorted threshold
(static shapes, no ragged selection).

Sample type codes: 0 = negative, 1 = positive, 2 = part face, 3 = landmark.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facenet_tpu.detectors.mtcnn.networks import (ONet, PNet, RNet,
                                                  normalize_crops)
from facenet_tpu.logging import logger

NEGATIVE, POSITIVE, PART, LANDMARK = 0, 1, 2, 3

# task weights per net (paper §III-A)
TASK_WEIGHTS = {
    'pnet': {'cls': 1.0, 'box': 0.5, 'lmk': 0.5},
    'rnet': {'cls': 1.0, 'box': 0.5, 'lmk': 0.5},
    'onet': {'cls': 1.0, 'box': 0.5, 'lmk': 1.0},
}

INPUT_SIZE = {'pnet': 12, 'rnet': 24, 'onet': 48}

OHEM_KEEP = 0.7     # hardest 70% of cls losses kept (paper §II-B)


def multitask_loss(cls_logits, box_pred, lmk_pred, labels, box_target,
                   lmk_target, sample_type, weights, ohem_keep=OHEM_KEEP):
    """Masked multi-task MTCNN loss over one batch.

    :param cls_logits: [B, 2]; box_pred [B, 4]; lmk_pred [B, 10] (or None)
    :param labels: [B] 0/1 face label (only meaningful for neg/pos samples)
    :param sample_type: [B] codes (NEGATIVE/POSITIVE/PART/LANDMARK)
    :returns: (total, metrics dict)
    """
    b = cls_logits.shape[0]
    st = sample_type

    # ---- classification with OHEM over neg+pos samples
    cls_mask = ((st == NEGATIVE) | (st == POSITIVE)).astype(jnp.float32)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                              axis=1)[:, 0]
    ce = ce * cls_mask

    # hardest `ohem_keep` fraction of the *eligible* samples: threshold at
    # the (1-keep) quantile of masked losses — static-shape top-k selection
    n_eligible = jnp.maximum(jnp.sum(cls_mask), 1.0)
    n_keep = jnp.maximum(jnp.floor(n_eligible * ohem_keep), 1.0)
    sorted_ce = jnp.sort(ce)[::-1]                   # descending, zeros last
    kth = sorted_ce[jnp.clip(n_keep.astype(jnp.int32) - 1, 0, b - 1)]
    keep = (ce >= kth) & (cls_mask > 0)
    cls_loss = jnp.sum(jnp.where(keep, ce, 0.0)) / jnp.maximum(
        jnp.sum(keep.astype(jnp.float32)), 1.0)

    acc = jnp.sum((jnp.argmax(cls_logits, axis=1) == labels) * cls_mask)
    acc = acc / n_eligible

    # ---- bbox regression over pos+part samples
    box_mask = ((st == POSITIVE) | (st == PART)).astype(jnp.float32)
    box_se = jnp.sum(jnp.square(box_pred - box_target), axis=1) * box_mask
    box_loss = jnp.sum(box_se) / jnp.maximum(jnp.sum(box_mask), 1.0)

    total = weights['cls'] * cls_loss + weights['box'] * box_loss
    metrics = {'cls_loss': cls_loss, 'box_loss': box_loss,
               'cls_accuracy': acc}

    # ---- landmark regression over landmark samples
    if lmk_pred is not None:
        lmk_mask = (st == LANDMARK).astype(jnp.float32)
        lmk_se = jnp.sum(jnp.square(lmk_pred - lmk_target), axis=1) * lmk_mask
        lmk_loss = jnp.sum(lmk_se) / jnp.maximum(jnp.sum(lmk_mask), 1.0)
        total = total + weights['lmk'] * lmk_loss
        metrics['lmk_loss'] = lmk_loss

    metrics['loss'] = total
    return total, metrics


class MTCNNTrainer:
    """Stage trainer for one cascade net ('pnet' | 'rnet' | 'onet')."""

    def __init__(self, net='pnet', learning_rate=1e-3, dtype=jnp.bfloat16,
                 ohem_keep=OHEM_KEEP):
        if net not in ('pnet', 'rnet', 'onet'):
            raise ValueError(f'unknown net {net}')
        self.net_name = net
        self.size = INPUT_SIZE[net]
        self.weights = TASK_WEIGHTS[net]
        self.ohem_keep = float(ohem_keep)

        self.net = {'pnet': PNet, 'rnet': RNet,
                    'onet': ONet}[net](dtype=dtype)
        self.tx = optax.adam(learning_rate)
        self._step = jax.jit(self._train_step)

    def init_state(self, seed=0):
        s = self.size
        params = self.net.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, s, s, 3)))['params']
        return {'params': params, 'opt_state': self.tx.init(params),
                'step': jnp.zeros((), jnp.int32)}

    # ------------------------------------------------------------------
    def _forward(self, params, crops):
        out = self.net.apply({'params': params}, normalize_crops(crops),
                             logits=True)
        if self.net_name == 'onet':
            cls, box, lmk = out
        else:
            (cls, box), lmk = out, None
        if self.net_name == 'pnet':
            # P-Net is fully convolutional: 12x12 input -> [B,1,1,*]
            cls = cls.reshape(cls.shape[0], 2)
            box = box.reshape(box.shape[0], 4)
        return cls, box, lmk

    def _train_step(self, state, batch):
        crops, labels, box_t, lmk_t, st = batch

        def loss_fn(params):
            cls, box, lmk = self._forward(params, crops)
            return multitask_loss(cls, box, lmk, labels, box_t, lmk_t, st,
                                  self.weights, self.ohem_keep)

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state['params'])
        updates, opt_state = self.tx.update(grads, state['opt_state'],
                                            state['params'])
        params = optax.apply_updates(state['params'], updates)
        return {'params': params, 'opt_state': opt_state,
                'step': state['step'] + 1}, metrics

    def train_step(self, state, crops, labels, box_targets, lmk_targets,
                   sample_types):
        batch = (jnp.asarray(crops, jnp.float32),
                 jnp.asarray(labels, jnp.int32),
                 jnp.asarray(box_targets, jnp.float32),
                 jnp.asarray(lmk_targets, jnp.float32),
                 jnp.asarray(sample_types, jnp.int32))
        return self._step(state, batch)

    def train(self, state, batches, epochs=1, log_every=100):
        """Train over `batches` for `epochs` epochs.

        `batches` may be a factory (callable returning a fresh iterable per
        epoch) or a re-iterable sequence; a plain generator is materialized
        when epochs > 1 so later epochs don't silently run zero steps.
        """
        if not callable(batches) and epochs > 1 and iter(batches) is batches:
            batches = list(batches)
        metrics = None
        for epoch in range(epochs):
            epoch_batches = batches() if callable(batches) else batches
            for n, batch in enumerate(epoch_batches, 1):
                state, metrics = self.train_step(state, *batch)
                if log_every and n % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    logger.info(f'{self.net_name} epoch {epoch} step {n}: ' +
                                ' '.join(f'{k}={v:.4f}'
                                         for k, v in m.items()))
        return state, {k: float(v) for k, v in (metrics or {}).items()}


# ---------------------------------------------------------------------------
# Training-crop generation (host-side, numpy): boxes + IoU -> sample crops
# ---------------------------------------------------------------------------

def _iou_one_to_many(box, boxes):
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    a = max((box[2] - box[0]) * (box[3] - box[1]), 1e-10)
    b = np.maximum((boxes[:, 2] - boxes[:, 0]) *
                   (boxes[:, 3] - boxes[:, 1]), 1e-10)
    return inter / (a + b - inter)


def generate_training_crops(image, gt_boxes, out_size, rng,
                            n_negatives=16, n_per_box=8, gt_landmarks=None):
    """Sample (crop, label, box_target[, lmk_target], sample_type) tuples
    from one annotated image — the paper's pos/neg/part sampling
    (IoU 0.65/0.3/0.4), plus LANDMARK samples when 5-point annotations are
    provided.

    Box targets are the standard MTCNN normalized offsets
    ((gt - anchor) / anchor_side) for the crop window; landmark targets are
    the 5 points normalized to the crop window ((p - origin) / side),
    flattened [x1..x5, y1..y5] to match ONet's output layout.

    :param image: [H, W, 3] uint8; gt_boxes [G, 4] pixel (x1, y1, x2, y2)
    :param gt_landmarks: optional [G, 5, 2] pixel landmark annotations
    :returns: (crops [N,S,S,3] uint8, labels [N], box_targets [N,4],
        lmk_targets [N,10], sample_types [N])
    """
    h, w = image.shape[:2]
    s = int(out_size)
    crops, labels, targets, lmk_targets, types = [], [], [], [], []
    gt = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
    lmks = (np.asarray(gt_landmarks, np.float32).reshape(-1, 5, 2)
            if gt_landmarks is not None else None)

    def emit(win, label, target, typ, lmk_t=None):
        x1, y1, x2, y2 = [int(round(v)) for v in win]
        x1c, y1c = max(x1, 0), max(y1, 0)
        x2c, y2c = min(x2, w), min(y2, h)
        if x2c - x1c < 4 or y2c - y1c < 4:
            return
        patch = image[y1c:y2c, x1c:x2c]
        # cheap nearest resize to the net input (training crops only)
        yi = np.linspace(0, patch.shape[0] - 1, s).astype(np.int32)
        xi = np.linspace(0, patch.shape[1] - 1, s).astype(np.int32)
        crops.append(patch[yi][:, xi])
        labels.append(label)
        targets.append(target)
        lmk_targets.append(lmk_t if lmk_t is not None
                           else np.zeros(10, np.float32))
        types.append(typ)

    # negatives: random windows with IoU < 0.3 to every gt box
    for _ in range(n_negatives * 4):
        if len([t for t in types if t == NEGATIVE]) >= n_negatives:
            break
        side = rng.randint(s, max(min(h, w) // 2, s + 1))
        x1 = rng.randint(0, max(w - side, 1))
        y1 = rng.randint(0, max(h - side, 1))
        win = np.array([x1, y1, x1 + side, y1 + side], np.float32)
        if gt.size and _iou_one_to_many(win, gt).max() >= 0.3:
            continue
        emit(win, 0, np.zeros(4, np.float32), NEGATIVE)

    # positives / part faces: jittered windows around each gt box
    for g in gt:
        gw, gh = g[2] - g[0], g[3] - g[1]
        if gw < 8 or gh < 8:
            continue
        for _ in range(n_per_box):
            side = rng.uniform(0.8, 1.25) * max(gw, gh)
            cx = (g[0] + g[2]) / 2 + rng.uniform(-0.2, 0.2) * gw
            cy = (g[1] + g[3]) / 2 + rng.uniform(-0.2, 0.2) * gh
            win = np.array([cx - side / 2, cy - side / 2,
                            cx + side / 2, cy + side / 2], np.float32)
            # windows extending past the border would be clipped by emit()
            # while targets/IoU were computed for the unclipped window —
            # discard them, as the paper's pipeline does
            if win[0] < 0 or win[1] < 0 or win[2] > w or win[3] > h:
                continue
            iou = _iou_one_to_many(win, g[None])[0]
            target = np.array([(g[0] - win[0]) / side,
                               (g[1] - win[1]) / side,
                               (g[2] - win[2]) / side,
                               (g[3] - win[3]) / side], np.float32)
            if iou > 0.65:
                emit(win, 1, target, POSITIVE)
            elif iou > 0.4:
                emit(win, 0, target, PART)

    # landmark samples: tight windows around annotated faces with the 5
    # points normalized into the window ([x1..x5, y1..y5], ONet layout)
    if lmks is not None:
        for g, pts in zip(gt, lmks):
            gw, gh = g[2] - g[0], g[3] - g[1]
            if gw < 8 or gh < 8:
                continue
            for _ in range(max(n_per_box // 2, 1)):
                side = rng.uniform(0.9, 1.1) * max(gw, gh)
                cx = (g[0] + g[2]) / 2 + rng.uniform(-0.1, 0.1) * gw
                cy = (g[1] + g[3]) / 2 + rng.uniform(-0.1, 0.1) * gh
                win = np.array([cx - side / 2, cy - side / 2,
                                cx + side / 2, cy + side / 2], np.float32)
                if win[0] < 0 or win[1] < 0 or win[2] > w or win[3] > h:
                    continue
                norm = (pts - win[None, :2]) / side
                if norm.min() < 0 or norm.max() > 1:
                    continue
                lmk_t = np.concatenate([norm[:, 0], norm[:, 1]]
                                       ).astype(np.float32)
                emit(win, 1, np.zeros(4, np.float32), LANDMARK, lmk_t)

    if not crops:
        return (np.zeros((0, s, s, 3), np.uint8), np.zeros(0, np.int32),
                np.zeros((0, 4), np.float32), np.zeros((0, 10), np.float32),
                np.zeros(0, np.int32))
    return (np.stack(crops).astype(np.uint8),
            np.asarray(labels, np.int32),
            np.stack(targets),
            np.stack(lmk_targets),
            np.asarray(types, np.int32))
