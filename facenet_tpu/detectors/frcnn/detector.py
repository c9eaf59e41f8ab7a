"""Two-stage Faster-RCNN face detector: jitted batched inference + trainer.

TPU-native replacement for the reference's frozen-graph 'frcnnv3' backend
(reference detectors/frcnnv3/detector.py:25-56: load pb -> session per
image -> keep scores >= 0.7 -> rescale normalized boxes to pixels). Here
the whole two-stage pipeline — backbone, RPN, proposal NMS, RoIAlign, box
head, final NMS — is ONE jitted XLA computation over a batch of images,
with fixed-capacity box buffers (masks, never ragged shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facenet_tpu.detectors.frcnn.network import (STRIDE, Backbone, RoIHead,
                                                 RPN, anchor_grid,
                                                 decode_deltas,
                                                 encode_deltas)
from facenet_tpu.ops.image_ops import crop_and_resize
from facenet_tpu.ops.nms import batched_nms_mask, top_k_boxes


class FasterRCNN:
    """Batched TPU Faster-RCNN face detector.

    Usage:
        det = FasterRCNN(image_shape=(480, 640))
        out = det.detect_batch(images_uint8)
        out['boxes'], out['scores'], out['valid']      # fixed [B, K, ...]
    """

    def __init__(self, image_shape=(480, 640), threshold=0.7,
                 max_proposals=256, max_outputs=32, roi_size=7,
                 params=None, seed=0, dtype=jnp.bfloat16):
        self.image_shape = (int(image_shape[0]), int(image_shape[1]))
        self.threshold = float(threshold)       # reference detector.py:44
        self.k_proposals = int(max_proposals)
        self.k_out = int(max_outputs)
        self.roi_size = int(roi_size)

        self.backbone = Backbone(dtype=dtype)
        self.rpn = RPN(dtype=dtype)
        self.head = RoIHead(dtype=dtype)

        self.anchors = jnp.asarray(anchor_grid(*self.image_shape))
        self.params = params if params is not None else self.init_params(seed)
        self._detect_jit = jax.jit(self._detect)

    def init_params(self, seed=0):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        h, w = self.image_shape
        dummy = jnp.zeros((1, h, w, 3))
        feats = self.backbone.init(k1, dummy)
        fmap = self.backbone.apply(feats, dummy)
        rpn = self.rpn.init(k2, fmap)
        rois = jnp.zeros((1, self.k_proposals, self.roi_size, self.roi_size,
                          fmap.shape[-1]))
        head = self.head.init(k3, rois)
        return {'backbone': feats['params'], 'rpn': rpn['params'],
                'head': head['params']}

    # ------------------------------------------------------------------
    def _propose(self, params, images_f32):
        """Stage 1: feature map + RPN proposals (fixed capacity K)."""
        h, w = self.image_shape
        x = images_f32 / 255.0
        fmap = self.backbone.apply({'params': params['backbone']}, x)
        obj, deltas = self.rpn.apply({'params': params['rpn']}, fmap)

        scores = jax.nn.sigmoid(obj)                        # [B, G*A]
        boxes = decode_deltas(self.anchors[None], deltas)   # [B, G*A, 4]
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
        ], axis=-1)

        valid = (boxes[..., 2] - boxes[..., 0] > 2) & \
                (boxes[..., 3] - boxes[..., 1] > 2)
        boxes, scores, valid = jax.vmap(
            partial(top_k_boxes, k=self.k_proposals))(boxes, scores, valid)
        keep = batched_nms_mask(boxes, scores, valid, 0.7)
        return fmap, boxes, scores, valid & keep

    def _detect(self, params, images):
        images_f32 = images.astype(jnp.float32)
        fmap, boxes, rpn_scores, valid = self._propose(params, images_f32)

        # Stage 2: RoIAlign on the stride-16 feature map
        rois = crop_and_resize(fmap.astype(jnp.float32), boxes / STRIDE,
                               self.roi_size)
        cls, reg = self.head.apply({'params': params['head']},
                                   rois.astype(jnp.float32))

        probs = jax.nn.softmax(cls, axis=-1)[..., 1]        # face prob
        boxes = decode_deltas(boxes, reg)
        h, w = self.image_shape
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
        ], axis=-1)

        valid = valid & (probs >= self.threshold)           # ref :44 (0.7)
        boxes, probs, valid = jax.vmap(
            partial(top_k_boxes, k=self.k_out))(boxes, probs, valid)
        keep = batched_nms_mask(boxes, probs, valid, 0.3)
        valid = valid & keep

        return {'boxes': boxes, 'scores': jnp.where(valid, probs, 0.0),
                'valid': valid}

    def detect_batch_async(self, images):
        """Dispatch the two-stage forward and return the on-device output
        dict WITHOUT fetching — detect_files uses this to pipeline batch
        n+1's decode/transfer under batch n's compute (same contract as
        the MTCNN cascade's detect_batch_async/finalize_batch pair)."""
        images = jnp.asarray(images)
        if images.shape[1:3] != self.image_shape:
            raise ValueError(
                f'expected {self.image_shape} images, got {images.shape[1:3]}'
                ' — use letterbox_batch()')
        return self._detect_jit(self.params, images)

    def finalize_batch(self, out_device):
        """Fetch a `detect_batch_async` result to host arrays."""
        return jax.device_get(out_device)

    def detect_batch(self, images):
        return self.finalize_batch(self.detect_batch_async(images))


# ---------------------------------------------------------------------------
# Training: approximate joint training (RPN + head losses in one step)
# ---------------------------------------------------------------------------

def match_anchors(anchors, gt_boxes, pos_iou=0.7, neg_iou=0.3):
    """Anchor-to-ground-truth matching (host-side numpy, per image).

    :returns: (labels [N] {1 pos, 0 neg, -1 ignore}, targets [N, 4] deltas)
    """
    n = len(anchors)
    labels = np.full(n, -1, np.int32)
    targets = np.zeros((n, 4), np.float32)
    gt = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
    if not len(gt):
        labels[:] = 0
        return labels, targets

    from facenet_tpu.detectors.evaluation import iou_matrix
    iou = iou_matrix(anchors, gt)

    best_gt = iou.argmax(axis=1)
    best_iou = iou.max(axis=1)
    labels[best_iou < neg_iou] = 0
    labels[best_iou >= pos_iou] = 1
    # every gt keeps its best anchor positive (standard FRCNN rule)
    labels[iou.argmax(axis=0)] = 1

    pos = labels == 1
    targets[pos] = encode_deltas(anchors[pos], gt[best_gt[pos]])
    return labels, targets


class FasterRCNNTrainer:
    """Joint RPN + head training step for the face detector."""

    def __init__(self, detector, learning_rate=1e-3):
        self.det = detector
        self.tx = optax.adam(learning_rate)
        self._step = jax.jit(self._train_step)
        self.anchors_np = np.asarray(detector.anchors)

    def init_state(self, seed=0):
        params = self.det.init_params(seed)
        return {'params': params, 'opt_state': self.tx.init(params),
                'step': jnp.zeros((), jnp.int32)}

    MAX_GT = 8

    def make_targets(self, gt_boxes_per_image):
        """Host-side anchor matching for a batch -> stacked arrays."""
        labels, targets, gt_pad = [], [], []
        for gt in gt_boxes_per_image:
            l, t = match_anchors(self.anchors_np, gt)
            labels.append(l)
            targets.append(t)
            g = np.zeros((self.MAX_GT, 4), np.float32)
            gt = np.asarray(gt, np.float32).reshape(-1, 4)[:self.MAX_GT]
            g[:len(gt)] = gt
            g[len(gt):] = -1e4          # degenerate: IoU 0 with everything
            gt_pad.append(g)
        return np.stack(labels), np.stack(targets), np.stack(gt_pad)

    def _train_step(self, state, images, rpn_labels, rpn_targets, gt_boxes):
        det = self.det

        def loss_fn(params):
            images_f32 = images.astype(jnp.float32)
            x = images_f32 / 255.0
            fmap = det.backbone.apply({'params': params['backbone']}, x)
            obj, deltas = det.rpn.apply({'params': params['rpn']}, fmap)

            # RPN losses over matched anchors (ignore label -1). Anchors are
            # overwhelmingly negative (~1% positives), so positives and
            # negatives are weighted to contribute equally — the balanced
            # form of the paper's 256-anchor 1:1 sampling, without dynamic
            # shapes.
            lab = rpn_labels
            pos_m = (lab == 1).astype(jnp.float32)
            neg_m = (lab == 0).astype(jnp.float32)
            w = (pos_m * 0.5 / jnp.maximum(pos_m.sum(), 1.0) +
                 neg_m * 0.5 / jnp.maximum(neg_m.sum(), 1.0))
            ce = optax.sigmoid_binary_cross_entropy(
                obj, jnp.maximum(lab, 0).astype(jnp.float32))
            rpn_cls = jnp.sum(ce * w)

            pos = (lab == 1).astype(jnp.float32)[..., None]
            l1 = optax.huber_loss(deltas, rpn_targets, delta=1.0)
            rpn_box = jnp.sum(l1 * pos) / jnp.maximum(pos.sum() * 4, 1.0)

            # second stage trains on the gt-positive anchors' decoded boxes
            # (a simplification of proposal sampling that keeps shapes
            # static: RoIs = top-K scoring anchors by the MATCH labels)
            k = det.k_proposals
            boxes = decode_deltas(det.anchors[None], deltas)
            score_for_roi = jnp.where(lab == 1, 1.0, 0.0) + \
                jax.nn.sigmoid(obj) * 0.001
            # scores/validity are not consumed: every one of the K RoIs
            # trains the head (labels come from RoI-vs-gt IoU below)
            roi_boxes, _, _ = jax.vmap(
                partial(top_k_boxes, k=k))(
                    jax.lax.stop_gradient(boxes), score_for_roi,
                    jnp.ones_like(lab, bool))
            rois = crop_and_resize(
                jax.lax.stop_gradient(fmap).astype(jnp.float32),
                roi_boxes / STRIDE, det.roi_size)
            cls, reg = det.head.apply({'params': params['head']}, rois)

            # head labels from actual RoI-vs-gt IoU (on device): a RoI is a
            # face iff it overlaps any gt box at IoU > 0.5 — near-duplicate
            # proposals covering the object get consistent labels
            gx1 = jnp.maximum(roi_boxes[..., None, 0], gt_boxes[:, None, :, 0])
            gy1 = jnp.maximum(roi_boxes[..., None, 1], gt_boxes[:, None, :, 1])
            gx2 = jnp.minimum(roi_boxes[..., None, 2], gt_boxes[:, None, :, 2])
            gy2 = jnp.minimum(roi_boxes[..., None, 3], gt_boxes[:, None, :, 3])
            inter = (jnp.maximum(gx2 - gx1, 0) * jnp.maximum(gy2 - gy1, 0))
            area_r = ((roi_boxes[..., 2] - roi_boxes[..., 0]) *
                      (roi_boxes[..., 3] - roi_boxes[..., 1]))[..., None]
            area_g = ((gt_boxes[:, :, 2] - gt_boxes[:, :, 0]) *
                      (gt_boxes[:, :, 3] - gt_boxes[:, :, 1]))[:, None, :]
            iou = inter / jnp.maximum(area_r + area_g - inter, 1e-10)
            head_lab = (iou.max(axis=-1) > 0.5).astype(jnp.int32)
            hp = (head_lab == 1).astype(jnp.float32)
            hn = (head_lab == 0).astype(jnp.float32)
            hw = (hp * 0.5 / jnp.maximum(hp.sum(), 1.0) +
                  hn * 0.5 / jnp.maximum(hn.sum(), 1.0))
            head_ce = optax.softmax_cross_entropy_with_integer_labels(
                cls, head_lab)
            head_cls = jnp.sum(head_ce * hw)

            # head box refinement toward the best-overlapping gt (pos rois)
            best_gt = jnp.take_along_axis(
                gt_boxes, iou.argmax(axis=-1)[..., None], axis=1)
            rw = jnp.maximum(roi_boxes[..., 2] - roi_boxes[..., 0], 1e-6)
            rh = jnp.maximum(roi_boxes[..., 3] - roi_boxes[..., 1], 1e-6)
            rcx = roi_boxes[..., 0] + rw / 2
            rcy = roi_boxes[..., 1] + rh / 2
            bw = jnp.maximum(best_gt[..., 2] - best_gt[..., 0], 1e-6)
            bh = jnp.maximum(best_gt[..., 3] - best_gt[..., 1], 1e-6)
            bcx = best_gt[..., 0] + bw / 2
            bcy = best_gt[..., 1] + bh / 2
            reg_t = jnp.stack([(bcx - rcx) / rw, (bcy - rcy) / rh,
                               jnp.log(bw / rw), jnp.log(bh / rh)], axis=-1)
            l1h = optax.huber_loss(reg, reg_t, delta=1.0)
            head_box = (jnp.sum(l1h * hp[..., None]) /
                        jnp.maximum(hp.sum() * 4, 1.0))

            total = rpn_cls + rpn_box + head_cls + head_box
            return total, {'rpn_cls': rpn_cls, 'rpn_box': rpn_box,
                           'head_cls': head_cls, 'head_box': head_box,
                           'loss': total}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state['params'])
        updates, opt_state = self.tx.update(grads, state['opt_state'],
                                            state['params'])
        params = optax.apply_updates(state['params'], updates)
        return {'params': params, 'opt_state': opt_state,
                'step': state['step'] + 1}, metrics

    def train_step(self, state, images, gt_boxes_per_image):
        rpn_labels, rpn_targets, gt_pad = self.make_targets(
            gt_boxes_per_image)
        return self._step(state, jnp.asarray(images),
                          jnp.asarray(rpn_labels),
                          jnp.asarray(rpn_targets),
                          jnp.asarray(gt_pad))
