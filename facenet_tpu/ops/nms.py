"""Fixed-capacity non-maximum suppression and box utilities, TPU-native.

MTCNN's post-processing (score threshold -> NMS -> bbox regression) is
dynamic-shaped in every public implementation; on TPU all shapes must be
static (SURVEY.md §7 "Hard parts"). The design here:

  * boxes live in fixed-capacity [K, 4] buffers with a validity mask;
  * selection (threshold / top-k) produces masks, never ragged arrays;
  * NMS is a sequential greedy pass expressed as `lax.fori_loop` over a
    precomputed [K, K] IoU matrix — K is small (<= 1024) so the IoU matrix
    is a few hundred KB in VMEM and each loop step is one masked vector op
    on the VPU.

Boxes are (x1, y1, x2, y2) in pixel coordinates, end-exclusive widths
w = x2 - x1 (matching the common MTCNN convention where w = x2 - x1 + 1 is
absorbed into the regression targets; we use pure x2 - x1 consistently).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def box_area(boxes):
    """[..., 4] -> [...] areas; clamped at 0."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def iou_matrix(boxes, mode='union'):
    """Pairwise IoU of a [K, 4] box set -> [K, K].

    mode 'union': standard IoU; mode 'min': intersection over min-area
    (MTCNN uses 'min' for the final ONet suppression).
    """
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])

    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    areas = box_area(boxes)

    if mode == 'min':
        denom = jnp.minimum(areas[:, None], areas[None, :])
    else:
        denom = areas[:, None] + areas[None, :] - inter

    return inter / jnp.maximum(denom, 1e-10)


def nms_mask(boxes, scores, valid, iou_threshold, mode='union'):
    """Greedy NMS over a fixed-capacity box set; returns a keep mask [K].

    Exactly the classic algorithm: visit boxes in descending score order;
    keep a box iff it is valid and not suppressed by an already-kept box.
    """
    k = boxes.shape[0]

    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]

    iou = iou_matrix(sorted_boxes, mode=mode)

    def body(i, carry):
        keep, suppressed = carry
        is_kept = sorted_valid[i] & ~suppressed[i]
        keep = keep.at[i].set(is_kept)
        # suppress all later boxes overlapping this one
        later = jnp.arange(k) > i
        suppressed = suppressed | (is_kept & later & (iou[i] > iou_threshold))
        return keep, suppressed

    keep_sorted, _ = jax.lax.fori_loop(
        0, k, body,
        (jnp.zeros((k,), bool), jnp.zeros((k,), bool)))

    # scatter back to original order
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep


def nms_mask_fast(boxes, scores, valid, iou_threshold, mode='union'):
    """One-shot matrix NMS (no sequential loop); returns a keep mask [K].

    A box is dropped when ANY higher-scored valid box overlaps it — the
    "Fast NMS" relaxation (Bolya et al. 2019, YOLACT): unlike greedy NMS
    the suppressor may itself be suppressed, so this suppresses a superset
    of greedy's victims. That is fine for CANDIDATE pruning between
    cascade stages (the next net re-scores survivors); final outputs
    should use the exact greedy `nms_mask`. One VPU matrix pass instead
    of K sequential loop steps — the P-Net stage runs 10+ of these per
    batch, where greedy's K-step fori_loop dominated the stage profile.
    """
    k = boxes.shape[0]
    iou = iou_matrix(boxes, mode=mode)
    s = jnp.where(valid, scores, -jnp.inf)
    # j suppresses i iff score_j > score_i (ties: lower index wins)
    higher = (s[:, None] > s[None, :]) | (
        (s[:, None] == s[None, :]) &
        (jnp.arange(k)[:, None] < jnp.arange(k)[None, :]))
    suppressed = jnp.any(higher & (iou > iou_threshold) &
                         valid[:, None], axis=0)
    return valid & ~suppressed


def batched_nms_mask(boxes, scores, valid, iou_threshold, mode='union',
                     algorithm='greedy'):
    """vmap of nms_mask (or nms_mask_fast) over a leading batch dimension."""
    fn = partial(nms_mask_fast if algorithm == 'fast' else nms_mask,
                 iou_threshold=iou_threshold, mode=mode)
    return jax.vmap(fn)(boxes, scores, valid)


def top_k_boxes(boxes, scores, valid, k, approx=False):
    """Select the top-k valid boxes by score into fixed [k, 4] buffers.

    Works for k > len(scores) too: outputs pad with invalid entries (small
    image geometries can yield fewer pyramid proposals than the capacity,
    and jax.lax.top_k requires k <= axis size).

    With approx=True, uses the TPU-optimized `jax.lax.approx_max_k`
    (recall target 0.95) — appropriate for candidate pre-selection where
    an occasional near-tied candidate swap is harmless; exact `top_k`
    otherwise. approx_max_k is far cheaper than a full sort on the
    tens-of-thousands-of-cells P-Net pyramid levels.

    Returns (boxes [k,4], scores [k], valid [k]).
    """
    n = scores.shape[0]
    kk = min(int(k), n)
    masked = jnp.where(valid, scores, -jnp.inf)
    if approx and kk < n:
        top_scores, idx = jax.lax.approx_max_k(masked, kk)
    else:
        top_scores, idx = jax.lax.top_k(masked, kk)
    top_boxes = boxes[idx]
    top_valid = jnp.isfinite(top_scores)
    top_scores = jnp.where(top_valid, top_scores, 0.0)
    if kk < k:
        pad = int(k) - kk
        top_boxes = jnp.concatenate(
            [top_boxes, jnp.zeros((pad, 4), top_boxes.dtype)])
        top_scores = jnp.concatenate(
            [top_scores, jnp.zeros((pad,), top_scores.dtype)])
        top_valid = jnp.concatenate(
            [top_valid, jnp.zeros((pad,), bool)])
    return top_boxes, top_scores, top_valid


def square_boxes(boxes):
    """Expand boxes to squares around their centers (MTCNN 'rerec')."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    side = jnp.maximum(w, h)
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    return jnp.stack([cx - side / 2, cy - side / 2,
                      cx + side / 2, cy + side / 2], axis=-1)


def apply_bbox_regression(boxes, reg):
    """Apply MTCNN bbox regression offsets (dx1, dy1, dx2, dy2) scaled by w/h."""
    w = (boxes[..., 2] - boxes[..., 0])[..., None]
    h = (boxes[..., 3] - boxes[..., 1])[..., None]
    scale = jnp.concatenate([w, h, w, h], axis=-1)
    return boxes + reg * scale
