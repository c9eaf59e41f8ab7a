"""Batched MTCNN detection cascade, end-to-end on TPU.

The reference's detection path is one-image-per-session-call host loops
(SURVEY.md §3.2: "Entirely serial, one image per sess.run — the throughput
bottleneck the TPU rebuild must remove"). This module is the redesign:

  * FIXED input geometry: images are letterboxed to a static (H, W); the
    image pyramid is a static list of scales derived from min_face_size and
    the scale factor — every stage traces once and reuses the executable.
  * FIXED capacities: proposals live in [B, K, 4] buffers with validity
    masks (K_pnet -> K_rnet -> K_onet), so threshold/NMS/top-k never produce
    ragged shapes (SURVEY.md §7 "Hard parts").
  * ONE jitted function runs the whole cascade for a batch of images:
    pyramid resizes, P/R/O-Net convs (MXU), NMS + regression + crop-gathers
    (VPU), landmark output. No host round-trips between stages.

Stage protocol (thresholds/NMS from the MTCNN paper, arXiv:1604.02878):
  P-Net over each pyramid level -> score >= t1, per-level NMS 0.5 ->
  cross-level NMS 0.7, bbox regression, square;
  R-Net on 24x24 crops -> score >= t2, NMS 0.7, regression, square;
  O-Net on 48x48 crops -> score >= t3, regression, NMS 0.7 (mode 'min'),
  5 landmarks.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from facenet_tpu.detectors.mtcnn.networks import (ONet, PNet, RNet,
                                                  normalize_crops)
from facenet_tpu.ops.image_ops import align_by_landmarks, crop_and_resize
from facenet_tpu.ops.nms import (apply_bbox_regression, batched_nms_mask,
                                 square_boxes, top_k_boxes)

PNET_CELL = 12
PNET_STRIDE = 2


def _overflow_count(valid, k):
    """Valid candidates beyond a top-k capacity: what the fixed-size buffer
    silently drops. [B?, N] bool mask + capacity -> int32 count (>= 0)."""
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    return jnp.maximum(n_valid - jnp.int32(k), 0)


def pyramid_scales(height, width, min_face_size=20, factor=0.709,
                   min_level=12):
    """Static list of pyramid scales (largest first)."""
    m = PNET_CELL / float(min_face_size)
    min_side = min(height, width) * m
    scales = []
    s = m
    side = min_side
    while side >= min_level:
        scales.append(s)
        s *= factor
        side *= factor
    return scales


def pnet_base_boxes(gh, gw, scale, convention='exact'):
    """Base boxes [gh, gw, 4] for a P-Net output grid at pyramid `scale`.

    'exact': cell (y, x) covers its true receptive window
    [2x, 2x+12) / scale — the convention the in-repo trainer's regression
    targets use. 'caffe': the upstream davidsandberg generateBoundingBox
    form q1=(2x+1)/scale, q2=(2x+12)/scale (11-wide), which Caffe-era
    pretrained P-Net regressors were trained against.
    """
    off = 1.0 if convention == 'caffe' else 0.0
    ys = (jnp.arange(gh, dtype=jnp.float32) * PNET_STRIDE + off) / scale
    xs = (jnp.arange(gw, dtype=jnp.float32) * PNET_STRIDE + off) / scale
    y1 = ys[:, None] * jnp.ones((1, gw))
    x1 = xs[None, :] * jnp.ones((gh, 1))
    cell = (PNET_CELL - off) / scale
    return jnp.stack([x1, y1, x1 + cell, y1 + cell], axis=-1)


class MTCNN:
    """Batched TPU MTCNN detector.

    Usage:
        det = MTCNN(image_shape=(480, 640))
        out = det.detect_batch(images_uint8)   # [B, H, W, 3]
        out['boxes'], out['scores'], out['landmarks'], out['valid']
    """

    def __init__(self, image_shape=(480, 640), min_face_size=20,
                 factor=0.709, thresholds=(0.6, 0.7, 0.7),
                 max_proposals=256, max_refined=64, max_outputs=32,
                 params=None, seed=0, dtype=jnp.bfloat16,
                 pnet_impl='auto', pnet_box_convention='exact',
                 allow_timing_probes=False):
        # P-Net base-box convention. 'exact' maps grid cell x to its true
        # receptive window [2x, 2x+12) — what the in-repo trainer's
        # regression targets assume. 'caffe' reproduces the upstream
        # davidsandberg/Caffe generateBoundingBox q1=(2x+1)/s,
        # q2=(2x+12)/s (an 11-wide cell): weights imported from det1.npy
        # were TRAINED against that base, so their regressors are only
        # in-distribution under it (weights.py sets this automatically).
        if pnet_box_convention not in ('exact', 'caffe'):
            raise ValueError(
                f'unknown pnet_box_convention {pnet_box_convention!r}')
        self.pnet_box_convention = pnet_box_convention
        self.image_shape = (int(image_shape[0]), int(image_shape[1]))
        self.min_face_size = min_face_size
        self.factor = factor
        self.thresholds = tuple(thresholds)
        self.k_pnet = int(max_proposals)
        self.k_rnet = int(max_refined)
        self.k_onet = int(max_outputs)

        self.dtype = dtype
        self.pnet = PNet(dtype=dtype)
        self.rnet = RNet(dtype=dtype)
        self.onet = ONet(dtype=dtype)

        self.scales = pyramid_scales(*self.image_shape,
                                     min_face_size=min_face_size,
                                     factor=factor)
        if not self.scales:
            raise ValueError(
                f'image {self.image_shape} too small for min_face_size '
                f'{min_face_size}')

        # Pyramid resizes as matmuls: bilinear resampling is linear and
        # separable, so level l's resize is exactly  V_l @ image @ H_l
        # with V_l [sh, H] / H_l [W, sw] — two MXU matmuls instead of the
        # gather-based jax.image.resize. Measured honestly: standalone the
        # matmul form is much faster, but END-TO-END the cascade only goes
        # 10.88 -> 10.75 ms/batch16 (XLA already fused the gather resize
        # into its consumers); kept for the cleaner MXU mapping. The
        # matrices are derived by resizing identity matrices through
        # jax.image.resize itself, so resampling (incl. anti-aliasing)
        # matches to dtype rounding.
        self._resize_mats = [
            self._level_resize_matrices(scale) for scale in self.scales]

        # P-Net backend (measured on v5e, tools/time_cascade_ab.py):
        #   'flax'    = XLA convs. Best THROUGHPUT config: batch 64 runs
        #               2,574 img/s (24.86 ms/batch), above the 2,500
        #               north star. 'auto' picks this.
        #   'pyramid' = whole-pyramid fused Pallas kernel (pallas_pnet.py
        #               v4, ONE dispatch for all levels): wins at small
        #               batch (9.91 vs 10.58 ms/batch16, 1,614 img/s)
        #               but its per-image time is patch-assembly-bound
        #               and constant, so XLA overtakes it by batch 64
        #               (32.0 vs 24.9 ms). The latency-serving choice.
        #   'flat'    = per-level v3 kernel; superseded by 'pyramid'
        #               (flax 10.63 vs flat 11.07 ms/batch16), kept as
        #               the measured record + building block.
        # '-interpret' suffixes run the kernels in interpret mode (CPU
        # tests). Mosaic compiles cost minutes per (geometry, batch).
        if pnet_impl == 'auto':
            pnet_impl = 'flax'
        if pnet_impl not in ('flat', 'flax', 'flat-interpret',
                             'pyramid', 'pyramid-interpret',
                             'pyramid-dots', 'pyramid-skip'):
            raise ValueError(f'unknown pnet_impl {pnet_impl!r}')
        if pnet_impl == 'pyramid-skip' and not allow_timing_probes:
            # assembly-cost timing probe: the head dot reads a stale
            # patch buffer, so detections are GARBAGE — never a valid
            # production impl (see the v4/v5 record in pallas_pnet.py)
            raise ValueError(
                "pnet_impl 'pyramid-skip' is a timing-only probe with "
                "wrong numerics; pass allow_timing_probes=True to use "
                "it in a benchmark")
        self.pnet_impl = pnet_impl
        # per-level 128-padded widths + padded H-resize matrices for the
        # flat kernel (zero columns beyond the true scaled width)
        self._flat_geom = []
        self._flat_hm = []
        for (v, hm), scale in zip(self._resize_mats, self.scales):
            sh, sw = v.shape[0], hm.shape[1]
            sw_pad = -(-sw // 128) * 128
            self._flat_geom.append((sh, sw_pad, sw))
            self._flat_hm.append(jnp.pad(hm, ((0, 0), (0, sw_pad - sw))))

        self.params = params if params is not None else self.init_params(seed)
        self._detect_jit = jax.jit(self._detect)
        self._align_jit = {}

    def _level_resize_matrices(self, scale):
        h, w = self.image_shape
        sh = int(math.ceil(h * scale))
        sw = int(math.ceil(w * scale))
        v = np.asarray(jax.image.resize(
            np.eye(h, dtype=np.float32), (sh, h), method='bilinear'))
        hm = np.asarray(jax.image.resize(
            np.eye(w, dtype=np.float32), (sw, w), method='bilinear')).T
        return (jnp.asarray(v, jnp.bfloat16), jnp.asarray(hm, jnp.bfloat16))

    # ------------------------------------------------------------------
    def init_params(self, seed=0):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        h, w = self.image_shape
        return {
            'pnet': self.pnet.init(k1, jnp.zeros((1, 24, 24, 3)))['params'],
            'rnet': self.rnet.init(k2, jnp.zeros((1, 24, 24, 3)))['params'],
            'onet': self.onet.init(k3, jnp.zeros((1, 48, 48, 3)))['params'],
        }

    # ------------------------------------------------------------------
    def _pnet_level(self, params, base_norm, level, pnet_packed=None):
        """Run P-Net on one pyramid level; return fixed-size candidate set.

        `base_norm` is the ALREADY-normalized bf16 base image: the MTCNN
        (x - 127.5)/128 affine commutes with bilinear resampling, so
        normalizing once before the pyramid removes a full-tensor
        elementwise pass per level. The resize itself runs as two MXU
        matmuls (see __init__: `_resize_mats`). `pnet_packed` carries the
        pack_v3 weights, computed ONCE by _detect rather than re-traced
        per level.
        """
        scale = self.scales[level]
        v, hm = self._resize_mats[level]

        if self.pnet_impl != 'flax':
            # flat-lane Pallas P-Net (pallas_pnet.py v3): the H-resize
            # matmul emits CHANNEL PLANES directly ('bixc,xj->bcij'),
            # so the [C, H*W] layout the kernel wants costs nothing —
            # the NHWC->planes relayout would otherwise eat ~2.7 ms of
            # the ~3.2 ms the kernel saves (tools/try_pnet_v3.py)
            from facenet_tpu.detectors.mtcnn.pallas_pnet import (
                pack_v3, pnet_forward_flat)
            if pnet_packed is None:
                pnet_packed = pack_v3(params['pnet'])
            sh, sw_pad, sw_true = self._flat_geom[level]
            t = jnp.einsum('iy,byxc->bixc', v, base_norm)
            planes = jnp.einsum('bixc,xj->bcij', t, self._flat_hm[level])
            planes = planes.reshape(planes.shape[0], 3, sh * sw_pad)
            probs, reg = pnet_forward_flat(
                pnet_packed, planes, sh, sw_pad, sw_true,
                interpret=self.pnet_impl == 'flat-interpret')
        else:
            # V [sh, H] x base [B, H, W, 3] x Hm [W, sw] -> [B, sh, sw, 3]
            t = jnp.einsum('iy,byxc->bixc', v, base_norm)
            scaled = jnp.einsum('bixc,xj->bijc', t, hm)
            probs, reg = self.pnet.apply({'params': params['pnet']}, scaled)
        return self._pnet_select(probs, reg, level)

    def _pnet_select(self, probs, reg, level):
        """One level's P-Net heads -> fixed-size pruned candidate set.

        probs: [B, gh, gw]; each cell -> 12x12 window at stride 2 in the
        scaled image -> divide by scale for original coordinates.
        """
        scale = self.scales[level]
        b, gh, gw = probs.shape

        base = pnet_base_boxes(gh, gw, scale,
                               self.pnet_box_convention)  # [gh,gw,4]
        base = jnp.broadcast_to(base[None], (b, gh, gw, 4))

        boxes = apply_bbox_regression(base.reshape(b, -1, 4),
                                      reg.reshape(b, -1, 4))
        scores = probs.reshape(b, -1)
        valid = scores >= self.thresholds[0]

        # per-level NMS 0.5 after top-k pre-selection to bound K. This is
        # candidate pruning (R-Net re-scores everything downstream), so the
        # cheap TPU forms are used: approximate top-k instead of a full
        # sort over the (up to ~26k-cell) level grid, and one-shot matrix
        # NMS instead of the K-step greedy loop — together they cut the
        # P-Net stage from ~12.7 to ~8 ms/batch16 (measured; greedy NMS
        # and exact sort remain on the final O-Net outputs).
        k = min(self.k_pnet, boxes.shape[1])
        overflow = _overflow_count(valid, k)
        boxes, scores, valid = jax.vmap(
            partial(top_k_boxes, k=k, approx=True))(boxes, scores, valid)
        keep = batched_nms_mask(boxes, scores, valid, 0.5, algorithm='fast')
        return boxes, scores, valid & keep, overflow

    def _pnet_pyramid(self, params, base_norm):
        """ALL pyramid levels through ONE fused Pallas kernel
        (pallas_pnet.py v4): per-level resize matmuls emit flat channel
        planes, the planes concatenate along lanes in the v4 segment
        layout, and the single pallas_call runs conv1+pool+conv2+conv3+
        heads for every level with shared VMEM weights. Returns per-level
        (boxes, scores, valid, overflow) like `_pnet_level`."""
        from facenet_tpu.detectors.mtcnn.pallas_pnet import (
            pack_v3, pnet_forward_pyramid, pyramid_plan)

        packed = pack_v3(params['pnet'])
        plan, total_in, _ = pyramid_plan(self._flat_geom)
        b = base_norm.shape[0]

        segments = []
        for level, lv in enumerate(plan):
            v, _ = self._resize_mats[level]
            sh, sw_pad, _ = self._flat_geom[level]
            t = jnp.einsum('iy,byxc->bixc', v, base_norm)
            planes = jnp.einsum('bixc,xj->bcij', t, self._flat_hm[level])
            planes = planes.reshape(b, 3, sh * sw_pad)
            segments.append(jnp.pad(
                planes, ((0, 0), (0, 0), (0, lv['seg_in'] - sh * sw_pad))))
        planes_concat = jnp.concatenate(segments, axis=2)

        # 'pyramid-dots' = v5 shifted-dot assembly experiment;
        # 'pyramid-skip' = assembly-cost timing probe (WRONG numerics,
        # benchmarking only — see pallas_pnet._make_v4_kernel)
        assembly = {'pyramid-dots': 'dots',
                    'pyramid-skip': 'skip'}.get(self.pnet_impl, 'patch')
        heads = pnet_forward_pyramid(
            packed, planes_concat, self._flat_geom,
            interpret=self.pnet_impl == 'pyramid-interpret',
            assembly=assembly)
        return [self._pnet_select(probs, reg, level)
                for level, (probs, reg) in enumerate(heads)]

    def _detect(self, params, images):
        images_f32 = images.astype(jnp.float32)
        b = images.shape[0]

        # ---- stage 1: P-Net over the pyramid (one normalize pass, then
        # bf16 resizes — see _pnet_level)
        base_norm = normalize_crops(images_f32).astype(jnp.bfloat16)
        all_boxes, all_scores, all_valid = [], [], []
        # Per-image counts of valid candidates dropped at each fixed-capacity
        # top-k (dense crowd scenes can exceed the buffers; the counts make
        # that truncation visible instead of silent).
        overflow = {}
        overflow['pnet_level'] = jnp.zeros((b,), jnp.int32)
        if self.pnet_impl.startswith('pyramid'):
            per_level = self._pnet_pyramid(params, base_norm)
        else:
            pnet_packed = None
            if self.pnet_impl != 'flax':
                from facenet_tpu.detectors.mtcnn.pallas_pnet import pack_v3
                pnet_packed = pack_v3(params['pnet'])
            per_level = [self._pnet_level(params, base_norm, level,
                                          pnet_packed)
                         for level in range(len(self.scales))]
        for bx, sc, va, ov in per_level:
            all_boxes.append(bx)
            all_scores.append(sc)
            all_valid.append(va)
            overflow['pnet_level'] = overflow['pnet_level'] + ov

        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)

        # cross-level NMS 0.7 on the top-K_pnet proposals (still candidate
        # pruning — fast forms, see _pnet_level)
        overflow['pnet'] = _overflow_count(valid, self.k_pnet)
        boxes, scores, valid = jax.vmap(
            partial(top_k_boxes, k=self.k_pnet, approx=True))(
                boxes, scores, valid)
        keep = batched_nms_mask(boxes, scores, valid, 0.7, algorithm='fast')
        valid = valid & keep
        boxes = square_boxes(boxes)

        # ---- stage 2: R-Net on 24x24 crops
        overflow['rnet'] = _overflow_count(valid, self.k_rnet)
        boxes, scores, valid = jax.vmap(
            partial(top_k_boxes, k=self.k_rnet))(boxes, scores, valid)
        # f32 interp: the crop stage is gather-bound, and bf16 interp
        # matmuls measured 0.94x/0.96x (crop24/crop48) in an interleaved
        # 5-round A/B (tools/time_crop_dtype.py) — the casts cost more
        # than the halved matmul traffic saves.
        crops = crop_and_resize(images_f32, boxes, 24)  # [B,K,24,24,3]
        flat = crops.reshape((-1, 24, 24, 3))
        probs, reg = self.rnet.apply({'params': params['rnet']},
                                     normalize_crops(flat))
        probs = probs.reshape(b, -1)
        reg = reg.reshape(b, -1, 4)

        valid = valid & (probs >= self.thresholds[1])
        scores = probs
        # candidate pruning before O-Net re-scores — fast NMS
        keep = batched_nms_mask(boxes, scores, valid, 0.7, algorithm='fast')
        valid = valid & keep
        boxes = square_boxes(apply_bbox_regression(boxes, reg))

        # ---- stage 3: O-Net on 48x48 crops
        overflow['onet'] = _overflow_count(valid, self.k_onet)
        boxes, scores, valid = jax.vmap(
            partial(top_k_boxes, k=self.k_onet))(boxes, scores, valid)
        crops = crop_and_resize(images_f32, boxes, 48)  # f32: see stage 2
        flat = crops.reshape((-1, 48, 48, 3))
        probs, reg, lmk = self.onet.apply({'params': params['onet']},
                                          normalize_crops(flat))
        probs = probs.reshape(b, -1)
        reg = reg.reshape(b, -1, 4)
        lmk = lmk.reshape(b, -1, 10)

        valid = valid & (probs >= self.thresholds[2])
        scores = probs

        # landmarks are predicted relative to the (square) box
        w = (boxes[..., 2] - boxes[..., 0])[..., None]
        h = (boxes[..., 3] - boxes[..., 1])[..., None]
        lx = boxes[..., 0:1] + lmk[..., 0:5] * w
        ly = boxes[..., 1:2] + lmk[..., 5:10] * h
        landmarks = jnp.stack([lx, ly], axis=-1)             # [B,K,5,2]

        boxes = apply_bbox_regression(boxes, reg)
        keep = batched_nms_mask(boxes, scores, valid, 0.7, mode='min')
        valid = valid & keep

        # Compact VALID detections to the front, best score first. Slot
        # order up to here is the stage-3 entry order (R-Net top-k), so
        # an O-Net-rejected candidate can sit AHEAD of a valid face —
        # fixed-capacity consumers that read the first `num_faces` slots
        # (facenet_tpu/pipeline.py FacePipeline) would then miss real
        # detections (latent until the round-5 retrained bundle reordered
        # R-Net scores; tests/test_detection.py pins the invariant).
        order = jnp.argsort(-jnp.where(valid, scores, -1.0), axis=-1)
        boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
        scores = jnp.take_along_axis(scores, order, axis=1)
        landmarks = jnp.take_along_axis(landmarks, order[..., None, None],
                                        axis=1)
        valid = jnp.take_along_axis(valid, order, axis=1)

        return {
            'boxes': boxes,                  # [B, K_onet, 4] (x1,y1,x2,y2)
            'scores': jnp.where(valid, scores, 0.0),
            'landmarks': landmarks,          # [B, K_onet, 5, 2]
            'valid': valid,
            # per-image candidates lost to each capacity (see _overflow_count)
            'overflow': overflow,
        }

    # ------------------------------------------------------------------
    def detect_batch_async(self, images):
        """Dispatch the cascade on a uint8 [B, H, W, 3] batch and return
        the on-device output dict WITHOUT waiting for it.

        JAX's async dispatch returns as soon as the transfer + computation
        are enqueued, so a caller can keep decoding/transferring batch
        n+1 while batch n runs (detect_files pipelines this two deep).
        Pass the result to `finalize_batch` to fetch host arrays."""
        images = jnp.asarray(images)
        if images.shape[1:3] != self.image_shape:
            raise ValueError(
                f'expected {self.image_shape} images, got {images.shape[1:3]}'
                ' — use letterbox_batch()')
        return self._detect_jit(self.params, images)

    def finalize_batch(self, out_device):
        """Fetch a `detect_batch_async` result and report capacity drops."""
        out = jax.device_get(out_device)
        totals = ((stage, int(counts.sum()))
                  for stage, counts in out['overflow'].items())
        dropped = {stage: n for stage, n in totals if n > 0}
        if dropped:
            from facenet_tpu.logging import logger
            logger.warning(
                'MTCNN capacity overflow: dropped valid proposals %s '
                '(raise max_proposals/max_refined/max_outputs for dense '
                'scenes)', dropped)
        return out

    def detect_batch(self, images):
        """Detect faces in a uint8 [B, H, W, 3] batch (H, W must match
        image_shape; letterbox first via `letterbox_batch` if needed)."""
        return self.finalize_batch(self.detect_batch_async(images))

    def align_batch(self, images, landmarks, out_size=160):
        """Landmark-based alignment of detected faces (one face per image)."""
        key = int(out_size)
        if key not in self._align_jit:
            self._align_jit[key] = jax.jit(
                lambda imgs, lmk: align_by_landmarks(imgs, lmk, key))
        return jax.device_get(
            self._align_jit[key](jnp.asarray(images, jnp.float32),
                                 jnp.asarray(landmarks)))


def letterbox_batch(images, target_shape):
    """Host-side: pad/scale arbitrary-size images to a fixed shape.

    Uses the C++ letterbox (native/imageio.cc) when the native library is
    available — ~6x the serial PIL path — with PIL as fallback; both share
    the geometry formula in `native.letterbox_geometry`.

    Accepts grayscale [H, W] / [H, W, 1] (broadcast to RGB) and RGBA
    [H, W, 4] (alpha dropped) inputs — the native letterbox reads exactly
    H*W*3 bytes, so shape normalization here is a memory-safety contract,
    not a convenience.

    Returns (batch [B, H, W, 3] uint8, scales [B], pads [B, 2]) such that
    original_coords = (letterboxed_coords - pad) / scale.
    """
    from facenet_tpu import native

    th, tw = int(target_shape[0]), int(target_shape[1])
    out = np.zeros((len(images), th, tw, 3), np.uint8)
    scales = np.zeros((len(images),), np.float32)
    pads = np.zeros((len(images), 2), np.float32)
    use_native = native.available()

    for i, img in enumerate(images):
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.ndim == 3 and img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        elif img.ndim == 3 and img.shape[2] == 4:
            img = img[:, :, :3]
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f'image {i}: expected [H, W, (1|3|4)] or '
                             f'[H, W], got shape {img.shape}')
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        h, w = img.shape[:2]
        scale, (left, top) = native.letterbox_geometry(h, w, (th, tw))
        scales[i] = scale
        pads[i] = (left, top)
        if use_native:
            out[i] = native.letterbox_array(img, (th, tw))
        else:
            from PIL import Image
            # binary32 like letterbox_geometry/imageio.cc, so the canvas
            # placement matches the pads computed above bit-for-bit
            f32 = np.float32
            nh = max(1, min(int(f32(h) * f32(scale) + f32(0.5)), th))
            nw = max(1, min(int(f32(w) * f32(scale) + f32(0.5)), tw))
            if (nh, nw) != (h, w):
                img = np.asarray(Image.fromarray(img).resize(
                    (nw, nh), Image.BILINEAR))
            out[i, top:top + nh, left:left + nw] = img

    return out, scales, pads
