"""Single-dispatch face pipeline: scenes -> aligned face embeddings.

The reference runs this as three host-mediated stages — per-image
`sess.run` detection (reference apps/extract_faces.py:37-85), PIL
margin-crop (reference detectors/face_detector.py:9-26), then a second
frozen-graph session for embeddings (reference facenet/__init__.py:73-84).
`FacePipeline` fuses the whole chain into ONE jitted XLA computation:
MTCNN cascade -> alignment (margin crop or 5-point landmark warp) ->
fused embedding forward, so a batch of scenes costs a single dispatch
and XLA schedules across stage boundaries.

Measured (v5e single chip, 480x640 scenes, batch 64,
tools/bench_detect_e2e.py): the fused crop chain runs 2,181 aligned
embeddings/s vs 1,368 for the same stages as three chained jits — the
per-dispatch tunnel cost and the inter-stage scheduling gaps are the
difference. The landmark-warp chain (crop + fused Pallas dense warp,
ops/pallas_warp.py) runs 1,587 emb/s fused.

Alignment modes:
- 'crop': margin-expanded box crop resized straight to the model input
  (the reference's alignment geometry; its PIL path additionally
  enlarges the canvas to size*(1+margin) before the embedding model
  re-resizes — here the crop lands directly on the model's input size).
- 'landmarks': 5-point similarity warp to the canonical template
  (beyond the reference in-tree surface; the pip `mtcnn` capability).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from facenet_tpu.config import Config


class FacePipeline:
    """Fused detect -> align -> embed over fixed-shape uint8 scene batches.

    :param model: a `facenet_tpu.FaceNet`, a model Config, or an exported
        model directory path (anything FaceNet accepts)
    :param image_shape: (H, W) the cascade compiles for; letterbox inputs
        to this shape first (detectors.mtcnn.cascade.letterbox_batch)
    :param align: 'crop' (reference margin-crop geometry) | 'landmarks'
    :param margin: box-relative margin fraction for align='crop'
    :param num_faces: embedding slots per image (first `num_faces`
        cascade outputs; `valid` marks real detections)
    :param detector_kwargs: forwarded to the MTCNN cascade (thresholds,
        capacities, weights via `params`, ...)
    """

    def __init__(self, model, image_shape=(480, 640), align='crop',
                 margin=0.2, num_faces=1, **detector_kwargs):
        import jax
        from facenet_tpu import FaceNet
        from facenet_tpu.detectors.face_detector import FaceDetector

        if not isinstance(model, FaceNet):
            if isinstance(model, (str, Path)):
                model = Config({'path': str(model), 'normalize': True})
            model = FaceNet(model)
        self.facenet = model
        if align not in ('crop', 'landmarks'):
            raise ValueError(f"align must be 'crop' or 'landmarks', "
                             f'got {align!r}')
        self.align = align
        self.margin = float(margin)
        self.num_faces = int(num_faces)
        self.image_shape = (int(image_shape[0]), int(image_shape[1]))

        detector = FaceDetector(detector='mtcnn',
                                image_shape=self.image_shape,
                                **detector_kwargs)
        self.backend = detector.backend_for(self.image_shape)

        fwd = self.facenet._forward
        if hasattr(fwd, '_fwd') and hasattr(fwd, 'params'):
            # fused fast path (irv1_fast/irv2_fast FastEmbedder, bf16 or
            # int8): params ride as jit ARGS, not trace constants
            self._embed_params = fwd.params
            embed_fn = fwd._fwd
        else:
            self._embed_params = self.facenet.variables
            mdl, norm = self.facenet.model, self.facenet.normalize
            embed_fn = lambda p, x: mdl.apply(p, x, train=False,
                                              normalize=norm)
        size = int(self.facenet.model.image_size)
        self._step = jax.jit(self._build_step(embed_fn, size))

    def _build_step(self, embed_fn, size):
        import jax.numpy as jnp
        from facenet_tpu.ops.image_ops import (align_by_landmarks,
                                               crop_and_resize)

        backend = self.backend
        k = self.num_faces
        margin = self.margin
        mode = self.align

        def step(cascade_params, embed_params, images):
            out = backend._detect(cascade_params, images)
            if mode == 'landmarks':
                crops = jnp.stack(
                    [align_by_landmarks(images.astype(jnp.float32),
                                        out['landmarks'][:, j], size)
                     for j in range(k)], axis=1)        # [B, k, S, S, 3]
            else:
                boxes = out['boxes'][:, :k]
                wh = boxes[..., 2:4] - boxes[..., 0:2]
                lo = boxes[..., 0:2] - wh * (margin / 2)
                hi = boxes[..., 2:4] + wh * (margin / 2)
                crops = crop_and_resize(
                    images.astype(jnp.float32),
                    jnp.concatenate([lo, hi], axis=-1), size)
            b = images.shape[0]
            flat = jnp.clip(crops + 0.5, 0, 255).astype(jnp.uint8) \
                .reshape(b * k, size, size, 3)
            emb = embed_fn(embed_params, flat)
            return {
                'embeddings': emb.reshape(b, k, -1),
                'boxes': out['boxes'][:, :k],
                'scores': out['scores'][:, :k],
                'valid': out['valid'][:, :k],
                'landmarks': out['landmarks'][:, :k],
                'overflow': out['overflow'],
            }

        return step

    def dispatch(self, images):
        """Async fused step: returns un-fetched device arrays so callers
        can overlap host work with device compute (see process_files)."""
        import jax
        if not isinstance(images, jax.Array):
            images = np.asarray(images, dtype=np.uint8)
        if images.shape[1:3] != self.image_shape:
            raise ValueError(
                f'expected {self.image_shape} scenes, got '
                f'{images.shape[1:3]} — letterbox first '
                '(detectors.mtcnn.cascade.letterbox_batch)')
        return self._step(self.backend.params, self._embed_params, images)

    def process_batch(self, images):
        """uint8 [B, H, W, 3] scenes -> dict with 'embeddings'
        [B, num_faces, D] float32 (L2-normed where 'valid'), 'boxes',
        'scores', 'valid', 'landmarks' (scene pixel coordinates)."""
        import jax
        out = jax.device_get(self.dispatch(images))
        out.pop('overflow')
        return out

    def process_files(self, paths, batch_size=64):
        """Image files -> (embeddings [N, num_faces, D], boxes, valid),
        decode+letterbox on the native C++ pool one batch ahead of the
        device (same overlap as FaceDetector.detect_files); boxes map
        back to original pixels through the letterbox geometry."""
        from facenet_tpu import native
        from facenet_tpu.detectors.mtcnn.cascade import letterbox_batch
        from facenet_tpu import ioutils

        paths = [str(p) for p in paths]
        n = len(paths)
        k, d = self.num_faces, self.facenet.embedding_size
        embeddings = np.zeros((n, k, d), np.float32)
        boxes = np.zeros((n, k, 4), np.float32)
        valid = np.zeros((n, k), bool)

        def load(chunk):
            arrays, idxs = [], []
            for j in chunk:
                try:
                    if native.available():
                        arr = native.decode_image_native_size(paths[j])
                    else:
                        arr = None
                    if arr is None:
                        arr = ioutils.pil2array(ioutils.read_image(paths[j]))
                except Exception:
                    continue
                arrays.append(arr)
                idxs.append(j)
            if not arrays:
                return None
            batch, scales, pads = letterbox_batch(arrays, self.image_shape)
            pad_n = batch_size - len(arrays)
            if pad_n:
                batch = np.concatenate(
                    [batch, np.zeros((pad_n,) + batch.shape[1:],
                                     batch.dtype)])
            return batch, scales, pads, idxs

        def collect(out_d, geom):
            import jax
            out = jax.device_get(out_d)
            _, scales, pads, idxs = geom
            for row, j in enumerate(idxs):
                embeddings[j] = out['embeddings'][row]
                valid[j] = out['valid'][row]
                b = out['boxes'][row]
                b = (b - np.array([pads[row][0], pads[row][1]] * 2,
                                  np.float32)) / scales[row]
                boxes[j] = b

        chunks = [list(range(s, min(s + batch_size, n)))
                  for s in range(0, n, batch_size)]
        inflight = []
        geom = load(chunks[0]) if chunks else None
        for i in range(len(chunks)):
            nxt = load(chunks[i + 1]) if i + 1 < len(chunks) else None
            if geom is not None:
                inflight.append((self.dispatch(geom[0]), geom))
                if len(inflight) > 1:
                    collect(*inflight.pop(0))
            geom = nxt
        for item in inflight:
            collect(*item)
        return embeddings, boxes, valid

    def __repr__(self):
        return (f'class {type(self).__name__}\n'
                f'align: {self.align}\n'
                f'image shape: {self.image_shape}\n'
                f'faces per image: {self.num_faces}')
