"""Detection facade: uniform `detect(image) -> [BoundingBox]` API.

Parity with the reference facade (reference detectors/face_detector.py:99-122):
the same `FaceDetector` / `BoundingBox` / margin-crop `image_processing`
surface, but the backend is the native TPU MTCNN cascade
(facenet_tpu/detectors/mtcnn/) instead of the external pip package; the
'pypimtcnn' detector name is accepted as an alias. Single-image `detect` is
kept for API compatibility; `detect_batch` is the TPU-native fast path.
"""

from __future__ import annotations

import math

import numpy as np
from PIL import Image


def image_processing(image, box, options):
    """Margin-crop + resize a detected face (ref face_detector.py:9-26).

    :param image: PIL.Image
    :param box: BoundingBox
    :param options: config with `.size` and `.margin`
    """
    if not isinstance(image, Image.Image):
        raise ValueError('Input must be PIL.Image')

    margin = float(options.margin or 0)
    size = int(options.size)

    w_margin = round(box.width * margin / 2)
    h_margin = round(box.height * margin / 2)

    cropped = image.crop((box.left - w_margin, box.top - h_margin,
                          box.right + w_margin, box.bottom + h_margin))

    width = math.ceil(size + size * margin)
    height = math.ceil(size + size * margin)

    resampling = getattr(Image, 'Resampling', Image)
    return cropped.resize((width, height), resampling.LANCZOS)


class BoundingBox:
    """Integer-rounded face box with confidence (ref face_detector.py:29-60)."""

    def __init__(self, left, top, width, height, confidence=None,
                 landmarks=None):
        self.left = int(np.round(left))
        self.right = int(np.round(left + width)) + 1

        self.top = int(np.round(top))
        self.bottom = int(np.round(top + height)) + 1

        self.width = self.right - self.left - 1
        self.height = self.bottom - self.top - 1
        self.confidence = confidence
        self.landmarks = landmarks      # optional [5, 2] (x, y) points

    def info(self, mode=False):
        if mode is False:
            return '{}'.format([self.left, self.top, self.width, self.height,
                                self.confidence])
        return ('left = {}, top = {}, width = {}, height = {}, '
                'confidence = {}'.format(self.left, self.top, self.width,
                                         self.height, self.confidence))

    def __repr__(self):
        return self.info(mode=True)

    @property
    def left_upper(self):
        return self.left, self.top

    @property
    def right_lower(self):
        return self.right, self.bottom

    @property
    def confidence_as_string(self):
        return str(np.round(self.confidence, 3))


class FaceDetector:
    """Facade selecting a detection backend (ref face_detector.py:99-122).

    Supported:
      * 'mtcnn' — native TPU cascade ('pypimtcnn' is an alias);
      * 'frcnnv3' — native TPU two-stage Faster-RCNN
        (detectors/frcnn; the reference's frozen-TF1-graph variant shipped
        without weights, SURVEY.md §2 #14 — this is the trainable rebuild).
    """

    def __init__(self, detector='mtcnn', image_shape=(480, 640),
                 image_shapes=None, params=None, weights=None, **kwargs):
        """:param image_shape: the (single) letterbox geometry, as before.
        :param image_shapes: optional list of (H, W) letterbox buckets
            sharing one weight set. The reference detects on a
            native-resolution pyramid (ref face_detector.py:63-78); a
            single fixed letterbox shape instead shrinks a small face in
            a large photo below `min_face_size` (undetectable). With
            buckets, each input routes to the bucket that avoids
            downscaling where possible (`route_shape`); each bucket's
            cascade is built lazily on first use (one XLA compile per
            bucket actually exercised, not per configured bucket).
        """
        self.detector = detector

        if params is None and not weights:
            # Default to the committed bundle (trained on the synthetic
            # face dataset, quality-gated — detectors/pretrained.py), the
            # counterpart of the reference's dependence on the pretrained
            # pip `mtcnn` package (ref face_detector.py:63-66). `weights`
            # or `params` still override; random init only as a last
            # resort (and loudly).
            from facenet_tpu.detectors import pretrained
            params = pretrained.load_bundled(detector)
            if params is None:
                from facenet_tpu.logging import logger
                logger.warning(
                    f'no bundled weights for {detector!r}; using RANDOM '
                    'init — detections will be meaningless until trained '
                    '(apps/train_detector.py)')

        if detector in ('mtcnn', 'pypimtcnn'):
            self.mode = 'RGB'
            if params is None and weights:
                # pretrained det1/det2/det3.npy directory (the standard
                # davidsandberg/pip-mtcnn weight files; mtcnn/weights.py).
                # Those P-Net regressors were trained against the upstream
                # (2x+1)/11-wide base-box convention, so default to it
                # (an explicit pnet_box_convention kwarg still wins).
                from facenet_tpu.detectors.mtcnn.weights import (
                    load_davidsandberg_weights)
                params = load_davidsandberg_weights(weights)
                kwargs.setdefault('pnet_box_convention', 'caffe')

            def build(shape):
                from facenet_tpu.detectors.mtcnn.cascade import MTCNN
                backend = MTCNN(image_shape=shape, params=params, **kwargs)
                if params is not None:
                    from facenet_tpu.detectors.mtcnn.weights import (
                        validate_params)
                    validate_params(params, backend)
                return backend
        elif detector == 'frcnnv3':
            self.mode = 'RGB'
            if params is None and weights:
                if str(weights).endswith('.npz'):
                    # the repo's own bundle format (pretrained.save_params)
                    from facenet_tpu.detectors.pretrained import load_params
                    params = load_params(weights)
                else:
                    import numpy as _np
                    params = _np.load(weights, allow_pickle=True).item()

            def build(shape):
                from facenet_tpu.detectors.frcnn import FasterRCNN
                return FasterRCNN(image_shape=shape, params=params, **kwargs)
        else:
            raise ValueError(
                'Undefined face detector type {}'.format(detector))

        shapes = [tuple(int(v) for v in s)
                  for s in (image_shapes or [image_shape])]
        self.image_shapes = sorted(set(shapes), key=lambda s: s[0] * s[1])
        self._build_backend = build
        self._backends = {self.image_shapes[0]: build(self.image_shapes[0])}

    # kept name for callers that reach for the cascade directly
    @property
    def _mtcnn(self):
        return self._backend

    @property
    def _backend(self):
        """The smallest bucket's backend (the only one for single-shape)."""
        return self._backends[self.image_shapes[0]]

    def backend_for(self, shape):
        """The backend for one bucket, built (and jit-compiled) lazily."""
        shape = (int(shape[0]), int(shape[1]))
        if shape not in self._backends:
            self._backends[shape] = self._build_backend(shape)
        return self._backends[shape]

    def route_shape(self, h, w):
        """Pick the letterbox bucket for an (h, w) input.

        Maximizes min(letterbox_scale, 1): prefer any bucket that holds
        the image at native scale (upscaling costs nothing in recall),
        otherwise the bucket that downscales least; ties go to the
        smallest (cheapest) bucket because buckets are scanned
        smallest-area first.
        """
        h, w = max(int(h), 1), max(int(w), 1)
        best, best_key = None, None
        for th, tw in self.image_shapes:
            key = min(th / h, tw / w, 1.0)
            if best_key is None or key > best_key + 1e-9:
                best, best_key = (th, tw), key
        return best

    def detect(self, image):
        """Single-image detect -> list of BoundingBox (reference API)."""
        return self.detect_images([np.asarray(image)])[0]

    def detect_files(self, paths, batch_size=64):
        # default 64: per-image cascade throughput rises with batch
        # (measured v5e: 1,429 img/s @16, 1,907 @32, 2,368 @64 —
        # tools/profile_cascade.py round 4)
        """JPEG/PNG files -> per-file [BoundingBox] lists, decode+letterbox
        on the native C++ thread pool (VERDICT r2 next #3: the end-to-end
        detection path with the host off the critical path).

        The loader decodes batch n+1 while the cascade runs batch n; box
        coordinates are mapped back through the per-file letterbox geometry
        (header-only size probe — no second decode). Unreadable files get
        an empty list, matching the reference's unreadable-file tolerance
        (ref apps/extract_faces.py:48-54).

        Falls back to serial PIL decode + detect_images when the native
        library is unavailable.

        With multiple `image_shapes` buckets, files are routed by a
        header-only size probe and each bucket's subset runs through its
        own pipelined pass; results return in input order.
        """
        from facenet_tpu import native

        paths = [str(p) for p in paths]
        if len(self.image_shapes) > 1 and native.available():
            by_shape = {}
            for j, p in enumerate(paths):
                hw = native.probe_image(p)
                shape = (self.route_shape(*hw) if hw
                         else self.image_shapes[0])
                by_shape.setdefault(shape, []).append(j)
            results = [None] * len(paths)
            for shape, idxs in by_shape.items():
                sub = self._detect_files_single(
                    [paths[j] for j in idxs], batch_size,
                    self.backend_for(shape))
                for j, boxes in zip(idxs, sub):
                    results[j] = boxes
            return results
        return self._detect_files_single(paths, batch_size, self._backend)

    def _detect_files_single(self, paths, batch_size, backend):
        from facenet_tpu import native

        if not native.available():
            from facenet_tpu import ioutils
            results = []
            for start in range(0, len(paths), batch_size):
                chunk, readable = [], []
                for p in paths[start:start + batch_size]:
                    try:
                        chunk.append(ioutils.pil2array(
                            ioutils.read_image(p), mode=self.mode))
                        readable.append(True)
                    except Exception:
                        # empty list, NOT a dummy image — a zeros frame
                        # through the cascade can emit spurious boxes
                        readable.append(False)
                detected = iter(self.detect_images(chunk) if chunk else ())
                results.extend(next(detected) if ok else []
                               for ok in readable)
            return results

        shape = backend.image_shape
        # letterbox geometry comes from a header-only probe, filled in
        # PER BATCH as batches arrive (not as an O(N) serial prologue —
        # over a large corpus the upfront probe loop would idle the
        # device for its whole duration); the probe overlaps the
        # in-flight batches' device work.
        geom = {}

        def probe_batch(idxs):
            for j in idxs:
                hw = native.probe_image(paths[j])
                geom[j] = (native.letterbox_geometry(hw[0], hw[1], shape)
                           if hw else (1.0, (0.0, 0.0)))

        loader = native.NativeBatchLoader(paths, shape,
                                          mode=native.MODE_LETTERBOX)
        # Two-deep device pipeline when the backend supports async
        # dispatch (MTCNN): batch n+1's host->device transfer and cascade
        # overlap batch n's result fetch, so end-to-end throughput is
        # max(decode, transfer, cascade) rather than their sum. On a real
        # TPU host the PCIe transfer vanishes under the cascade; through
        # the axon dev tunnel the transfer dominates but still overlaps.
        dispatch = getattr(backend, 'detect_batch_async', None)
        finalize = getattr(backend, 'finalize_batch', None)
        try:
            batches = [list(range(s, min(s + batch_size, len(paths))))
                       for s in range(0, len(paths), batch_size)]
            results = []

            def collect(out, n, base):
                for i in range(n):
                    ok_i, (scale, (left, top)) = oks[base + i], geom[base + i]
                    results.append(self._boxes_from_output(
                        out, i, scale, left, top) if ok_i else [])

            oks = []
            if dispatch is None:
                for bi, (images, ok) in enumerate(loader.iterate(batches)):
                    oks.extend(bool(v) for v in ok)
                    probe_batch(batches[bi])
                    collect(backend.detect_batch(images),
                            len(images), len(results))
                return results

            from collections import deque
            inflight = deque()          # (device_out, n_images, base_row)
            base = 0
            for bi, (images, ok) in enumerate(loader.iterate(batches)):
                oks.extend(bool(v) for v in ok)
                inflight.append((dispatch(images), len(images), base))
                base += len(images)
                # probe AFTER dispatch: the headers read while the batch
                # (and its predecessors) run on device
                probe_batch(batches[bi])
                if len(inflight) > 2:
                    out_d, n, b = inflight.popleft()
                    collect(finalize(out_d), n, b)
            while inflight:
                out_d, n, b = inflight.popleft()
                collect(finalize(out_d), n, b)
            return results
        finally:
            loader.close()

    def _boxes_from_output(self, out, i, scale, pad_x, pad_y):
        """Map one image's cascade output back to original-pixel boxes."""
        landmarks = out.get('landmarks')
        boxes_i = []
        for k in range(out['boxes'].shape[1]):
            if not out['valid'][i, k]:
                continue
            x1, y1, x2, y2 = out['boxes'][i, k]
            x1 = (x1 - pad_x) / scale
            x2 = (x2 - pad_x) / scale
            y1 = (y1 - pad_y) / scale
            y2 = (y2 - pad_y) / scale
            lmk = None
            if landmarks is not None:
                lmk = ((landmarks[i, k] -
                        np.array([pad_x, pad_y], np.float32)[None, :])
                       / scale)
            boxes_i.append(BoundingBox(
                left=x1, top=y1, width=x2 - x1, height=y2 - y1,
                confidence=float(out['scores'][i, k]), landmarks=lmk))
        return boxes_i

    def detect_images(self, images):
        """Batched detect over arbitrary-size uint8 images.

        Letterboxes to the cascade geometry (per-image bucket routing when
        multiple `image_shapes` are configured), runs the jitted cascade
        per bucket batch, and maps boxes back to original pixels.
        """
        from facenet_tpu.detectors.mtcnn.cascade import letterbox_batch

        images = [np.asarray(img) for img in images]
        by_shape = {}
        for j, img in enumerate(images):
            shape = (self.route_shape(img.shape[0], img.shape[1])
                     if len(self.image_shapes) > 1 else self.image_shapes[0])
            by_shape.setdefault(shape, []).append(j)

        results = [None] * len(images)
        for shape, idxs in by_shape.items():
            backend = self.backend_for(shape)
            batch, scales, pads = letterbox_batch(
                [images[j] for j in idxs], backend.image_shape)
            out = backend.detect_batch(batch)
            for i, j in enumerate(idxs):
                results[j] = self._boxes_from_output(
                    out, i, scales[i], pads[i, 0], pads[i, 1])
        return results

    def __repr__(self):
        return (f'class {self.__class__.__name__}\n' +
                f'detector type: {self.detector}')
