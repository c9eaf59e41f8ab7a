"""Detect + align faces for a whole dataset into per-class PNG thumbnails.

Parity: reference apps/extract_faces.py — but detection runs BATCHED
through the jitted TPU cascade instead of one sess.run per image
(the reference hot loop, SURVEY.md §3.2).

Alignment modes (`image.align`):
- 'crop' (default): margin-expanded box crop + resize, the reference's
  exact geometry (ref detectors/face_detector.py:9-26), from the
  full-resolution original via PIL.
- 'landmarks': 5-point similarity alignment to the canonical template
  (the capability the reference delegates to the pip `mtcnn` package);
  runs batched on device (ops/image_ops.align_by_landmarks) over the
  letterboxed detector frame. MTCNN only (FRCNN emits no landmarks);
  boxes without landmarks fall back to the margin crop.
"""

import click
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from facenet_tpu import config, dataset, h5utils, ioutils
from facenet_tpu.detectors.face_detector import FaceDetector, image_processing

DETECT_BATCH = 32


def _load_chunk(paths, mode):
    """Decode a chunk of files; returns (arrays, pils, ok_paths, n_failed).

    The native C++ decoder (3x PIL single-thread) does the heavy lift; the
    PIL object the crop step needs is built from the decoded array. PIL
    handles formats the native decoder doesn't (JPEG/PNG only)."""
    from facenet_tpu import native

    use_native = native.available() and mode == 'RGB'
    arrays, pils, ok_paths = [], [], []
    failed = 0
    for path in paths:
        arr = None
        if use_native:
            arr = native.decode_image_native_size(path)
            if arr is not None:
                pil = ioutils.array2pil(arr)
        if arr is None:
            try:
                pil = ioutils.read_image(path)
                arr = ioutils.pil2array(pil, mode=mode)
            except Exception:
                failed += 1
                continue
        arrays.append(arr)
        pils.append(pil)
        ok_paths.append(path)
    return arrays, pils, ok_paths, failed


def _crop_name(base, n):
    """Output path for the n-th face of one image (suffix _n past the first)."""
    if n == 0:
        return base
    return base.parent / f'{base.stem}_{n}{base.suffix}'


class _LandmarkAligner:
    """Batched device-side 5-point alignment for the 'landmarks' mode.

    Items from one decode chunk are letterboxed to their detector bucket
    (landmarks mapped through the same geometry), padded to a fixed
    capacity so each (bucket, out_size) pair compiles exactly once, and
    warped in one dispatch."""

    def __init__(self, detector, out_size, capacity=DETECT_BATCH):
        self.detector = detector
        self.size = int(out_size)
        self.capacity = int(capacity)
        self._jit = {}

    def _align_fn(self, shape):
        if shape not in self._jit:
            import jax
            from facenet_tpu.ops.image_ops import align_by_landmarks
            self._jit[shape] = jax.jit(
                lambda imgs, lmk: align_by_landmarks(imgs, lmk, self.size))
        return self._jit[shape]

    def __call__(self, arrays, items):
        """items: [(img_idx, n, BoundingBox with landmarks)] ->
        {(img_idx, n): uint8 [S, S, 3] crop}."""
        from facenet_tpu.detectors.mtcnn.cascade import letterbox_batch

        out = {}
        by_shape = {}
        for item in items:
            h, w = arrays[item[0]].shape[:2]
            by_shape.setdefault(self.detector.route_shape(h, w),
                                []).append(item)
        for shape, group in by_shape.items():
            for start in range(0, len(group), self.capacity):
                sub = group[start:start + self.capacity]
                batch, scales, pads = letterbox_batch(
                    [arrays[i] for i, _, _ in sub], shape)
                lmk = np.stack(
                    [box.landmarks * scales[j] + pads[j][None, :]
                     for j, (_, _, box) in enumerate(sub)]
                ).astype(np.float32)
                pad_n = self.capacity - len(sub)
                if pad_n:
                    batch = np.concatenate(
                        [batch, np.zeros((pad_n,) + batch.shape[1:],
                                         batch.dtype)])
                    lmk = np.concatenate(
                        [lmk, np.tile(lmk[-1:], (pad_n, 1, 1))])
                crops = np.asarray(
                    self._align_fn(shape)(batch.astype(np.float32), lmk))
                for j, (i, n, _) in enumerate(sub):
                    out[(i, n)] = np.clip(
                        crops[j] + 0.5, 0, 255).astype(np.uint8)
        return out


def _extract_class(cls, detector, options, counters, pool, aligner=None):
    """Detect every image of one class in cascade-sized batches and write
    the aligned crops + face-size records.

    Decode runs one chunk ahead on `pool` so the host decodes chunk n+1
    while the device cascade detects chunk n (the crop step needs the
    full-resolution original, so this path decodes once at native size
    rather than reusing detect_files' letterboxed stream)."""
    class_dir = options.outdir / cls.name
    ioutils.makedirs(class_dir)
    single_face_only = not bool(options.detect_multiple_faces)

    chunks = [cls.files[s:s + DETECT_BATCH]
              for s in range(0, cls.nrof_images, DETECT_BATCH)]
    pending = pool.submit(_load_chunk, chunks[0], detector.mode) \
        if chunks else None
    for i in range(len(chunks)):
        arrays, pils, ok_paths, failed = pending.result()
        pending = pool.submit(_load_chunk, chunks[i + 1], detector.mode) \
            if i + 1 < len(chunks) else None
        counters['unreadable'] += failed
        if not arrays:
            continue

        detections = detector.detect_images(arrays)
        aligned = {}
        if aligner is not None:
            items = [(j, n, box)
                     for j, boxes in enumerate(detections)
                     if boxes and not (single_face_only and len(boxes) > 1)
                     for n, box in enumerate(boxes)
                     if box.landmarks is not None]
            aligned = aligner(arrays, items)

        for j, (pil, path, boxes) in enumerate(zip(pils, ok_paths,
                                                   detections)):
            if not boxes or (single_face_only and len(boxes) > 1):
                continue
            counters['faces'] += 1
            base = class_dir / (Path(path).stem + '.png')
            for n, box in enumerate(boxes):
                if (j, n) in aligned:
                    crop = ioutils.array2pil(aligned[(j, n)])
                else:
                    crop = image_processing(pil, box, options.image)
                out = _crop_name(base, n)
                ioutils.write_image(crop, out)
                h5utils.write(options.h5file,
                              h5utils.filename2key(out, 'size'),
                              np.uint32((box.height, box.width)))


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    options = config.extract_faces(__file__, {'config': options['config_file']})

    dbase = dataset.DBase(options.dataset)
    ioutils.write_text_log(options.logfile, dbase)
    print('input dataset:', dbase)
    print('output directory', options.outdir)
    print('output h5 file  ', options.h5file)

    det_kwargs = {}
    if options.detector_shapes:
        # multi-bucket letterbox geometry: list of [H, W] buckets sharing
        # one weight set; inputs route per size (face_detector.route_shape)
        det_kwargs['image_shapes'] = [tuple(int(v) for v in s)
                                      for s in options.detector_shapes]
    detector = FaceDetector(detector=options.detector or 'mtcnn',
                            weights=options.detector_weights or None,
                            **det_kwargs)
    ioutils.write_text_log(options.logfile, detector)
    print(detector)

    aligner = None
    if str(options.image.align or 'crop') == 'landmarks':
        aligner = _LandmarkAligner(detector,
                                   config.value_or(options.image.size, 160))
        print('alignment: 5-point landmark similarity warp (device)')

    counters = {'faces': 0, 'unreadable': 0}
    with ThreadPoolExecutor(max_workers=1) as pool:
        for cls in dbase.classes:
            _extract_class(cls, detector, options, counters, pool,
                           aligner=aligner)

    out_dbase = dataset.DBase(dataset.DefaultConfig(options.outdir))
    ioutils.write_text_log(options.logfile, out_dbase)
    ioutils.write_text_log(
        options.logfile,
        f"Number of files that cannot be read {counters['unreadable']}")
    ioutils.write_text_log(
        options.logfile, f"Number of extracted faces {counters['faces']}")

    print('Number of extracted faces', counters['faces'])
    print('Logs have been written to the file', options.logfile)


if __name__ == '__main__':
    main()
