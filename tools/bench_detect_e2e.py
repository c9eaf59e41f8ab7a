"""End-to-end detection throughput: JPEG files -> boxes, including decode,
letterbox, and the TPU cascade (VERDICT r2 next #3).

Writes N synthetic scenes as JPEGs, then times FaceDetector.detect_files
(native C++ threaded decode+letterbox feeding the jitted cascade). Prints
per-stage numbers: pure host decode+letterbox rate, cascade-only rate, and
the end-to-end JPEG->boxes rate.

Usage: python tools/bench_detect_e2e.py [n_images] [batch]
Ref being rebuilt: the reference's extract_faces JPEG->crops loop
(reference apps/extract_faces.py:37-85, one sess.run per image).
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from PIL import Image
    from facenet_tpu import native
    from facenet_tpu.detectors.face_detector import FaceDetector
    from facenet_tpu.utils.synthetic import render_scene

    assert native.available(), 'native library required for this bench'

    tmp = Path(tempfile.mkdtemp(prefix='bench_detect_'))
    rng = np.random.RandomState(0)
    sizes = [(480, 640), (360, 480), (600, 800)]
    paths = []
    for i in range(n_images):
        h, w = sizes[i % len(sizes)]
        img, _, _ = render_scene(rng, shape=(h, w), n_faces=rng.randint(1, 4),
                                 min_face=60, max_face=240)
        p = tmp / f'{i:04d}.jpg'
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    print(f'{n_images} scenes written to {tmp}', flush=True)

    det = FaceDetector(detector='mtcnn', image_shape=(480, 640))

    # warmup: compile the cascade
    det.detect_files(paths[:batch], batch_size=batch)

    # --- host only: threaded decode + letterbox
    loader = native.NativeBatchLoader([str(p) for p in paths], (480, 640),
                                      mode=native.MODE_LETTERBOX)
    batches = [list(range(s, min(s + batch, len(paths))))
               for s in range(0, len(paths), batch)]
    t0 = time.perf_counter()
    n_ok = 0
    for images, ok in loader.iterate(batches):
        n_ok += int(ok.sum())
    t_host = time.perf_counter() - t0
    loader.close()
    print(f'host decode+letterbox: {n_images / t_host:8.1f} img/s '
          f'({1000 * t_host / n_images:.2f} ms/img, {n_ok} ok)', flush=True)

    # --- cascade only (device, pre-letterboxed batch resident on host)
    imgs = np.stack([np.asarray(Image.open(p).convert('RGB').resize(
        (640, 480))) for p in paths[:batch]])
    for _ in range(2):
        det._backend.detect_batch(imgs)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        det._backend.detect_batch(imgs)
    t_dev = (time.perf_counter() - t0) / iters
    print(f'cascade only:          {batch / t_dev:8.1f} img/s '
          f'({1000 * t_dev:.2f} ms/batch{batch})', flush=True)

    # --- end to end: JPEG files -> boxes
    t0 = time.perf_counter()
    results = det.detect_files(paths, batch_size=batch)
    t_e2e = time.perf_counter() - t0
    n_faces = sum(len(r) for r in results)
    print(f'end-to-end JPEG->boxes:{n_images / t_e2e:8.1f} img/s '
          f'({1000 * t_e2e / n_images:.2f} ms/img; {n_faces} faces in '
          f'{n_images} images)', flush=True)

    aligned_embeddings_rate(batch=max(batch, 64))


def aligned_embeddings_rate(batch=64, iters=8, chains=None):
    """Device chain: detect -> landmark-align -> embed, aligned
    embeddings/s on one chip (the BASELINE.json north-star unit — 20k/s
    on a v5e-8 implies >=2,500 aligned crops/s/chip).

    One face per image (the extract_faces default); the three jitted
    stages (cascade, align, fused embed) chain through device arrays, and
    the timing loop chains iterations through the output so the wall
    clock measures true serialized throughput.

    :param chains: subset of ('crop', 'warp', 'fused-crop', 'fused-warp')
        to time (each first run pays a remote compile); default all four.
    """
    import jax
    import jax.numpy as jnp

    from facenet_tpu.detectors.face_detector import FaceDetector
    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models.irv1_fast import build_fast_params, fast_forward
    from facenet_tpu.ops.image_ops import align_by_landmarks
    from facenet_tpu.utils.synthetic import render_scene

    rng = np.random.RandomState(0)
    imgs = np.stack([render_scene(rng, shape=(480, 640), n_faces=1,
                                  min_face=120, max_face=320)[0]
                     for _ in range(batch)])
    imgs_d = jax.device_put(imgs)

    det = FaceDetector(detector='mtcnn', image_shape=(480, 640))
    backend = det._backend

    model = create_model()
    variables = model.init(jax.random.PRNGKey(0), imgs[:1, :160, :160],
                           train=False)
    fparams, fcfg = build_fast_params(variables)
    embed = jax.jit(lambda p, x: fast_forward(p, fcfg, x))

    align = jax.jit(lambda im, lm: align_by_landmarks(
        im.astype(jnp.float32), lm, 160))

    from facenet_tpu.ops.image_ops import crop_and_resize

    def margin_crop(im, boxes, margin=0.2):
        # the reference's extract_faces geometry: margin-expanded BOX crop
        # (ref face_detector.py:9-26) — axis-aligned, so it runs on the
        # separable-matmul crop (2.4 ms/batch64 vs ~90 ms for the gather
        # warp; tools/try_align.py)
        wh = boxes[:, 2:4] - boxes[:, 0:2]
        lo = boxes[:, 0:2] - wh * (margin / 2)
        hi = boxes[:, 2:4] + wh * (margin / 2)
        b = jnp.concatenate([lo, hi], axis=1)[:, None, :]
        return crop_and_resize(im.astype(jnp.float32), b, 160)[:, 0]

    crop = jax.jit(margin_crop)

    def timed_chain(stage, fused=False):
        def step(x):
            # fused: the whole detect->align->embed step is ONE jit (one
            # dispatch through the tunnel, XLA free to fuse across stages)
            detect = backend._detect if fused else backend._detect_jit
            out = detect(backend.params, x)
            if stage == 'warp':
                aligned = align_by_landmarks(
                    x.astype(jnp.float32), out['landmarks'][:, 0], 160) \
                    if fused else align(x, out['landmarks'][:, 0])
            else:
                aligned = (margin_crop if fused else crop)(
                    x, out['boxes'][:, 0])
            emb_fn = ((lambda p, a: fast_forward(p, fcfg, a))
                      if fused else embed)
            emb = emb_fn(fparams, aligned.astype(jnp.uint8))
            probe = emb[0, 0] + out['scores'].sum()
            return probe, x + (probe * 0).astype(jnp.uint8)

        if fused:
            step = jax.jit(step)
        probe = None
        cur = imgs_d
        for _ in range(2):
            probe, cur = step(cur)
        float(np.asarray(probe))
        t0 = time.perf_counter()
        for _ in range(iters):
            probe, cur = step(cur)
        float(np.asarray(probe))
        return (time.perf_counter() - t0) / iters

    chains = chains or ('crop', 'warp', 'fused-crop', 'fused-warp')
    if 'crop' in chains:
        dt = timed_chain('crop')
        print(f'detect->crop->embed:   {batch / dt:8.1f} aligned emb/s '
              f'({1000 * dt:.2f} ms/batch{batch}; reference margin-crop '
              'geometry)', flush=True)
    if 'warp' in chains:
        dt = timed_chain('warp')
        print(f'detect->warp->embed:   {batch / dt:8.1f} aligned emb/s '
              f'({1000 * dt:.2f} ms/batch{batch}; landmark rotation warp)',
              flush=True)
    if 'fused-crop' in chains:
        dt = timed_chain('crop', fused=True)
        print(f'fused crop chain:      {batch / dt:8.1f} aligned emb/s '
              f'({1000 * dt:.2f} ms/batch{batch}; one dispatch)', flush=True)
    if 'fused-warp' in chains:
        dt = timed_chain('warp', fused=True)
        print(f'fused warp chain:      {batch / dt:8.1f} aligned emb/s '
              f'({1000 * dt:.2f} ms/batch{batch}; one dispatch)', flush=True)


if __name__ == '__main__':
    main()
