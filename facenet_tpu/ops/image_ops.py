"""Batched image sampling ops: crop-and-resize and affine (similarity) warps.

These are the device-side equivalents of the host-side PIL crop/resize the
reference does one image at a time (reference detectors/face_detector.py:9-26)
and the landmark-based alignment the reference delegates to the external
`mtcnn` package (SURVEY.md §2 #13). Everything is batched, fixed-shape, and
bilinear — gathers on the VPU, no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample(image, ys, xs):
    """Sample one [H, W, C] image at float coords (ys, xs) [..., ] -> [..., C].

    Out-of-bounds samples clamp to the edge (sufficient for face crops which
    are mostly inside; MTCNN zero-pads, but clamping avoids a second mask and
    differs only on border pixels of partially-outside boxes).
    """
    h, w = image.shape[0], image.shape[1]

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    # BOTH taps clip from the UNCLIPPED floor: deriving tap 1 from the
    # clipped tap 0 made samples at negative coords interpolate between
    # pixels 0 and 1 with inverted weights instead of clamping to the
    # edge (top/left borders got wrong content, asymmetric with
    # bottom/right which clamped correctly)
    y0f = y0.astype(jnp.int32)
    x0f = x0.astype(jnp.int32)
    y0i = jnp.clip(y0f, 0, h - 1)
    y1i = jnp.clip(y0f + 1, 0, h - 1)
    x0i = jnp.clip(x0f, 0, w - 1)
    x1i = jnp.clip(x0f + 1, 0, w - 1)

    f = image.astype(jnp.float32)
    v00 = f[y0i, x0i]
    v01 = f[y0i, x1i]
    v10 = f[y1i, x0i]
    v11 = f[y1i, x1i]

    wy = wy[..., None]
    wx = wx[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _interp_matrix(lo, hi, n, s):
    """[s, n] two-tap bilinear interpolation matrix for box range [lo, hi).

    Row i holds the clamped bilinear weights of output sample i (pixel
    centers at half steps); applying it as a matmul is exactly the gather
    formulation's math, but runs on the MXU — axis-aligned crop+resize is
    separable, and TPUs do dense matmuls far faster than 2D gathers
    (measured 2.2x end-to-end on the cascade's crop stage, v5e).
    """
    grid = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    coords = lo + grid * (hi - lo) - 0.5
    c0 = jnp.floor(coords)
    w = coords - c0
    # clip both taps from the unclipped floor (see _bilinear_sample): a
    # sample left of pixel 0 must take pixel 0 twice (true edge clamp),
    # not blend pixels 0 and 1 with inverted weights
    c0f = c0.astype(jnp.int32)
    c0i = jnp.clip(c0f, 0, n - 1)
    c1i = jnp.clip(c0f + 1, 0, n - 1)
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    return ((pos == c0i[:, None]) * (1 - w)[:, None] +
            (pos == c1i[:, None]) * w[:, None])


def crop_and_resize(images, boxes, out_size, compute_dtype=jnp.float32):
    """Crop boxes from a batch of images and resize to out_size x out_size.

    Separable bilinear sampling as two batched MXU matmuls (Y then X
    interpolation) instead of per-pixel gathers.

    :param images: [B, H, W, C] (any dtype; sampled in compute_dtype)
    :param boxes: [B, K, 4] pixel-coordinate (x1, y1, x2, y2) boxes
    :param out_size: output side length S
    :param compute_dtype: matmul element type. f32 (default) is exact
        bilinear AND measured faster at the cascade's crop geometries
        (bf16 was 0.94-0.96x — the interp matmuls are too small for the
        bf16 rate to matter; see tools/time_crop_dtype.py). bfloat16
        stays available for large-crop callers where HBM traffic
        dominates, at ~1 LSB crop error.
    :return: [B, K, S, S, C] float32 crops
    """
    s = int(out_size)
    b, h, w, c = images.shape

    def per_box(box):
        ry = _interp_matrix(box[1], box[3], h, s)    # [S, H]
        rx = _interp_matrix(box[0], box[2], w, s)    # [S, W]
        return ry, rx

    ry, rx = jax.vmap(jax.vmap(per_box))(boxes)      # [B,K,S,H], [B,K,S,W]
    ry = ry.astype(compute_dtype)
    rx = rx.astype(compute_dtype)

    k = boxes.shape[1]
    f = images.astype(compute_dtype).reshape(b, h, w * c)
    # Stack the K boxes' interp rows into ONE tall [K*S, H] operand per
    # image: XLA does NOT merge the (k, s) dims of 'bksh,bhd->bksd' into
    # the matmul M dim, leaving M = S = 24-48 rows on a 128-row MXU. The
    # explicit reshape makes M = K*S and is bit-exact; measured 2.23x
    # (K=64 S=24) / 3.65x (K=32 S=48) at batch 64 on v5e
    # (tools/try_crop_stacked.py).
    rows = jnp.einsum('bmh,bhd->bmd', ry.reshape(b, k * s, h), f,
                      preferred_element_type=jnp.float32)
    rows = rows.reshape(b, k, s, w, c).astype(compute_dtype)
    return jnp.einsum('bkswc,bktw->bkstc', rows, rx,
                      preferred_element_type=jnp.float32)


def affine_warp(images, matrices, out_size):
    """Warp images by per-image 2x3 affine matrices (output -> input coords).

    :param images: [B, H, W, C]
    :param matrices: [B, 2, 3] mapping output pixel (x, y, 1) to input (x, y)
    :param out_size: (height, width) of the output
    :return: [B, h, w, C] float32
    """
    oh, ow = int(out_size[0]), int(out_size[1])
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing='ij')

    def warp_one(image, m):
        in_x = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
        in_y = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
        return _bilinear_sample(image, in_y, in_x)

    return jax.vmap(warp_one)(images, matrices)


def dense_warp(images, matrices, out_size, chunk=8):
    """Gather-free affine warp: dense two-tap bilinear weights + matmuls.

    Identical math to `affine_warp` (same clamp-to-edge semantics, agrees
    to f32 rounding) but built for TPU: the tap weight for source row h is
    exactly relu(1 - |h - src_y|), so the whole weight plane comes from a
    broadcast against an iota — no gather anywhere — and the row
    contraction is one MXU matmul per image. 2-D gathers are the slowest
    thing XLA lowers on TPU (90 ms/batch64 for a 160x160 warp from
    [480, 640] sources, ~1.05x even from a flat 1-D index form), while
    this runs the same warp at 2.5x and, from a pre-cropped small source,
    leaves the warp HBM-bound on the [pixels, W, C] intermediate
    (tools/try_align.py, v5e).

    Cost scales with the SOURCE area: use `align_by_landmarks` (crop to a
    small intermediate first) rather than calling this on full scenes.

    :param images: [B, H, W, C] (any dtype; computed in float32)
    :param matrices: [B, 2, 3] output pixel (x, y, 1) -> input (x, y)
    :param out_size: (height, width) of the output
    :param chunk: images per lax.map step bounding the [oh*ow, W, C]
        intermediate's footprint
    :return: [B, h, w, C] float32
    """
    oh, ow = int(out_size[0]), int(out_size[1])
    b, h, w, c = images.shape
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing='ij')
    row_idx = jnp.arange(h, dtype=jnp.float32)
    col_idx = jnp.arange(w, dtype=jnp.float32)

    def warp_one(image, m):
        # clamping the source COORDS before building two-tap weights is
        # exactly _bilinear_sample's clamp-both-taps-from-unclipped-floor
        # edge behavior (out-of-range samples replicate the edge pixel)
        in_x = jnp.clip(m[0, 0] * xs + m[0, 1] * ys + m[0, 2], 0., w - 1.)
        in_y = jnp.clip(m[1, 0] * xs + m[1, 1] * ys + m[1, 2], 0., h - 1.)
        wy = jnp.maximum(0., 1. - jnp.abs(row_idx[None, :]
                                          - in_y.reshape(-1)[:, None]))
        wx = jnp.maximum(0., 1. - jnp.abs(col_idx[None, :]
                                          - in_x.reshape(-1)[:, None]))
        rows = wy @ image.astype(jnp.float32).reshape(h, w * c)    # MXU
        rows = rows.reshape(oh * ow, w, c)
        out = jnp.sum(rows * wx[:, :, None], axis=1)               # VPU
        return out.reshape(oh, ow, c)

    if b <= chunk:
        return jax.vmap(warp_one)(images, matrices)
    pad = (-b) % chunk
    images = jnp.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0)))
    matrices = jnp.pad(matrices, ((0, pad), (0, 0), (0, 0)))
    out = jax.lax.map(
        lambda t: jax.vmap(warp_one)(*t),
        (images.reshape(-1, chunk, h, w, c),
         matrices.reshape(-1, chunk, 2, 3)))
    return out.reshape(-1, oh, ow, c)[:b]


# canonical 5-point template for 112x112 aligned face crops (ArcFace layout:
# left eye, right eye, nose, left mouth corner, right mouth corner)
CANONICAL_LANDMARKS_112 = np.array([
    [38.2946, 51.6963],
    [73.5318, 51.5014],
    [56.0252, 71.7366],
    [41.5493, 92.3655],
    [70.7299, 92.2041],
], dtype=np.float32)


def canonical_landmarks(out_size):
    """Scale the canonical 5-point template to an out_size x out_size crop."""
    return CANONICAL_LANDMARKS_112 * (float(out_size) / 112.0)


def similarity_transform_from_points(src, dst):
    """Least-squares similarity transform (Umeyama) mapping src -> dst.

    :param src: [N, 2] source points (e.g. detected landmarks)
    :param dst: [N, 2] target points (canonical template)
    :return: [2, 3] matrix M with dst ~ M @ [src, 1]
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)

    src_mean = jnp.mean(src, axis=0)
    dst_mean = jnp.mean(dst, axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean

    src_var = jnp.mean(jnp.sum(src_c ** 2, axis=1))

    cov = (dst_c.T @ src_c) / src.shape[0]
    u, s, vt = jnp.linalg.svd(cov)

    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    dsign = jnp.array([1.0, 0.0]) + jnp.array([0.0, 1.0]) * d
    rotation = (u * dsign[None, :]) @ vt
    scale = (s[0] + s[1] * d) / jnp.maximum(src_var, 1e-10)

    a = scale * rotation
    t = dst_mean - a @ src_mean
    return jnp.concatenate([a, t[:, None]], axis=1)


def invert_affine(m):
    """Invert a [2, 3] affine matrix."""
    a = m[:, :2]
    t = m[:, 2]
    inv_a = jnp.linalg.inv(a)
    inv_t = -inv_a @ t
    return jnp.concatenate([inv_a, inv_t[:, None]], axis=1)


def align_by_landmarks(images, landmarks, out_size, method='auto'):
    """Landmark-based face alignment: warp each image so its 5 landmarks land
    on the canonical template (the MTCNN landmark-crop capability,
    BASELINE.json north_star).

    Methods (tools/try_align.py, 480x640 scenes, batch 64, v5e):

    - 'gather': one bilinear gather warp from the full source. Exact
      single resample, but 2-D gathers are pathologically slow on TPU
      (90 ms/batch64, and the cost barely moves with source size).
    - 'dense': axis-aligned `crop_and_resize` onto a small intermediate
      (handles scale; separable MXU matmuls), then a gather-free dense
      warp for the rotation — the fused Pallas kernel on TPU
      (9.8 ms/batch64, 9.2x; ops/pallas_warp.py), the XLA `dense_warp`
      elsewhere (36 ms, 2.5x). Geometry is composed exactly through the
      crop's half-pixel convention — on linear images the two methods
      agree to f32 rounding — at the cost of ONE extra bilinear
      resample (measured mean abs 1.8 / p99 12 on noise-background
      synthetic scenes; far less on smooth content).
    - 'auto': 'dense' on TPU, 'gather' elsewhere (CPU gathers are fast
      and exact; the dense form's FLOPs only pay off on the MXU).

    :param images: [B, H, W, C]
    :param landmarks: [B, 5, 2] (x, y) detected landmarks
    :param out_size: side length of aligned output crops
    :param method: 'auto' | 'gather' | 'dense'
    :return: [B, out_size, out_size, C] float32 aligned crops
    """
    s = int(out_size)
    template = jnp.asarray(canonical_landmarks(s))
    if method == 'auto':
        method = ('dense' if jax.default_backend() in ('tpu', 'axon')
                  else 'gather')

    def matrix_one(lm):
        fwd = similarity_transform_from_points(lm, template)
        return invert_affine(fwd)     # output pixel -> input pixel

    matrices = jax.vmap(matrix_one)(landmarks)
    if method == 'gather':
        return affine_warp(images, matrices, (s, s))

    # intermediate side: enough resolution for the out quad at any
    # rotation (sqrt(2) coverage) plus tap margin, lane-friendly
    t = int(-(-int(s * 1.4 + 16) // 8) * 8)

    def geometry(inv):
        # source-space bbox of the output square under the warp
        corners = jnp.asarray([[0.0, 0.0], [s - 1.0, 0.0], [0.0, s - 1.0],
                               [s - 1.0, s - 1.0]])
        src = corners @ inv[:, :2].T + inv[:, 2]
        lo = jnp.min(src, axis=0) - 4.0
        hi = jnp.max(src, axis=0) + 4.0
        box = jnp.concatenate([lo, hi])          # (x1, y1, x2, y2)
        # compose out->src with the crop's mapping: crop sample i reads
        # source lo + (i + .5) / t * (hi - lo) - .5, so source coord x_s
        # lands at intermediate index (x_s + .5 - lo) * t/(hi-lo) - .5
        sc = t / (hi - lo)
        a = inv[:, :2] * sc[:, None]
        off = (inv[:, 2] + 0.5 - lo) * sc - 0.5
        return box, jnp.concatenate([a, off[:, None]], axis=1)

    boxes, mats = jax.vmap(geometry)(matrices)
    inter = crop_and_resize(images, boxes[:, None, :], t)[:, 0]
    if (jax.default_backend() in ('tpu', 'axon') and s % 8 == 0
            and images.shape[-1] == 3):
        # fused kernel: 9.8 ms/batch64 vs 36.5 XLA dense vs 90 gather
        # (tools/try_pallas_warp.py, v5e; parity max 0.75 LSB)
        from facenet_tpu.ops.pallas_warp import dense_warp_pallas
        return dense_warp_pallas(inter, mats, (s, s))
    return dense_warp(inter, mats, (s, s))
