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


def align_by_landmarks(images, landmarks, out_size):
    """Landmark-based face alignment: warp each image so its 5 landmarks land
    on the canonical template (the MTCNN landmark-crop capability,
    BASELINE.json north_star).

    :param images: [B, H, W, C]
    :param landmarks: [B, 5, 2] (x, y) detected landmarks
    :param out_size: side length of aligned output crops
    :return: [B, out_size, out_size, C] float32 aligned crops
    """
    template = jnp.asarray(canonical_landmarks(out_size))

    def matrix_one(lm):
        fwd = similarity_transform_from_points(lm, template)
        return invert_affine(fwd)     # output pixel -> input pixel

    matrices = jax.vmap(matrix_one)(landmarks)
    return affine_warp(images, matrices, (out_size, out_size))
