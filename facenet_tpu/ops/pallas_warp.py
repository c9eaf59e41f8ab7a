"""Pallas TPU kernel for the dense (gather-free) affine warp.

`image_ops.dense_warp` already replaces the per-pixel gather warp with
broadcast-built two-tap weights and an MXU matmul, but in XLA the
[pixels, W, C] product of the row-matmul has to round-trip HBM before the
column weights reduce it (36 ms/batch64 for 160x160 crops from 224x224
intermediates — memory-bound: bf16 matmuls don't move it at all,
tools/try_align.py). This kernel fuses the whole warp so nothing but the
source block and the finished crop ever touch HBM:

  for each (image b, block i of `bs` output rows):
      (q, r)  = output pixel coords                  (iota, SMEM matrix)
      in_x/in_y = affine(q, r), clamped              (VPU)
      wy[p, h]  = relu(1 - |h - in_y[p]|)            (VPU, iota - no gather)
      rows      = wy @ src[h, w*3+c]                 (MXU, bf16 -> f32)
      wx3[p, l] = relu(1 - |l//3 - in_x[p]|)         (VPU, channel-expanded)
      out[p, c] = (rows * wx3) @ sel[l, c]           (MXU 0/1 selector)

The kernel is fully static: shapes, grid, and both matmuls are fixed at
trace time; the ONLY data-dependence is in weight VALUES, so none of the
Mosaic gather/dynamic-slice restrictions apply. The source image lives in
VMEM for the whole row sweep (index_map is constant in i), so HBM traffic
is one source read + one crop write per image.

Used by `image_ops.align_by_landmarks(method='dense')` on TPU for the
rotation stage after the separable-matmul crop. Rebuilds the alignment
capability the reference delegates to the pip `mtcnn` package
(reference detectors/face_detector.py:63-66); measured numbers live in
tools/try_align.py and CLAUDE.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8      # output rows per grid step (pixels = BLOCK_ROWS * ow)


def _warp_kernel(mref, iref, oref, *, t, oh, ow, bs):
    # mref holds ALL images' matrices ([B, 6] in SMEM — Mosaic requires
    # SMEM blocks to span whole dims, and 6 scalars/image is tiny)
    bi = pl.program_id(0)
    i = pl.program_id(1)
    m00, m01, m02 = mref[bi, 0], mref[bi, 1], mref[bi, 2]
    m10, m11, m12 = mref[bi, 3], mref[bi, 4], mref[bi, 5]

    p = bs * ow
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    q = (pix % ow).astype(jnp.float32)                   # out x
    r = (pix // ow + i * bs).astype(jnp.float32)         # out y

    # clamping source COORDS gives _bilinear_sample's edge-replicate
    # semantics once the two-tap weights are built from the clamped value
    in_x = jnp.clip(m00 * q + m01 * r + m02, 0.0, t - 1.0)   # [p, 1]
    in_y = jnp.clip(m10 * q + m11 * r + m12, 0.0, t - 1.0)

    # Mosaic's tpu.iota is integer-only; build int32 and cast
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (p, t), 1) \
        .astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(lane_h - in_y))      # [p, t]

    rows = jnp.dot(wy.astype(jnp.bfloat16), iref[0],
                   preferred_element_type=jnp.float32)       # [p, t*3]

    lane_w = (jax.lax.broadcasted_iota(jnp.int32, (p, 3 * t), 1)
              // 3).astype(jnp.float32)
    wx3 = jnp.maximum(0.0, 1.0 - jnp.abs(lane_w - in_x))     # [p, t*3]

    # de-interleave channels: 0/1 selector matmul instead of a stride-3
    # lane reshape (minor-dim reshapes are Mosaic relayouts; a matmul
    # with K=3t, N=8 is effectively free on the MXU)
    li = jax.lax.broadcasted_iota(jnp.int32, (3 * t, 8), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (3 * t, 8), 1)
    sel = (li % 3 == ci).astype(jnp.float32)
    oref[0] = jnp.dot(rows * wx3, sel,
                      preferred_element_type=jnp.float32)    # [p, 8]


def dense_warp_pallas(images, matrices, out_size, block_rows=BLOCK_ROWS,
                      interpret=False):
    """Fused gather-free affine warp (see module docstring).

    :param images: [B, T, T, 3] source crops (any dtype; matmul in bf16)
    :param matrices: [B, 2, 3] output pixel (x, y, 1) -> source (x, y)
    :param out_size: (height, width) of the output crops
    :param block_rows: output rows per grid step; oh % block_rows == 0
    :param interpret: run in Pallas interpret mode (CPU tests)
    :return: [B, oh, ow, 3] float32
    """
    oh, ow = int(out_size[0]), int(out_size[1])
    b, t, t2, c = images.shape
    if c != 3 or t != t2:
        raise ValueError(f'expected square [B, T, T, 3] source, got '
                         f'{images.shape}')
    bs = int(block_rows)
    if oh % bs:
        raise ValueError(f'out height {oh} not divisible by {bs}')

    src = images.astype(jnp.bfloat16).reshape(b, t, t * 3)
    mats = matrices.astype(jnp.float32).reshape(b, 6)

    out = pl.pallas_call(
        partial(_warp_kernel, t=t, oh=oh, ow=ow, bs=bs),
        grid=(b, oh // bs),
        in_specs=[
            pl.BlockSpec((b, 6), lambda bi, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t, t * 3), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs * ow, 8), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, oh * ow, 8), jnp.float32),
        interpret=interpret,
    )(mats, src)
    return out[:, :, :3].reshape(b, oh, ow, 3)
