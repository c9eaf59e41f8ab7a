"""Parity tests for the fused Pallas dense warp (ops/pallas_warp.py).

Interpret mode on the CPU mesh: the kernel's math must match the gather
warp (`affine_warp`) to bf16 rounding — same clamp-to-edge semantics,
same bilinear taps. The real-chip speed numbers live in
tools/try_align.py / CLAUDE.md.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from facenet_tpu.ops import image_ops
from facenet_tpu.ops.pallas_warp import dense_warp_pallas


def _rot(th, tx, ty):
    return np.array([[np.cos(th), -np.sin(th), tx],
                     [np.sin(th), np.cos(th), ty]], np.float32)


def test_pallas_warp_matches_gather():
    rng = np.random.RandomState(0)
    imgs = rng.uniform(0, 255, (3, 48, 48, 3)).astype(np.float32)
    mats = np.stack([_rot(0.3, 4.0, -2.0), _rot(-0.2, -3.0, 6.0),
                     _rot(0.0, 0.0, 0.0)])
    a = np.asarray(image_ops.affine_warp(jnp.asarray(imgs),
                                         jnp.asarray(mats), (16, 24)))
    b = np.asarray(dense_warp_pallas(jnp.asarray(imgs), jnp.asarray(mats),
                                     (16, 24), interpret=True))
    # bf16 source/weight rounding: ~0.5 LSB on the 0-255 scale
    assert np.abs(a - b).max() < 2.0


def test_pallas_warp_identity():
    rng = np.random.RandomState(1)
    imgs = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    mats = np.tile(np.eye(2, 3, dtype=np.float32)[None], (1, 1, 1))
    out = np.asarray(dense_warp_pallas(jnp.asarray(imgs),
                                       jnp.asarray(mats), (32, 32),
                                       interpret=True))
    assert np.abs(out - imgs).max() < 2.0


def test_pallas_warp_edge_clamp():
    # a translation pushing samples outside must replicate the edge,
    # exactly like _bilinear_sample
    imgs = np.tile(np.arange(16, dtype=np.float32)[None, :, None, None]
                   * 10.0, (1, 1, 16, 3)).transpose(0, 2, 1, 3)
    # imgs[0, y, x, c] = 10*x ; shift sampling left out of the image
    mats = np.array([[[1.0, 0.0, -8.0], [0.0, 1.0, 0.0]]], np.float32)
    a = np.asarray(image_ops.affine_warp(jnp.asarray(imgs),
                                         jnp.asarray(mats), (16, 16)))
    b = np.asarray(dense_warp_pallas(jnp.asarray(imgs), jnp.asarray(mats),
                                     (16, 16), interpret=True))
    assert np.abs(a - b).max() < 1.0
    # the first 8 columns clamp to column 0
    assert np.abs(b[0, :, :8, :]).max() < 1.0


def test_pallas_warp_rejects_bad_shapes():
    imgs = np.zeros((1, 16, 20, 3), np.float32)
    mats = np.zeros((1, 2, 3), np.float32)
    with pytest.raises(ValueError):
        dense_warp_pallas(jnp.asarray(imgs), jnp.asarray(mats), (8, 8),
                          interpret=True)
    with pytest.raises(ValueError):
        dense_warp_pallas(jnp.zeros((1, 16, 16, 3)), jnp.asarray(mats),
                          (9, 8), interpret=True)
