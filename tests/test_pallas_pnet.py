"""Equivalence of the fused Pallas P-Net kernel with the flax path.

Runs in interpret mode (CPU-safe); the cascade uses the compiled kernel
on TPU only (detectors/mtcnn/cascade.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from facenet_tpu.detectors.mtcnn import pallas_pnet
from facenet_tpu.detectors.mtcnn.networks import PNet, normalize_crops

import jax


@pytest.fixture(scope='module')
def pnet_params():
    net = PNet()
    return net, net.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 24, 24, 3)))['params']


@pytest.mark.parametrize('shape', [(24, 24), (61, 83), (40, 129)])
@pytest.mark.slow
def test_pallas_pnet_matches_flax(pnet_params, shape):
    net, params = pnet_params
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (2,) + shape + (3,)).astype(np.float32)
    xn = np.asarray(normalize_crops(jnp.asarray(x)))

    p_ref, r_ref = net.apply({'params': params}, xn)

    w = pallas_pnet.pack_weights(params)
    p_new, r_new = pallas_pnet.pnet_forward_pallas(
        w, np.transpose(xn, (0, 3, 1, 2)), interpret=True)

    assert p_new.shape == p_ref.shape and r_new.shape == r_ref.shape
    assert float(jnp.max(jnp.abs(p_ref - p_new))) < 0.02
    assert float(jnp.max(jnp.abs(r_ref - r_new))) < 0.05


@pytest.mark.slow
def test_out_geometry_matches_flax(pnet_params):
    net, params = pnet_params
    for sh, sw in [(12, 12), (13, 17), (30, 30), (47, 61)]:
        p, _ = net.apply({'params': params},
                         jnp.zeros((1, sh, sw, 3), jnp.float32))
        assert pallas_pnet.out_geometry(sh, sw) == p.shape[1:], (sh, sw)


def test_pack_weights_shapes(pnet_params):
    _, params = pnet_params
    w = pallas_pnet.pack_weights(params)
    assert w['w1'].shape == (27, 10)
    assert w['w2'].shape == (90, 16)
    assert w['w3'].shape == (144, 32)
    assert w['wc'].shape == (32, 2) and w['wr'].shape == (32, 4)
    assert all(w[k].dtype == np.float32 for k in pallas_pnet.WEIGHT_KEYS)


# ---------------------------------------------------------------------------
# v3 flat-lane kernel (the production cascade path on TPU)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('shape', [(24, 100), (61, 83), (40, 129)])
def test_v3_flat_matches_flax(pnet_params, shape):
    """The flat-lane kernel must agree with the flax P-Net on arbitrary
    level geometry, including non-128-multiple widths (lane padding +
    validity masking) and garbage beyond the true width."""
    net, params = pnet_params
    sh, true_sw = shape
    sw = -(-true_sw // 128) * 128

    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (2, sh, true_sw, 3)).astype(np.float32)
    xn = np.asarray(normalize_crops(jnp.asarray(x)))
    p_ref, r_ref = net.apply({'params': params}, xn)

    # flat planes: [B, 3, sh*sw] with garbage (not zeros) past true_sw
    pad = rng.normal(0, 3, (2, sh, sw, 3)).astype(np.float32)
    pad[:, :, :true_sw, :] = xn
    planes = np.transpose(pad, (0, 3, 1, 2)).reshape(2, 3, sh * sw)

    packed = pallas_pnet.pack_v3(params)
    p_new, r_new = pallas_pnet.pnet_forward_flat(
        packed, jnp.asarray(planes), sh, sw, true_sw, interpret=True)

    assert p_new.shape == p_ref.shape and r_new.shape == r_ref.shape
    assert float(jnp.max(jnp.abs(p_ref - p_new))) < 0.02
    assert float(jnp.max(jnp.abs(r_ref - r_new))) < 0.05


def test_pack_v3_shapes(pnet_params):
    _, params = pnet_params
    w = pallas_pnet.pack_v3(params)
    assert w['w1'].shape == (16, 72)
    assert w['w2'].shape == (16, 144)
    assert w['w3'].shape == (32, 144)
    assert w['wh'].shape == (8, 32)
    assert w['b1'].shape == (16, 1) and w['bh'].shape == (8, 1)
    for k in pallas_pnet.V3_KEYS:
        assert k in w


@pytest.mark.slow
def test_cascade_flat_matches_flax_on_scene():
    """End-to-end cascade equivalence: the flat P-Net backend must find
    the same faces as the flax backend with the bundled trained weights
    (boxes within bf16 drift, identical valid sets)."""
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    from facenet_tpu.detectors.pretrained import load_bundled
    from facenet_tpu.utils.synthetic import render_scene

    params = load_bundled('mtcnn')
    rng = np.random.RandomState(5)
    img, _, _ = render_scene(rng, shape=(192, 192), n_faces=4,
                             min_face=30, max_face=80)
    imgs = img[None]

    kw = dict(image_shape=(192, 192), params=params)
    out_a = MTCNN(pnet_impl='flax', **kw).detect_batch(imgs)
    out_b = MTCNN(pnet_impl='flat-interpret', **kw).detect_batch(imgs)

    va, vb = np.asarray(out_a['valid']), np.asarray(out_b['valid'])
    np.testing.assert_array_equal(va, vb)
    assert va.sum() >= 2  # the scene produces real detections
    b_a = np.asarray(out_a['boxes'], np.float32)[va]
    b_b = np.asarray(out_b['boxes'], np.float32)[vb]
    assert np.abs(b_a - b_b).max() < 1.5
    s_a = np.asarray(out_a['scores'], np.float32)[va]
    s_b = np.asarray(out_b['scores'], np.float32)[vb]
    assert np.abs(s_a - s_b).max() < 0.02


# ---------------------------------------------------------------------------
# v4 whole-pyramid fusion (round 4)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize('assembly', ['patch', 'dots'])
def test_v4_pyramid_matches_flax(pnet_params, assembly):
    """The fused all-levels kernel must agree with the flax P-Net on every
    level of a small pyramid, with garbage between segments — both the
    production patch-matrix path and the v5 shifted-dots variant."""
    net, params = pnet_params
    flat_geom = []
    levels = []
    rng = np.random.RandomState(2)
    for sh, true_sw in [(40, 129), (29, 92), (21, 66)]:
        sw = -(-true_sw // 128) * 128
        x = rng.randint(0, 256, (2, sh, true_sw, 3)).astype(np.float32)
        xn = np.asarray(normalize_crops(jnp.asarray(x)))
        pad = rng.normal(0, 3, (2, sh, sw, 3)).astype(np.float32)
        pad[:, :, :true_sw, :] = xn
        levels.append((xn, np.transpose(pad, (0, 3, 1, 2))
                       .reshape(2, 3, sh * sw)))
        flat_geom.append((sh, sw, true_sw))

    plan, total_in, _ = pallas_pnet.pyramid_plan(flat_geom)
    segs = []
    for (xn, planes), lv in zip(levels, plan):
        seg = rng.normal(0, 3, (2, 3, lv['seg_in'])).astype(np.float32)
        seg[:, :, :planes.shape[2]] = planes   # garbage padding after data
        segs.append(seg)
    concat = jnp.asarray(np.concatenate(segs, axis=2))
    assert concat.shape[2] == total_in

    packed = pallas_pnet.pack_v3(params)
    heads = pallas_pnet.pnet_forward_pyramid(packed, concat, flat_geom,
                                             interpret=True,
                                             assembly=assembly)
    assert len(heads) == len(levels)
    for (xn, _), (p_new, r_new) in zip(levels, heads):
        p_ref, r_ref = net.apply({'params': params}, xn)
        assert p_new.shape == p_ref.shape and r_new.shape == r_ref.shape
        assert float(jnp.max(jnp.abs(p_ref - p_new))) < 0.02
        assert float(jnp.max(jnp.abs(r_ref - r_new))) < 0.05


@pytest.mark.slow
def test_cascade_pyramid_matches_flax_on_scene():
    """End-to-end cascade equivalence of the fused pyramid backend."""
    from facenet_tpu.detectors.mtcnn.cascade import MTCNN
    from facenet_tpu.detectors.pretrained import load_bundled
    from facenet_tpu.utils.synthetic import render_scene

    params = load_bundled('mtcnn')
    rng = np.random.RandomState(5)
    img, _, _ = render_scene(rng, shape=(192, 192), n_faces=4,
                             min_face=30, max_face=80)
    imgs = img[None]

    kw = dict(image_shape=(192, 192), params=params)
    out_a = MTCNN(pnet_impl='flax', **kw).detect_batch(imgs)
    out_b = MTCNN(pnet_impl='pyramid-interpret', **kw).detect_batch(imgs)

    va, vb = np.asarray(out_a['valid']), np.asarray(out_b['valid'])
    np.testing.assert_array_equal(va, vb)
    assert va.sum() >= 2
    b_a = np.asarray(out_a['boxes'], np.float32)[va]
    b_b = np.asarray(out_b['boxes'], np.float32)[vb]
    assert np.abs(b_a - b_b).max() < 1.5
    s_a = np.asarray(out_a['scores'], np.float32)[va]
    s_b = np.asarray(out_b['scores'], np.float32)[vb]
    assert np.abs(s_a - s_b).max() < 0.02
