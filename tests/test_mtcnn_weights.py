"""MTCNN pretrained-weight import (davidsandberg det{1,2,3}.npy layout)."""

import numpy as np
import pytest

from facenet_tpu.detectors.mtcnn import weights as w
from facenet_tpu.detectors.mtcnn.cascade import MTCNN


def _conv(h, wd, cin, cout, rng):
    return {'weights': rng.randn(h, wd, cin, cout).astype(np.float32) * 0.1,
            'biases': rng.randn(cout).astype(np.float32) * 0.01}


def _dense(cin, cout, rng):
    return {'weights': rng.randn(cin, cout).astype(np.float32) * 0.1,
            'biases': rng.randn(cout).astype(np.float32) * 0.01}


def _prelu(c, rng):
    return {'alpha': rng.rand(c).astype(np.float32)}


@pytest.fixture(scope='module')
def synthetic_dicts():
    rng = np.random.RandomState(0)
    det1 = {
        'conv1': _conv(3, 3, 3, 10, rng), 'PReLU1': _prelu(10, rng),
        'conv2': _conv(3, 3, 10, 16, rng), 'PReLU2': _prelu(16, rng),
        'conv3': _conv(3, 3, 16, 32, rng), 'PReLU3': _prelu(32, rng),
        'conv4-1': _conv(1, 1, 32, 2, rng), 'conv4-2': _conv(1, 1, 32, 4, rng),
    }
    det2 = {
        'conv1': _conv(3, 3, 3, 28, rng), 'prelu1': _prelu(28, rng),
        'conv2': _conv(3, 3, 28, 48, rng), 'prelu2': _prelu(48, rng),
        'conv3': _conv(2, 2, 48, 64, rng), 'prelu3': _prelu(64, rng),
        'conv4': _dense(576, 128, rng), 'prelu4': _prelu(128, rng),
        'conv5-1': _dense(128, 2, rng), 'conv5-2': _dense(128, 4, rng),
    }
    det3 = {
        'conv1': _conv(3, 3, 3, 32, rng), 'prelu1': _prelu(32, rng),
        'conv2': _conv(3, 3, 32, 64, rng), 'prelu2': _prelu(64, rng),
        'conv3': _conv(3, 3, 64, 64, rng), 'prelu3': _prelu(64, rng),
        'conv4': _conv(2, 2, 64, 128, rng), 'prelu4': _prelu(128, rng),
        'conv5': _dense(1152, 256, rng), 'prelu5': _prelu(256, rng),
        'conv6-1': _dense(256, 2, rng), 'conv6-2': _dense(256, 4, rng),
        'conv6-3': _dense(256, 10, rng),
    }
    return det1, det2, det3


def test_load_from_npy_files(tmp_path, synthetic_dicts):
    det1, det2, det3 = synthetic_dicts
    for name, d in [('det1', det1), ('det2', det2), ('det3', det3)]:
        np.save(tmp_path / f'{name}.npy', d, allow_pickle=True)

    params = w.load_davidsandberg_weights(tmp_path)
    det = MTCNN(image_shape=(128, 128), params=params)
    w.validate_params(params, det)

    # mapped leaves carry the source values
    np.testing.assert_array_equal(params['pnet']['conv1']['kernel'],
                                  det1['conv1']['weights'])
    np.testing.assert_array_equal(params['pnet']['prelu1']['alpha'],
                                  det1['PReLU1']['alpha'])
    np.testing.assert_array_equal(params['onet']['landmarks']['kernel'],
                                  det3['conv6-3']['weights'])

    # the cascade runs with imported weights
    imgs = np.random.RandomState(1).randint(
        0, 256, (2, 128, 128, 3), dtype=np.uint8)
    out = det.detect_batch(imgs)
    assert out['boxes'].shape[0] == 2
    assert np.isfinite(out['scores']).all()


def test_validate_catches_shape_mismatch(synthetic_dicts):
    det1, det2, det3 = synthetic_dicts
    params = {
        'pnet': w.pnet_params(det1),
        'rnet': w.rnet_params(det2),
        'onet': w.onet_params(det3),
    }
    params['pnet']['conv1']['kernel'] = np.zeros((5, 5, 3, 10), np.float32)
    det = MTCNN(image_shape=(128, 128))
    with pytest.raises(ValueError, match='shape mismatch at pnet/conv1'):
        w.validate_params(params, det)


def test_validate_catches_missing(synthetic_dicts):
    det1, det2, det3 = synthetic_dicts
    params = {
        'pnet': w.pnet_params(det1),
        'rnet': w.rnet_params(det2),
        'onet': w.onet_params(det3),
    }
    del params['rnet']['fc1']
    det = MTCNN(image_shape=(128, 128))
    with pytest.raises(ValueError, match='missing: rnet/fc1'):
        w.validate_params(params, det)


def test_nchw_fc_permutation_consistency(synthetic_dicts):
    """Permuting an NCHW-flatten FC weight must equal permuting the input."""
    rng = np.random.RandomState(2)
    h, wd, c, out = 3, 3, 64, 128
    w_nchw = rng.randn(h * wd * c, out).astype(np.float32)

    entry = {'weights': w_nchw, 'biases': np.zeros(out, np.float32)}
    w_nhwc = w._dense(entry, feature_hwc=(h, wd, c), fc_order='nchw')['kernel']

    feat = rng.randn(h, wd, c).astype(np.float32)
    flat_nhwc = feat.reshape(-1)                       # our nets' flatten
    flat_nchw = feat.transpose(2, 0, 1).reshape(-1)    # caffe-style flatten
    np.testing.assert_allclose(flat_nhwc @ w_nhwc, flat_nchw @ w_nchw,
                               rtol=1e-5)


def test_transpose_equivalence(synthetic_dicts):
    """transpose=True must be an exact orientation conversion: running the
    TRANSFORMED params on an upright image equals running the ORIGINAL
    params on the transposed image (with outputs mapped back: probs map
    transposed, reg x/y pairs swapped, landmark x/y blocks swapped)."""
    import jax
    import jax.numpy as jnp
    from facenet_tpu.detectors.mtcnn.networks import (ONet, PNet, RNet,
                                                      normalize_crops)

    det1, det2, det3 = synthetic_dicts
    rng = np.random.RandomState(3)

    # ---- P-Net on a non-square image
    img = rng.rand(1, 26, 38, 3).astype(np.float32) * 255
    img_t = img.transpose(0, 2, 1, 3)

    pnet = PNet(dtype=jnp.float32)
    p_orig = {'params': w.pnet_params(det1)}
    p_tran = {'params': w.pnet_params(det1, transpose=True)}

    probs_u, reg_u = pnet.apply(p_tran, normalize_crops(img))
    probs_t, reg_t = pnet.apply(p_orig, normalize_crops(img_t))
    np.testing.assert_allclose(np.asarray(probs_u),
                               np.asarray(probs_t).transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(reg_u),
        np.asarray(reg_t).transpose(0, 2, 1, 3)[..., [1, 0, 3, 2]],
        rtol=1e-4, atol=1e-5)

    # ---- R-Net on square crops (transposed crop = image transpose)
    crop = rng.rand(2, 24, 24, 3).astype(np.float32) * 255
    crop_t = crop.transpose(0, 2, 1, 3)
    rnet = RNet(dtype=jnp.float32)
    r_orig = {'params': w.rnet_params(det2)}
    r_tran = {'params': w.rnet_params(det2, transpose=True)}
    pu, ru = rnet.apply(r_tran, normalize_crops(crop))
    pt, rt = rnet.apply(r_orig, normalize_crops(crop_t))
    np.testing.assert_allclose(np.asarray(pu), np.asarray(pt),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ru),
                               np.asarray(rt)[:, [1, 0, 3, 2]],
                               rtol=1e-4, atol=1e-5)

    # ---- O-Net incl. landmarks
    crop = rng.rand(2, 48, 48, 3).astype(np.float32) * 255
    crop_t = crop.transpose(0, 2, 1, 3)
    onet = ONet(dtype=jnp.float32)
    o_orig = {'params': w.onet_params(det3)}
    o_tran = {'params': w.onet_params(det3, transpose=True)}
    pu, ru, lu = onet.apply(o_tran, normalize_crops(crop))
    pt, rt, lt = onet.apply(o_orig, normalize_crops(crop_t))
    np.testing.assert_allclose(np.asarray(pu), np.asarray(pt),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ru),
                               np.asarray(rt)[:, [1, 0, 3, 2]],
                               rtol=1e-4, atol=1e-5)
    lmk_perm = list(range(5, 10)) + list(range(0, 5))
    np.testing.assert_allclose(np.asarray(lu),
                               np.asarray(lt)[:, lmk_perm],
                               rtol=1e-4, atol=1e-5)
