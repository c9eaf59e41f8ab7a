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
