"""Architectural parity of Inception-ResNet-v1 with the reference topology.

The reference's trained weights are not in its tree (SURVEY.md §7 "Hard
parts"), so parity is architectural: the block structure, filter counts,
repeat counts, BN configuration, and the preprocessing/normalization
contract must match reference models/inception_resnet_v1.py exactly. These
tests pin those constants so refactors can't silently drift.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facenet_tpu.models.inception_resnet_v1 import (
    InceptionResnetV1, create_model)


@pytest.fixture(scope='module')
def variables():
    model = create_model()
    return model, model.init(jax.random.PRNGKey(0),
                             np.zeros((1, 160, 160, 3), np.uint8),
                             train=False)


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_parameter_count_matches_reference_scale(variables):
    """IRv1 with a 512-d bottleneck is ~23-24M params (the well-known
    facenet model size; davidsandberg's 20180402-114759 reports 23.99M
    incl. logits — the backbone alone lands in 22.8-23.9M)."""
    model, v = variables
    n = _count(v['params'])
    assert 21_000_000 < n < 25_000_000, f'param count {n:,}'


def test_stem_filter_progression(variables):
    """Stem: 32, 32, 64, 80, 192, 256 (ref inception_resnet_v1.py:380-430)."""
    model, v = variables
    p = v['params']
    stem = [k for k in p if k.startswith('Conv2d_')]
    filters = {k: p[k]['conv']['kernel'].shape[-1] for k in sorted(stem)}
    expected = [32, 32, 64, 80, 192, 256]
    got = [f for _, f in sorted(filters.items())]
    assert got == expected, filters


def test_block_repeats(variables):
    """5x Block35, 10x Block17, 5+1x Block8 (ref :432-453)."""
    model, v = variables
    keys = list(v['params'].keys())
    assert sum(1 for k in keys if 'block35' in k.lower()) == 5, keys
    assert sum(1 for k in keys if 'block17' in k.lower()) == 10
    assert sum(1 for k in keys if 'block8' in k.lower()) == 6


def test_bottleneck_is_512_no_bias_with_bn(variables):
    """Dense 512 no-bias + BN scale=False center=True (ref :459-468,
    :56-63)."""
    model, v = variables
    p = v['params']
    assert p['Bottleneck']['kernel'].shape[1] == 512
    assert 'bias' not in p['Bottleneck']
    bn = p['Bottleneck.bn']
    assert 'bias' in bn and 'scale' not in bn


def test_all_batchnorms_are_center_only(variables):
    """Every BN uses scale=False, center=True (ref :56-63)."""
    model, v = variables

    def walk(tree, path=''):
        for k, item in tree.items():
            name = f'{path}/{k}'
            if k == 'bn' or k.endswith('.bn'):
                assert 'scale' not in item, f'{name} has scale'
                assert 'bias' in item, f'{name} missing center'
            elif hasattr(item, 'items'):
                walk(item, name)

    walk(v['params'])


def test_inference_l2_normalized_training_not(variables):
    """l2-normalize applies at inference only (ref :484-494)."""
    model, v = variables
    imgs = np.random.RandomState(0).randint(
        0, 256, (2, 160, 160, 3), dtype=np.uint8)
    out = model.apply(v, imgs, train=False)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    raw, _ = model.apply(v, imgs, train=True, mutable=['batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(0)})
    norms = np.linalg.norm(np.asarray(raw, np.float32), axis=1)
    assert not np.allclose(norms, 1.0, atol=1e-3)


def test_uint8_contract(variables):
    """uint8 in, float32 out — preprocessing inside the model
    (ref facenet/__init__.py contract, SURVEY.md §3.4)."""
    model, v = variables
    out = model.apply(v, np.zeros((1, 160, 160, 3), np.uint8), train=False)
    assert out.dtype == jnp.float32
    assert out.shape == (1, 512)
