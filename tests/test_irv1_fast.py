"""Fused inference fast path == reference Flax model (math equivalence).

BN folding and branch-head fusion (models/irv1_fast.py) are exact
transformations; in float32 the fused forward must match model.apply to
numerical tolerance, and in bfloat16 the embeddings must stay aligned.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = {'block35': {'repeat': 2}, 'block17': {'repeat': 2},
        'block8_1': {'repeat': 2}, 'output': {'size': 64}}


def _model_and_vars(dtype, seed=0):
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    model = InceptionResnetV1(config=TINY, dtype=dtype)
    images = np.random.RandomState(seed).randint(
        0, 256, (4, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(seed), images[:1], train=False)
    # make BN stats non-trivial (fresh init has mean 0 / var 1)
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    rng = np.random.RandomState(seed + 1)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.abs(rng.normal(0.5, 0.2, a.shape)).astype(a.dtype)),
        variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    return model, variables, images


def test_fast_forward_matches_model_f32():
    from facenet_tpu.models.irv1_fast import FastEmbedder

    model, variables, images = _model_and_vars(jnp.float32)
    ref = np.asarray(model.apply(variables, images, train=False))
    fast = np.asarray(FastEmbedder(variables, config=TINY,
                                   dtype=jnp.float32)(images))
    np.testing.assert_allclose(fast, ref, atol=2e-4, rtol=1e-3)


def test_fast_forward_matches_model_bf16():
    from facenet_tpu.models.irv1_fast import FastEmbedder

    model, variables, images = _model_and_vars(jnp.bfloat16)
    ref = np.asarray(model.apply(variables, images, train=False))
    fast = np.asarray(FastEmbedder(variables, config=TINY,
                                   dtype=jnp.bfloat16)(images))
    # both are unit vectors; require tight angular agreement
    cos = np.sum(ref * fast, axis=1)
    assert cos.min() > 0.999, cos
    # and unit norm out of the fast path
    np.testing.assert_allclose(np.linalg.norm(fast, axis=1), 1.0, atol=1e-5)


def test_fast_path_default_config():
    """Full-size config builds and the parameter tree covers every block."""
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1
    from facenet_tpu.models.irv1_fast import build_fast_params

    model = InceptionResnetV1()      # full 5/10/5+1 topology
    images = np.zeros((1, 160, 160, 3), np.uint8)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    params, cfg = build_fast_params(variables)
    assert 'Repeat.block35_5' in params
    assert 'Repeat_1.block17_10' in params
    assert 'Block8' in params
    assert params['Mixed_7a']['heads']['k'].shape[3] == 768


def test_facenet_serving_uses_fast_path(tmp_path):
    """FaceNet (the serving class) routes IRv1 bundles through the fused
    path and its embeddings match the Flax model for both the normalized
    output and the raw-bottleneck escape hatch."""
    import facenet_tpu
    from facenet_tpu import export
    from facenet_tpu.config import Config
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1
    from facenet_tpu.models.irv1_fast import FastEmbedder

    model = InceptionResnetV1(config=TINY)
    images = np.random.RandomState(0).randint(
        0, 256, (3, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    export.save_model(tmp_path / 'bundle', model, variables)

    for normalize in (True, False):
        fn = facenet_tpu.FaceNet(Config({'path': str(tmp_path / 'bundle'),
                                         'normalize': normalize}))
        assert isinstance(fn._forward, FastEmbedder)
        got = fn.image_to_embedding(images)
        ref = np.asarray(model.apply(variables, images, train=False,
                                     normalize=normalize))
        if normalize:
            assert (got * ref).sum(axis=1).min() > 0.999
        else:
            np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)
