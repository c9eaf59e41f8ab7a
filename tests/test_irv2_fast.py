"""Fused IRv2 inference fast path == reference Flax model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = {'repeat': [1, 1, 1], 'embedding_size': 64}


def _model_and_vars(dtype, seed=0):
    from facenet_tpu.models.inception_resnet_v2 import InceptionResnetV2

    model = InceptionResnetV2(config=TINY, dtype=dtype)
    images = np.random.RandomState(seed).randint(
        0, 256, (3, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(seed), images[:1], train=False)
    rng = np.random.RandomState(seed + 1)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.abs(rng.normal(0.5, 0.2, a.shape)).astype(a.dtype)),
        variables['batch_stats'])
    return model, {'params': variables['params'], 'batch_stats': stats}, images


@pytest.mark.slow
def test_irv2_fast_matches_model_f32():
    from facenet_tpu.models.irv2_fast import FastEmbedderV2

    model, variables, images = _model_and_vars(jnp.float32)
    ref = np.asarray(model.apply(variables, images, train=False))
    fast = np.asarray(FastEmbedderV2(variables, config=TINY,
                                     dtype=jnp.float32)(images))
    np.testing.assert_allclose(fast, ref, atol=2e-4, rtol=1e-3)


def test_irv2_fast_matches_model_bf16():
    from facenet_tpu.models.irv2_fast import FastEmbedderV2

    model, variables, images = _model_and_vars(jnp.bfloat16)
    ref = np.asarray(model.apply(variables, images, train=False))
    fast = np.asarray(FastEmbedderV2(variables, config=TINY,
                                     dtype=jnp.bfloat16)(images))
    cos = np.sum(ref * fast, axis=1)
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(np.linalg.norm(fast, axis=1), 1.0, atol=1e-5)


def test_facenet_serves_irv2_through_fast_path(tmp_path):
    import facenet_tpu
    from facenet_tpu import export
    from facenet_tpu.config import Config
    from facenet_tpu.models.irv2_fast import FastEmbedderV2

    model, variables, images = _model_and_vars(jnp.bfloat16)
    export.save_model(tmp_path / 'bundle', model, variables)

    fn = facenet_tpu.FaceNet(Config({'path': str(tmp_path / 'bundle'),
                                     'normalize': True}))
    assert isinstance(fn._forward, FastEmbedderV2)
    got = fn.image_to_embedding(images)
    ref = np.asarray(model.apply(variables, images, train=False))
    assert (got * ref).sum(axis=1).min() > 0.999
