"""Round-trip test for reference-format (h5) embedding-net weight import.

Generates a synthetic reference-schema h5 (folded weights/biases under
tf-slim-style scopes, the schema of reference tfutils.py:225-264) from a
randomly-initialized model via `export_ref_h5`, imports it back with
`import_h5_weights`, and asserts:

  * fast-params parity: `build_fast_params` of the imported variables is
    tensor-for-tensor equal to `build_fast_params` of the originals (both
    reduce to the same folded form, through different folding orders);
  * embedding parity through the real flax model at inference;
  * completeness is enforced both ways (missing h5 unit and extra h5
    unit each raise).
"""

import jax
import numpy as np
import pytest

from facenet_tpu.models.import_weights import (
    export_ref_h5, import_h5_weights, iter_units)
from facenet_tpu.models.inception_resnet_v1 import create_model
from facenet_tpu.models.irv1_fast import build_fast_params

TINY = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
        'block8_1': {'repeat': 1}, 'output': {'size': 32}}


def _randomized_variables(seed=0):
    """Init the TINY model and give BN stats/biases non-trivial values so
    the fold math is actually exercised (init leaves mean=0/var=1/beta=0,
    which would make folding a no-op)."""
    from flax.core import unfreeze

    model = create_model(TINY)
    variables = unfreeze(model.init(
        jax.random.PRNGKey(seed), np.zeros((1, 160, 160, 3), np.uint8),
        train=False))

    rng = np.random.RandomState(seed + 1)

    def perturb_params(path, leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim == 1:   # biases / BN betas
            return rng.normal(0, 0.2, leaf.shape).astype(leaf.dtype)
        return leaf

    def perturb_stats(path, leaf):
        leaf = np.asarray(leaf)
        name = path[-1].key
        if name == 'mean':
            return rng.normal(0, 0.3, leaf.shape).astype(leaf.dtype)
        if name == 'var':
            return rng.uniform(0.5, 1.5, leaf.shape).astype(leaf.dtype)
        return leaf

    variables['params'] = jax.tree_util.tree_map_with_path(
        perturb_params, variables['params'])
    variables['batch_stats'] = jax.tree_util.tree_map_with_path(
        perturb_stats, variables['batch_stats'])
    return model, variables


def test_h5_roundtrip_fast_params_and_embeddings(tmp_path):
    model, variables = _randomized_variables()

    h5 = export_ref_h5(variables, tmp_path / 'ref_schema.h5')
    imported = import_h5_weights(h5, config=TINY)

    # --- layer parity through the folded serving form -------------------
    p0, _ = build_fast_params(variables, config=TINY)
    p1, _ = build_fast_params(imported, config=TINY)
    leaves0 = jax.tree_util.tree_leaves_with_path(p0)
    leaves1 = dict(jax.tree_util.tree_leaves_with_path(p1))
    assert len(leaves0) == len(leaves1)
    for path, a in leaves0:
        b = leaves1[path]
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=str(path))

    # --- embedding parity through the real model -------------------------
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (4, 160, 160, 3), np.uint8)
    e0 = np.asarray(model.apply(variables, imgs, train=False))
    e1 = np.asarray(model.apply(imported, imgs, train=False))
    cos = np.sum(e0 * e1, axis=1)
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(e0, e1, atol=0.02)


def test_import_is_complete_both_ways(tmp_path):
    import h5py

    _, variables = _randomized_variables(seed=3)
    h5 = export_ref_h5(variables, tmp_path / 'ref.h5')

    # sanity: the walker found every unit class (stem conv_bn, block
    # up-projection plain conv, bottleneck dense_bn)
    kinds = {k for _, k, _ in iter_units(variables['params'])}
    assert kinds == {'conv_bn', 'conv', 'dense_bn'}

    # a missing unit raises
    with h5py.File(h5, 'a') as hf:
        del hf['InceptionResnetV1/Conv2d_1a_3x3/weights']
    with pytest.raises(KeyError, match='Conv2d_1a_3x3'):
        import_h5_weights(h5, config=TINY)

    # an extra (unmapped) unit raises
    h5b = export_ref_h5(variables, tmp_path / 'ref2.h5')
    with h5py.File(h5b, 'a') as hf:
        hf.create_dataset('InceptionResnetV1/NoSuchLayer/weights',
                          data=np.zeros((1, 1, 3, 3), np.float32))
        hf.create_dataset('InceptionResnetV1/NoSuchLayer/biases',
                          data=np.zeros((3,), np.float32))
    with pytest.raises(KeyError, match='NoSuchLayer'):
        import_h5_weights(h5b, config=TINY)
