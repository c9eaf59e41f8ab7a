"""Standalone compiled-artifact export (export.save_compiled/load_compiled).

The reference freezes models into a self-contained .pb runnable without the
training code (reference tfutils.py:56-129); the TPU-native analogue is a
serialized StableHLO module with weights baked in and a symbolic batch dim.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from facenet_tpu import export
from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

TINY = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
        'block8_1': {'repeat': 1}, 'output': {'size': 32}}


@pytest.fixture(scope='module')
def tiny_model_and_vars():
    import jax
    model = InceptionResnetV1(config=TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 160, 160, 3), np.uint8), train=False)
    return model, variables


@pytest.mark.slow
def test_compiled_artifact_matches_eager_and_any_batch(tmp_path,
                                                       tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    artifact = export.save_compiled(tmp_path, model, variables,
                                    platforms=('cpu',))
    assert artifact.exists() and artifact.stat().st_size > 1000

    compiled = export.load_compiled(tmp_path)
    rng = np.random.RandomState(0)
    for batch in (1, 3, 8):   # symbolic batch: no fixed-shape recompiles
        imgs = rng.randint(0, 256, (batch, 160, 160, 3), np.uint8)
        got = np.asarray(compiled(imgs))
        want = np.asarray(model.apply(variables, imgs, train=False))
        assert got.shape == (batch, 32)
        # bf16 activations: different fusion schedules legitimately differ
        # at ~1e-3 on unit-norm outputs
        np.testing.assert_allclose(got, want, atol=5e-3)
        cos = np.sum(got * want, axis=1)
        assert cos.min() > 0.9999, cos


def test_compiled_artifact_runs_without_framework(tmp_path,
                                                  tiny_model_and_vars):
    """The artifact must be loadable and runnable with jax alone — the
    subprocess blocks facenet_tpu imports entirely."""
    model, variables = tiny_model_and_vars
    artifact = export.save_compiled(tmp_path, model, variables,
                                    platforms=('cpu',))

    imgs = np.random.RandomState(1).randint(0, 256, (2, 160, 160, 3),
                                            np.uint8)
    np.save(tmp_path / 'in.npy', imgs)
    want = np.asarray(model.apply(variables, imgs, train=False))

    script = f'''
import sys
sys.modules['facenet_tpu'] = None   # any framework import now explodes
import jax
jax.config.update('jax_platforms', 'cpu')
from jax import export as jax_export
import numpy as np
exp = jax_export.deserialize(open({str(artifact)!r}, 'rb').read())
out = exp.call(np.load({str(tmp_path / 'in.npy')!r}))
np.save({str(tmp_path / 'out.npy')!r}, np.asarray(out))
'''
    env = {k: v for k, v in os.environ.items() if k != 'PYTHONPATH'}
    run = subprocess.run([sys.executable, '-c', script], env=env, cwd='/tmp',
                         capture_output=True, text=True, timeout=600)
    assert run.returncode == 0, run.stderr[-2000:]
    got = np.load(tmp_path / 'out.npy')
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_int8_compiled_artifact(tmp_path, tiny_model_and_vars):
    """quantize='int8' serializes the int8 serving graph: int8 constants
    in the module, embeddings close to the float artifact's."""
    model, variables = tiny_model_and_vars
    rng = np.random.RandomState(2)
    calib = rng.randint(0, 256, (8, 160, 160, 3), np.uint8)
    artifact = export.save_compiled(tmp_path / 'q', model, variables,
                                    platforms=('cpu',), quantize='int8',
                                    calib_images=calib)
    assert artifact.exists()
    compiled = export.load_compiled(tmp_path / 'q')
    assert 'i8' in compiled.mlir_module()

    imgs = rng.randint(0, 256, (3, 160, 160, 3), np.uint8)
    got = np.asarray(compiled(imgs))
    want = np.asarray(model.apply(variables, imgs, train=False))
    assert got.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)
    cos = np.sum(got * want, axis=1)
    assert cos.min() > 0.95, cos

    with pytest.raises(ValueError):
        export.save_compiled(tmp_path / 'q2', model, variables,
                             platforms=('cpu',), quantize='int8')


def test_op_histogram_names_convolutions(tmp_path, tiny_model_and_vars):
    model, variables = tiny_model_and_vars
    export.save_compiled(tmp_path, model, variables, platforms=('cpu',))
    hist = export.load_compiled(tmp_path).op_histogram()
    assert hist.get('convolution', 0) > 10   # the IRv1 stem alone has 6
    assert 'dot_general' in hist
