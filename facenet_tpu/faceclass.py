"""Face-to-face pair classifiers.

Parity with the reference faceclass module (reference facenet/faceclass.py):
tiny learnable classifiers over embedding-pair distances, with logits
``alpha * (threshold - distance(x, y))``:

  * FaceToFaceDistanceClassifier — for UNnormalized embeddings; distance is
    the normalized-embedding distance plus a theta-weighted norm-mismatch
    correction (ref faceclass.py:43-73):
        d = 2 (1 - x̂·ŷ) + theta * (2 (|x|-|y|) / (|x|+|y|))^2
  * FaceToFaceNormalizedEmbeddingsClassifier — for normalized embeddings;
    d = 2 (1 - x·y) (ref faceclass.py:106-115)

JAX-native: parameters are a plain dict pytree; `__call__`/`distance` are
pure functions usable under jit/grad; `predict` works on numpy or device
arrays. The reference's TF1-variable/session duality disappears.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class FaceToFaceDistanceClassifier:
    """Pair classifier over unnormalized-embedding distances."""

    def __init__(self, alpha=10.0, threshold=1.0, theta=1.0):
        self.variables = {
            'alpha': jnp.asarray(float(alpha), jnp.float32),
            'threshold': jnp.asarray(float(threshold), jnp.float32),
            'theta': jnp.asarray(float(theta), jnp.float32),
        }

    def __call__(self, x, y=None, variables=None):
        v = variables if variables is not None else self.variables
        return v['alpha'] * (v['threshold'] - self.distance(x, y, variables=v))

    def __repr__(self):
        variables = {k: float(v) for k, v in self.variables.items()}
        return (f'{self.__class__.__name__}\n'
                f'variables {variables}\n')

    def variable(self, name, mode=None):
        var = self.variables[name]
        if mode == 'numpy':
            return np.asarray(var)
        return var

    def distance(self, x, y=None, variables=None):
        v = variables if variables is not None else self.variables
        theta = v['theta']

        x = jnp.asarray(x, jnp.float32)
        y = x if y is None else jnp.asarray(y, jnp.float32)

        norm_x = jnp.linalg.norm(x, axis=1, keepdims=True)
        norm_y = jnp.linalg.norm(y, axis=1, keepdims=True).T

        x1 = x / norm_x
        y1 = (y / jnp.linalg.norm(y, axis=1, keepdims=True)).T

        dist = 2 * (1 - x1 @ y1) + \
            theta * jnp.square(2 * (norm_x - norm_y) / (norm_x + norm_y))
        return dist

    def predict(self, x, y=None):
        return np.asarray(self.distance(x, y)) < float(self.variables['threshold'])


class FaceToFaceNormalizedEmbeddingsClassifier:
    """Pair classifier over normalized-embedding distances."""

    def __init__(self, alpha=10.0, threshold=1.0):
        self.variables = {
            'alpha': jnp.asarray(float(alpha), jnp.float32),
            'threshold': jnp.asarray(float(threshold), jnp.float32),
        }

    def __call__(self, x, y=None, variables=None):
        v = variables if variables is not None else self.variables
        return v['alpha'] * (v['threshold'] - self.distance(x, y))

    def __repr__(self):
        variables = {k: float(v) for k, v in self.variables.items()}
        return (f'{self.__class__.__name__}\n'
                f'variables {variables}\n')

    def variable(self, name, mode=None):
        var = self.variables[name]
        if mode == 'numpy':
            return np.asarray(var)
        return var

    def distance(self, x, y=None, variables=None):
        x = jnp.asarray(x, jnp.float32)
        y = x if y is None else jnp.asarray(y, jnp.float32)
        return 2 * (1 - x @ y.T)

    def predict(self, x, y=None):
        return np.asarray(self.distance(x, y)) < float(self.variables['threshold'])
