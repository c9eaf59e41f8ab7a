import os

# Fake 8-device CPU mesh for multi-chip sharding tests. NOTE: under the axon
# TPU plugin the JAX_PLATFORMS env var is ignored, so the platform must be
# forced through jax.config before any computation runs.
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_embeddings(rng, nrof_classes=6, images_per_class=8, dim=32,
                    spread=0.15):
    """Synthetic L2-normalized clustered embeddings + labels."""
    centers = rng.randn(nrof_classes, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    embs, labels = [], []
    for c in range(nrof_classes):
        n = images_per_class
        x = centers[c] + spread * rng.randn(n, dim)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        embs.append(x)
        labels += [c] * n

    return np.concatenate(embs).astype(np.float32), np.array(labels)


@pytest.fixture
def clustered_embeddings(rng):
    return make_embeddings(rng)
