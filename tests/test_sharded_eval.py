"""Sharded all-pairs evaluation over the virtual 8-device CPU mesh
(SURVEY.md §2.8 "Sharded eval")."""

import numpy as np
import pytest

from conftest import make_embeddings
from facenet_tpu import statistics
from facenet_tpu.parallel import mesh as mesh_mod
from facenet_tpu.parallel.sharded_eval import sharded_pair_histograms


@pytest.fixture(scope='module')
def data():
    rng = np.random.RandomState(0)
    return make_embeddings(rng, nrof_classes=6, images_per_class=21, dim=32)


@pytest.fixture(scope='module')
def mesh8():
    return mesh_mod.create_mesh(data=8, model=1)


@pytest.mark.parametrize('metric', [0, 1])
def test_matches_single_device(data, mesh8, metric):
    embs, labels = data
    hi = 4.0 if metric == 0 else np.pi
    thr = np.linspace(0, hi, 100)[1:99].astype(np.float32)

    single = statistics.confusion_counts(embs, labels, thr, metric=metric)
    sharded = statistics.confusion_counts(embs, labels, thr, metric=metric,
                                          mesh=mesh8)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_histograms_totals(data, mesh8):
    embs, labels = data
    thr = np.array([1.0, 2.0], np.float32)
    nc = len(np.unique(labels))
    hp, hn = sharded_pair_histograms(embs, labels.astype(np.int32), thr,
                                     num_classes=nc, metric=0, mesh=mesh8)
    # per-class-pair weighting sums to C positives and C(C-1)/2 negatives
    np.testing.assert_allclose(hp.sum(), nc, rtol=1e-5)
    np.testing.assert_allclose(hn.sum(), nc * (nc - 1) / 2, rtol=1e-5)


def test_set_eval_mesh_global(data, mesh8):
    embs, labels = data
    thr = np.linspace(0.01, 3.9, 30).astype(np.float32)
    base = statistics.confusion_counts(embs, labels, thr)
    try:
        statistics.set_eval_mesh(mesh8)
        routed = statistics.confusion_counts(embs, labels, thr)
    finally:
        statistics.set_eval_mesh(None)
    for a, b in zip(base, routed):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_uneven_rows_across_devices(mesh8):
    # N = 37 does not divide 8; padded rows must not contribute
    rng = np.random.RandomState(3)
    embs, labels = make_embeddings(rng, nrof_classes=4, images_per_class=10,
                                   dim=16)
    embs, labels = embs[:37], labels[:37]
    thr = np.linspace(0.01, 3.9, 10).astype(np.float32)
    single = statistics.confusion_counts(embs, labels, thr)
    sharded = statistics.confusion_counts(embs, labels, thr, mesh=mesh8)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_sharded_forward_embedding_extraction(mesh8):
    """evaluate_embeddings(mesh=...) splits batches over the data axis and
    matches single-device output, including an uneven final batch."""
    import jax
    import jax.numpy as jnp
    from facenet_tpu import facenet

    rng = np.random.RandomState(0)
    w = rng.randn(48, 16).astype(np.float32)

    @jax.jit
    def forward(images):
        flat = images.reshape(images.shape[0], -1).astype(jnp.float32)
        emb = flat[:, :48] @ w
        return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)

    batches = []
    for n in (16, 16, 5):       # 5 is not divisible by 8 -> padded+trimmed
        imgs = rng.randint(0, 256, (n, 4, 4, 3), dtype=np.uint8)
        batches.append((imgs, rng.randint(0, 3, n).astype(np.int32)))

    single = facenet.evaluate_embeddings(forward, batches)
    sharded = facenet.evaluate_embeddings(forward, batches, mesh=mesh8)
    np.testing.assert_allclose(single[0], sharded[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(single[1], sharded[1])


def test_evaluate_embeddings_pipelined_dispatch(mesh8):
    """The pipelined fetch (dispatch one batch ahead) must preserve
    batch order and values for every forward flavor: sync numpy,
    async device-array (FaceNet.dispatch-style), and sharded tuple."""
    import jax
    import jax.numpy as jnp
    from facenet_tpu import facenet

    rng = np.random.RandomState(0)
    w = rng.randn(12, 7).astype(np.float32)

    def raw(x):
        out = jnp.asarray(x, jnp.float32).reshape(x.shape[0], -1)[:, :12] @ w
        return out / jnp.linalg.norm(out, axis=1, keepdims=True)

    jitted = jax.jit(raw)
    batches = [(rng.randint(0, 255, (5, 4, 4, 3), np.uint8),
                np.arange(i * 5, i * 5 + 5)) for i in range(4)]
    # uneven tail batch exercises the padded sharded shape
    batches.append((rng.randint(0, 255, (3, 4, 4, 3), np.uint8),
                    np.arange(20, 23)))

    sync_fn = lambda x: np.asarray(jitted(x))
    want, want_labels = facenet.evaluate_embeddings(sync_fn, batches)

    got, got_labels = facenet.evaluate_embeddings(jitted, batches)
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_array_equal(got_labels, want_labels)

    shard, shard_labels = facenet.evaluate_embeddings(jitted, batches,
                                                      mesh=mesh8)
    np.testing.assert_allclose(shard, want, atol=1e-6)
    np.testing.assert_array_equal(shard_labels, want_labels)
