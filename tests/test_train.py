import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facenet_tpu.config import Config
from facenet_tpu.parallel import mesh as mesh_mod
from facenet_tpu.train.softmax import SoftmaxTrainer

TINY_MODEL = {
    'block35': {'repeat': 1, 'scale': 0.17, 'activation': 'relu'},
    'block17': {'repeat': 1, 'scale': 0.10, 'activation': 'relu'},
    'block8_1': {'repeat': 1, 'scale': 0.2, 'activation': 'relu'},
    'output': {'size': 32},
}

NROF_CLASSES = 4


def train_cfg(**loss_overrides):
    loss = {'center_alfa': 0.95, 'center_factor': 0.0,
            'triplet_margin': 0.2, 'triplet_factor': 0.0}
    loss.update(loss_overrides)
    return Config({
        'batch_size': 8,
        'image': {'size': 160, 'normalization': 0,
                  'random_crop': False, 'random_flip': False},
        'mesh': {'data': 4, 'model': 2},
        'train': {
            'adam_epsilon': 0.1,
            'epoch': {'size': 3, 'max_nrof_epochs': 1},
            'learning_rate': {'value': None, 'schedule': [[100, 0.01]]},
        },
        'loss': loss,
    })


def synthetic_batches(n_batches, batch=8, size=160, seed=0):
    rng = np.random.RandomState(seed)
    bases = rng.randint(0, 255, (NROF_CLASSES, size, size, 3)).astype(np.float32)
    out = []
    for _ in range(n_batches):
        labels = rng.randint(0, NROF_CLASSES, batch)
        imgs = np.clip(bases[labels] + rng.randn(batch, size, size, 3) * 10,
                       0, 255).astype(np.uint8)
        out.append((imgs, labels.astype(np.int32)))
    return out


@pytest.fixture(scope='module')
def trainer():
    return SoftmaxTrainer(train_cfg(), NROF_CLASSES, model_cfg=TINY_MODEL)


@pytest.fixture
def trainer_and_state(trainer):
    # fresh state per test: the train step donates its input state buffers
    return trainer, trainer.init_state(seed=0)


def test_mesh_creation():
    mesh = mesh_mod.create_mesh(data=4, model=2)
    assert mesh.shape == {'data': 4, 'model': 2}
    mesh_all = mesh_mod.create_mesh()
    assert mesh_all.shape['data'] == len(jax.devices())


def test_mesh_too_big_raises():
    with pytest.raises(ValueError):
        mesh_mod.create_mesh(data=16, model=2)


def test_logits_head_is_model_sharded(trainer_and_state):
    trainer, state = trainer_and_state
    kernel = state.params['logits']['kernel']
    spec = kernel.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, 'model')


@pytest.mark.slow
def test_train_step_runs_and_learns(trainer_and_state):
    trainer, state = trainer_and_state
    batches = synthetic_batches(12)

    state, metrics = trainer.train_epoch(state, batches[:1], epoch=0,
                                         log_every=0)
    first_loss = metrics['cross_entropy']

    for _ in range(6):
        state, metrics = trainer.train_epoch(state, batches, epoch=0,
                                             log_every=0)
    assert metrics['cross_entropy'] < first_loss
    assert int(state.step) > 0
    assert np.isfinite(metrics['loss'])


@pytest.mark.slow
def test_center_loss_training_updates_centers():
    trainer = SoftmaxTrainer(train_cfg(center_factor=0.5), NROF_CLASSES,
                             model_cfg=TINY_MODEL)
    state = trainer.init_state(seed=0)
    assert state.centers is not None
    assert np.allclose(np.asarray(state.centers), 0)

    state, metrics = trainer.train_epoch(state, synthetic_batches(3),
                                         epoch=0, log_every=0)
    assert 'center_loss' in metrics
    assert not np.allclose(np.asarray(state.centers), 0)


@pytest.mark.slow
def test_triplet_loss_training_runs():
    trainer = SoftmaxTrainer(train_cfg(triplet_factor=1.0), NROF_CLASSES,
                             model_cfg=TINY_MODEL)
    state = trainer.init_state(seed=0)
    state, metrics = trainer.train_epoch(state, synthetic_batches(2),
                                         epoch=0, log_every=0)
    assert 'triplet_loss' in metrics
    assert np.isfinite(metrics['triplet_loss'])


def test_embedding_forward_from_train_state(trainer_and_state):
    trainer, state = trainer_and_state
    fwd = trainer.embedding_forward(state)
    imgs = np.random.RandomState(0).randint(
        0, 256, (3, 160, 160, 3), dtype=np.uint8)
    out = np.asarray(fwd(imgs))
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-2)


def test_epoch_draws_exactly_steps_per_epoch(trainer_and_state):
    """The prefetch queue must not pull batches past the epoch boundary:
    callers share one pipeline iterator across epochs (and checkpoint its
    cursor), so an over-pull would silently skip data every epoch."""
    trainer, state = trainer_and_state
    drawn = []

    def counting(batches):
        for i, b in enumerate(batches):
            drawn.append(i)
            yield b

    src = counting(synthetic_batches(4 * trainer.steps_per_epoch))
    state, m = trainer.train_epoch(state, src, epoch=0, log_every=0)
    assert m['steps'] == trainer.steps_per_epoch
    assert len(drawn) == trainer.steps_per_epoch
    state, m = trainer.train_epoch(state, src, epoch=1, log_every=0)
    assert m['steps'] == trainer.steps_per_epoch
    assert len(drawn) == 2 * trainer.steps_per_epoch


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, trainer_and_state):
    from facenet_tpu.train.checkpoint import CheckpointManager
    trainer, state = trainer_and_state

    mgr = CheckpointManager(tmp_path / 'ckpt', max_to_keep=2)
    mgr.save(int(state.step), state)
    assert mgr.latest_step() == int(state.step)

    # restore into a freshly initialized state
    template = trainer.init_state(seed=1)
    restored = mgr.restore(template)
    mgr.close()

    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_bundle_roundtrip(tmp_path):
    from facenet_tpu import export
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    model = InceptionResnetV1(config=TINY_MODEL)
    imgs = np.random.RandomState(0).randint(
        0, 256, (2, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)
    want = np.asarray(model.apply(variables, imgs, train=False))

    path = export.save_model(tmp_path / 'bundle', model, variables)
    bundle = export.load_model(path)
    got = np.asarray(bundle.model.apply(bundle.variables, imgs, train=False))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_facenet_serving_class(tmp_path):
    from facenet_tpu import FaceNet, export
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    model = InceptionResnetV1(config=TINY_MODEL)
    imgs = np.random.RandomState(0).randint(
        0, 256, (160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), imgs[None], train=False)
    export.save_model(tmp_path / 'bundle', model, variables)

    fn = FaceNet(Config({'path': str(tmp_path / 'bundle'), 'normalize': True}))
    emb = fn.image_to_embedding(imgs)       # single image -> batch of 1
    assert emb.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-2)


def test_export_h5_activations(tmp_path):
    from facenet_tpu import export, h5utils
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    model = InceptionResnetV1(config=TINY_MODEL)
    imgs = np.random.RandomState(0).randint(
        0, 256, (1, 160, 160, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), imgs, train=False)

    h5 = export.export_h5(tmp_path / 'dump.h5', model, variables, imgs)
    names = [i['name'] for i in h5utils.visititems(h5)]
    assert any(n.startswith('activations/') for n in names)
    assert any(n.startswith('weights/') for n in names)
    assert 'input' in names


@pytest.mark.slow
def test_remat_matches_no_remat():
    """jax.checkpoint must not change the training numerics."""
    import jax.numpy as jnp

    results = {}
    for remat in (False, True):
        cfg = train_cfg()
        cfg.train.remat = remat
        trainer = SoftmaxTrainer(cfg, NROF_CLASSES, model_cfg=TINY_MODEL)
        state = trainer.init_state(seed=0)
        rng_np = np.random.RandomState(0)
        imgs = rng_np.randint(0, 256, (8, 160, 160, 3), np.uint8)
        labels = rng_np.randint(0, NROF_CLASSES, 8).astype(np.int32)
        state, metrics = trainer.step_fn(state, imgs, labels)
        results[remat] = (float(metrics['loss']),
                          float(jnp.sum(jnp.abs(
                              state.params['logits']['kernel']))))
    assert results[False][0] == pytest.approx(results[True][0], rel=1e-5)
    assert results[False][1] == pytest.approx(results[True][1], rel=1e-5)


@pytest.mark.slow
def test_training_makes_embeddings_discriminative():
    """SURVEY §4 end-to-end check: after 2 tiny epochs on separable synthetic
    classes, same-class pairs must be much closer than cross-class pairs."""
    C = 4
    rng_np = np.random.RandomState(0)
    bases = [rng_np.randint(0, 200, (160, 160, 3)).astype(np.float32)
             for _ in range(C)]

    def make(n_per):
        imgs, labels = [], []
        for c in range(C):
            for _ in range(n_per):
                imgs.append(np.clip(bases[c] + rng_np.randn(160, 160, 3) * 10,
                                    0, 255))
                labels.append(c)
        order = rng_np.permutation(len(imgs))
        return (np.asarray(imgs, np.uint8)[order],
                np.asarray(labels, np.int32)[order])

    trainer = SoftmaxTrainer(train_cfg(), C, model_cfg=TINY_MODEL)
    state = trainer.init_state(seed=0)
    for epoch in range(2):
        imgs, labels = make(10)
        batches = [(imgs[i:i + 16], labels[i:i + 16])
                   for i in range(0, len(imgs), 16)]
        state, _ = trainer.train_epoch(state, iter(batches), epoch,
                                       log_every=0)

    fwd = trainer.embedding_forward(state)
    imgs, labels = make(6)
    embs = np.asarray(fwd(imgs), np.float32)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-4)

    d = ((embs[:, None] - embs[None, :]) ** 2).sum(-1)
    iu = np.triu_indices(len(embs), 1)
    same = (labels[:, None] == labels[None, :])[iu]
    pos, neg = d[iu][same].mean(), d[iu][~same].mean()
    assert pos < 0.3 * neg, f'pos {pos:.4f} vs neg {neg:.4f}'


@pytest.mark.slow
def test_pure_triplet_training():
    """softmax_factor 0 + triplet_factor > 0: the FaceNet-paper objective."""
    cfg = train_cfg(triplet_factor=1.0, softmax_factor=0.0)
    trainer = SoftmaxTrainer(cfg, NROF_CLASSES, model_cfg=TINY_MODEL)
    state = trainer.init_state(seed=0)
    rng_np = np.random.RandomState(0)
    # P x K style batch: 4 classes x 2 examples
    imgs = rng_np.randint(0, 256, (8, 160, 160, 3), np.uint8)
    labels = np.repeat(np.arange(4), 2).astype(np.int32)

    state, m0 = trainer.step_fn(state, imgs, labels)
    losses = [float(m0['triplet_loss'])]
    for _ in range(4):
        state, m = trainer.step_fn(state, imgs, labels)
        losses.append(float(m['triplet_loss']))
    # CE is excluded from the total; triplet must drive it down
    assert float(m['loss']) == pytest.approx(
        float(m['triplet_loss']) + float(m['regularization']), rel=1e-4)
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_random_crop_trains_on_larger_images():
    """With random_crop, the step crops load_size images back to image.size
    (reference 182 -> 160 recipe) — previously a silent no-op because the
    loader already emitted crop-sized images."""
    cfg = train_cfg()
    cfg.image.random_crop = True
    trainer = SoftmaxTrainer(cfg, NROF_CLASSES, model_cfg=TINY_MODEL)
    state = trainer.init_state(seed=0)
    rng_np = np.random.RandomState(0)
    imgs = rng_np.randint(0, 256, (4, 182, 182, 3), np.uint8)
    labels = rng_np.randint(0, NROF_CLASSES, 4).astype(np.int32)
    state, metrics = trainer.step_fn(state, imgs, labels)
    assert np.isfinite(float(metrics['loss']))


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """The driver's multi-chip check, run exactly as the driver runs it:
    a fresh process with NO XLA_FLAGS / platform hints — dryrun_multichip
    itself must force the 8 virtual CPU devices before backend init
    (regression for the round-1 MULTICHIP failure)."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)'],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'loss=' in out.stdout, out.stdout


def test_warm_start_from_bundle(trainer_and_state):
    """model.weights fine-tune path (RUNBOOK.md §D): backbone params and
    batch_stats graft in with shardings preserved; the classifier head,
    optimizer state and step stay fresh; shape mismatches fail loudly."""
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    trainer, state = trainer_and_state
    model = InceptionResnetV1(config=TINY_MODEL)
    variables = model.init(jax.random.PRNGKey(7),
                           np.zeros((1, 160, 160, 3), np.uint8), train=False)

    head_before = np.asarray(state.params['logits']['kernel'])
    warm = trainer.warm_start(state, variables)

    # backbone values grafted exactly
    def first_leaf(tree):
        return jax.tree_util.tree_leaves(tree)[0]
    np.testing.assert_array_equal(
        np.asarray(first_leaf(warm.params['backbone'])),
        np.asarray(first_leaf(variables['params'])))
    got_stats = jax.tree_util.tree_leaves(warm.batch_stats['backbone'])
    want_stats = jax.tree_util.tree_leaves(variables['batch_stats'])
    assert len(got_stats) == len(want_stats)
    for a, b in zip(got_stats, want_stats):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # head untouched, step fresh, shardings preserved
    np.testing.assert_array_equal(
        np.asarray(warm.params['logits']['kernel']), head_before)
    assert int(warm.step) == 0
    assert (warm.params['logits']['kernel'].sharding ==
            state.params['logits']['kernel'].sharding)
    assert (first_leaf(warm.params['backbone']).sharding ==
            first_leaf(state.params['backbone']).sharding)

    # one train step runs from the warm state
    batch, labels = synthetic_batches(1)[0]
    batch_shard = mesh_mod.batch_sharding(trainer.mesh)
    new_state, metrics = trainer.step_fn(
        warm, jax.device_put(batch, batch_shard),
        jax.device_put(labels, batch_shard))
    assert np.isfinite(float(metrics['loss']))

    # topology drift fails loudly
    other = InceptionResnetV1(config={**TINY_MODEL, 'output': {'size': 16}})
    bad = other.init(jax.random.PRNGKey(0),
                     np.zeros((1, 160, 160, 3), np.uint8), train=False)
    with pytest.raises(ValueError, match='shape mismatch'):
        trainer.warm_start(new_state, bad)


def test_frozen_bn_step_trains_params_not_stats(trainer_and_state):
    """Late-phase frozen-BN schedule (cfg.train.freeze_bn_epoch): the
    frozen step must leave batch_stats bit-identical while params still
    update; VERDICT r4 next #5's step-time experiment rides on this."""
    trainer, state = trainer_and_state
    batch, labels = synthetic_batches(1)[0]
    batch_shard = mesh_mod.batch_sharding(trainer.mesh)
    imgs = jax.device_put(batch, batch_shard)
    labs = jax.device_put(labels, batch_shard)

    stats_before = [np.asarray(x) for x in
                    jax.tree_util.tree_leaves(state.batch_stats)]
    params_before = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0])

    new_state, metrics = trainer.frozen_bn_step_fn(state, imgs, labs)
    assert np.isfinite(float(metrics['loss']))
    assert int(new_state.step) == 1

    stats_after = [np.asarray(x) for x in
                   jax.tree_util.tree_leaves(new_state.batch_stats)]
    for a, b in zip(stats_before, stats_after):
        np.testing.assert_array_equal(a, b)
    assert not np.array_equal(
        params_before,
        np.asarray(jax.tree_util.tree_leaves(new_state.params)[0]))

    # the regular step (same trainer) must still mutate stats
    state2, _ = trainer.step_fn(new_state, imgs, labs)
    stats2 = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(state2.batch_stats)]
    assert any(not np.array_equal(a, b)
               for a, b in zip(stats_after, stats2))
