"""Worker process for the multi-process distributed tests (not collected
by pytest — launched as a subprocess by tests/test_distributed_init.py).

Each worker owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
two workers form an 8-device global mesh over jax.distributed. Modes:

  psum   — cross-process psum over the global mesh (collective smoke)
  train  — ONE SoftmaxTrainer step on a (data=4, model=2) mesh where the
           'data' axis spans both processes (gradient all-reduce crosses
           the process boundary — the DCN pattern) and each process
           contributes its local batch rows via
           parallel.mesh.distribute_batch.
  epoch  — trainer.train_epoch with identical global batches on both
           processes (the distributed app's flow: the epoch loop slices
           each process's rows itself).
  eval   — multi-host confusion_counts: each process passes ONLY its row
           stripe of the embedding set; the column all-gather and the
           histogram psum cross the process boundary, and the result must
           equal the single-process computation over the full set.
"""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    coord, pid, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)

    import numpy as np

    assert jax.process_count() == 2
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    if mode == 'psum':
        import jax.numpy as jnp
        from functools import partial
        try:
            from jax import shard_map
        except ImportError:  # jax < 0.8
            from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()).reshape(8), ('data',))

        @partial(shard_map, mesh=mesh, in_specs=P('data'), out_specs=P())
        def total(x):
            return jax.lax.psum(jnp.sum(x), 'data')

        local = np.arange(4, dtype=np.float32) + 10 * jax.process_index()
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P('data')), local)
        print(f'RESULT {float(np.asarray(total(arr))):.4f}', flush=True)
        return

    if mode == 'eval':
        from facenet_tpu import statistics
        from facenet_tpu.parallel import mesh as mesh_mod

        rng = np.random.RandomState(0)      # same stream in both processes
        n, d = 23, 32                       # uneven split: 12 + 11 rows
        emb = rng.normal(size=(n, d))
        emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)
               ).astype(np.float32)
        labels = rng.choice([3, 7, 9, 12], size=n)  # non-dense label values
        thresholds = np.arange(0.25, 4.0, 0.25, dtype=np.float32)

        lo, hi = (0, 12) if pid == 0 else (12, n)
        mesh = mesh_mod.create_mesh(data=8, model=1)
        got = statistics.confusion_counts(
            emb[lo:hi], labels[lo:hi], thresholds, metric=0, mesh=mesh)
        # oracle: the plain single-device path over the FULL set (both
        # processes hold it — same rng stream)
        want = statistics.confusion_counts(emb, labels, thresholds, metric=0)
        for g, w in zip(got, want):
            assert np.allclose(g, w, atol=1e-5), (g, w)
        print(f'RESULT {float(sum(x.sum() for x in got)):.6f}', flush=True)
        return

    # ---- mode == 'train': full train step across both processes
    from facenet_tpu.config import Config
    from facenet_tpu.parallel import mesh as mesh_mod
    from facenet_tpu.train.softmax import SoftmaxTrainer

    tiny = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
            'block8_1': {'repeat': 1}, 'output': {'size': 32}}
    cfg = Config({
        'batch_size': 8,
        'image': {'size': 160, 'normalization': 0,
                  'random_crop': False, 'random_flip': False},
        'train': {'adam_epsilon': 0.1,
                  'epoch': {'size': 1, 'max_nrof_epochs': 1},
                  'learning_rate': {'schedule': [[100, 0.01]]}},
        'loss': {'center_alfa': 0.95, 'center_factor': 0.5},
    })
    # data axis spans processes (rows 0-1 local to proc 0, 2-3 to proc 1)
    mesh = mesh_mod.create_mesh(data=4, model=2)
    trainer = SoftmaxTrainer(cfg, nrof_classes=16, model_cfg=tiny, mesh=mesh)
    state = trainer.init_state(seed=0)

    rng = np.random.RandomState(0)          # same stream in both processes
    images = rng.randint(0, 256, (8, 160, 160, 3), dtype=np.uint8)
    labels = rng.randint(0, 16, 8).astype(np.int32)
    lo, hi = (0, 4) if pid == 0 else (4, 8)  # this process's rows

    if mode == 'epoch':
        # the app-level flow: train_epoch receives the IDENTICAL global
        # batch on every process and slices this process's rows itself
        def batches():
            for step in range(2):
                yield images, labels

        state, metrics = trainer.train_epoch(state, batches(), epoch=0,
                                             log_every=0)
        loss = metrics['loss']
        assert np.isfinite(loss)
        print(f'RESULT {loss:.6f}', flush=True)
        return

    shard = mesh_mod.batch_sharding(mesh)
    g_images = mesh_mod.distribute_batch(mesh, images[lo:hi], shard)
    g_labels = mesh_mod.distribute_batch(mesh, labels[lo:hi], shard)
    assert g_images.shape[0] == 8            # global batch reassembled

    state, metrics = trainer.step_fn(state, g_images, g_labels)
    loss = float(np.asarray(metrics['loss']))
    assert np.isfinite(loss)
    print(f'RESULT {loss:.6f}', flush=True)


if __name__ == '__main__':
    main()
