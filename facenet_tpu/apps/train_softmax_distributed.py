"""Multi-chip / multi-host softmax training over the TPU mesh.

Parity: reference apps/train_softmax_tf2_gpus.py — the same training flow as
train_softmax wrapped in a device-parallel scope (ref :49-51 wraps model
build/compile/fit in tf.distribute.MirroredStrategy). TPU-native, the
"strategy" is declarative: a ('data', 'model') jax.sharding.Mesh over all
chips (facenet_tpu/parallel/mesh.py), batch sharded over 'data', the wide
identity-logits head optionally sharded over 'model'; XLA inserts the ICI
all-reduces the reference got from NCCL.

Multi-host: set `distributed.enable: true` (or pass coordinator options) and
this app calls `jax.distributed.initialize` before touching devices, so the
same mesh spans slices over DCN (SURVEY.md §2.8).
"""

import click
from pathlib import Path

from facenet_tpu import config


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    # Read the raw config cascade FIRST (no side effects): the full
    # preparer seeds jax RNGs, which initializes the local backend —
    # jax.distributed.initialize must run before any JAX computation.
    raw = config.load_config(__file__, {'config': options['config_file']})

    if raw.distributed.enable:
        import jax
        dist = raw.distributed

        # pin the backend platform BEFORE distributed init (the env var
        # route is unreliable under plugin backends — CLAUDE.md); used by
        # the single-process multi-host smoke test to stay on CPU
        if dist.platform:
            jax.config.update('jax_platforms', str(dist.platform))

        kwargs = {}
        if dist.coordinator_address:
            kwargs['coordinator_address'] = str(dist.coordinator_address)
        if dist.num_processes:
            kwargs['num_processes'] = int(dist.num_processes)
        pid = config.value_or(dist.process_id, None)
        if pid is not None:
            kwargs['process_id'] = int(pid)
        jax.distributed.initialize(**kwargs)

    cfg = config.train_softmax({'config': options['config_file']},
                               app_file_name=__file__)

    import jax
    print(f'devices: {jax.device_count()} '
          f'({jax.local_device_count()} local, '
          f'process {jax.process_index()}/{jax.process_count()})')

    from facenet_tpu.apps.train_softmax import run
    run(cfg)


if __name__ == '__main__':
    main()
