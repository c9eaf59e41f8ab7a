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
              help='Path to yaml config file with used options of the application.')
def main(**options):
    cfg = config.train_softmax({'config': options['config_file']},
                               app_file_name=__file__)

    if cfg.distributed.enable:
        import jax
        kwargs = {}
        if cfg.distributed.coordinator_address:
            kwargs['coordinator_address'] = str(cfg.distributed.coordinator_address)
        if cfg.distributed.num_processes:
            kwargs['num_processes'] = int(cfg.distributed.num_processes)
        if cfg.distributed.process_id is not None and cfg.distributed.process_id != '':
            kwargs['process_id'] = int(cfg.distributed.process_id)
        jax.distributed.initialize(**kwargs)

    import jax
    print(f'devices: {jax.device_count()} '
          f'({jax.local_device_count()} local, '
          f'process {jax.process_index()}/{jax.process_count()})')

    from facenet_tpu.apps.train_softmax import run
    run(cfg)


if __name__ == '__main__':
    main()
