"""Train the embedding network with softmax cross-entropy (+ optional center
and triplet losses) under pjit data parallelism.

Parity: reference apps/train_softmax.py (SURVEY.md §3.1) — Database ->
batched pipeline -> backbone + logits head -> Adam(eps=0.1) with the
piecewise LR schedule -> per-epoch checkpoints -> every-N-epochs validation
-> final model export.
"""

import click
from pathlib import Path

from facenet_tpu import callbacks, config, dataset, export, ioutils, logging
from facenet_tpu.train.checkpoint import CheckpointManager
from facenet_tpu.train.softmax import SoftmaxTrainer


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    cfg = config.train_softmax({'config': options['config_file']},
                               app_file_name=__file__)
    run(cfg)


def run(cfg):
    """Full training flow from a prepared config (shared with the
    distributed app, apps/train_softmax_distributed.py)."""
    logging.configure_logging(cfg.logs)

    # ------------------------------------------------------------------
    # datasets. With random_crop the TRAIN loader decodes larger images
    # (image.load_size, default size + 22 — the reference's 182 -> 160
    # recipe) and the in-step augmentation crops back to image.size; eval
    # always loads at the model input size.
    loader = dataset.ImageLoader(config=cfg.image)
    if cfg.image.random_crop:
        load_size = int(config.value_or(cfg.image.load_size,
                                        int(cfg.image.size) + 22))
        train_loader = dataset.ImageLoader(size=load_size)
    else:
        train_loader = loader

    train_dbase = dataset.Database(cfg.dataset)
    ioutils.write_text_log(cfg.logs.dir / 'report.txt', train_dbase)

    def use_pk_sampler():
        return (str(cfg.sampler or '') == 'pk' or
                float(cfg.loss.triplet_factor or 0.0) > 0)

    def train_batches(start_state=None):
        # P-classes x K-images batches when metric-learning losses are on
        # (semi-hard triplet mining needs same-class pairs in every batch,
        # ref dataset.py:46-101); plain shuffled batches otherwise
        if use_pk_sampler():
            return dataset.pipeline_with_equal_batches(
                train_loader, train_dbase.classes, cfg, seed=int(cfg.seed),
                start_state=start_state)
        return train_dbase.batches(train_loader,
                                   batch_size=int(cfg.batch_size),
                                   shuffle=True, repeat=True,
                                   drop_remainder=True, seed=int(cfg.seed),
                                   start_state=start_state)

    test_dbase = dataset.Database(cfg.validate.dataset)

    def test_batches():
        return test_dbase.batches(loader, batch_size=int(cfg.batch_size))

    # ------------------------------------------------------------------
    # trainer + state
    # cfg.model carries the zoo selection: `module:` picks the network
    # (IRv1/IRv2), `config:` its topology (models/__init__.py registry)
    trainer = SoftmaxTrainer(cfg, nrof_classes=train_dbase.nrof_classes,
                             model_cfg=cfg.model)

    # P x K batches must split evenly over the data mesh axis (device_put
    # with a sharded batch dim requires divisibility); bump P to the next
    # compatible value rather than crashing on the first step
    if use_pk_sampler():
        n_data = trainer.mesh.shape['data']
        p = int(config.value_or(cfg.nrof_classes_per_batch, 20))
        k = int(config.value_or(cfg.nrof_examples_per_class, 5))
        if (p * k) % n_data != 0:
            import math
            step = n_data // math.gcd(k, n_data)
            new_p = -(-p // step) * step
            print(f'adjusting nrof_classes_per_batch {p} -> {new_p} so the '
                  f'P*K batch splits over {n_data} data shards')
            cfg.nrof_classes_per_batch = new_p
    state = trainer.init_state(seed=int(cfg.seed))

    ckpt = CheckpointManager(cfg.model.path / 'checkpoints',
                             max_to_keep=cfg.checkpoint.max_to_keep or 3)

    # warm-start the backbone from a serving bundle / imported
    # reference-h5 weights (fine-tune-from-pretrained, RUNBOOK.md §D);
    # a checkpoint restore below overrides it when both are given
    if cfg.model.weights:
        from facenet_tpu.export import load_model
        bundle = load_model(cfg.model.weights)
        state = trainer.warm_start(state, bundle.variables)
        print(f'Warm-started backbone from {cfg.model.weights}')

    data_state = None
    if cfg.model.checkpoint:
        restore_mgr = CheckpointManager(cfg.model.checkpoint)
        restored, data_state = restore_mgr.restore(state,
                                                   with_data_state=True)
        if restored is not None:
            state = restored
            print(f'Restored checkpoint step {int(state.step)} '
                  f'from {cfg.model.checkpoint}' +
                  (f' (data cursor {data_state})' if data_state else ''))
        restore_mgr.close()

    validate_cb = callbacks.ValidateCallback(
        forward_factory=trainer.embedding_forward,
        batches_factory=test_batches,
        every_n_epochs=cfg.validate.every_n_epochs,
        max_nrof_epochs=cfg.train.epoch.max_nrof_epochs,
        config=cfg.validate,
        report_file=cfg.logs.dir / 'report.txt',
        h5file=cfg.logs.dir / 'report.h5')

    # ------------------------------------------------------------------
    # epoch loop. The pipeline's cursor rides along in every checkpoint,
    # so a killed run resumes mid-epoch on the exact next batch
    # (SURVEY.md §5 failure-recovery plan).
    max_epochs = int(cfg.train.epoch.max_nrof_epochs)
    pipeline = train_batches(start_state=data_state)
    batches_iter = iter(pipeline)

    # late-phase frozen-BN schedule: from this (0-based) epoch on, the
    # forward normalizes with running BN stats (train/softmax.py
    # frozen_bn) — 0 is a valid setting, so no `or`-defaulting
    freeze_bn_epoch = config.value_or(cfg.train.freeze_bn_epoch, None)

    for epoch in range(max_epochs):
        frozen = (freeze_bn_epoch is not None
                  and epoch >= int(freeze_bn_epoch))
        state, metrics = trainer.train_epoch(state, batches_iter, epoch,
                                             frozen_bn=frozen)
        print(f'epoch [{epoch + 1}/{max_epochs}] ' +
              ' '.join(f'{k}={v:.4f}' for k, v in metrics.items()))
        ioutils.write_text_log(
            cfg.logs.dir / 'report.txt',
            f'epoch [{epoch + 1}/{max_epochs}] {metrics}')

        ckpt.save(int(state.step), state, data_state=pipeline.state())
        validate_cb.on_epoch_end(epoch, state)

    # final export as a deployable bundle
    variables = {
        'params': state.params['backbone'],
        'batch_stats': state.batch_stats['backbone'],
    }
    export.save_model(cfg.model.path, trainer.backbone, variables)
    ckpt.close()

    print(f'Model and logs have been saved to the directory: {cfg.model.path}')


if __name__ == '__main__':
    main()
