"""Export a serving bundle from a train_softmax Orbax checkpoint.

Recovery path when a training run saved its checkpoints but died before
the final export (the checkpoint carries the full TrainState; the bundle
needs only the backbone variables). Mirrors the export step of
apps/train_softmax.py.

Usage:
    python tools/export_from_checkpoint.py <run_dir> <out_bundle>
      [--classes N]  (the run's class count; default read from the
                      train_softmax.yaml in <run_dir>/logs)
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('run_dir', type=Path)
    ap.add_argument('out', type=Path)
    ap.add_argument('--classes', type=int, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')   # restore needs no TPU

    from facenet_tpu import export
    from facenet_tpu.config import Config
    from facenet_tpu.train.checkpoint import CheckpointManager
    from facenet_tpu.train.softmax import SoftmaxTrainer

    nrof_classes = args.classes
    if nrof_classes is None:
        # default promised by the usage string: recover the class count
        # from the run's own saved config. The yaml records the dataset
        # path (the count itself is derived from the Database scan at
        # train time), so re-count its class directories — the standard
        # recovery scenario is same-machine, dataset still in place.
        import yaml

        run_yaml = args.run_dir / 'logs' / 'train_softmax.yaml'
        data_path = None
        if run_yaml.exists():
            saved = yaml.safe_load(run_yaml.read_text()) or {}
            data_path = Path(str((saved.get('dataset') or {})
                                 .get('path', ''))).expanduser()
        if data_path and data_path.is_dir():
            nrof_classes = sum(1 for d in data_path.iterdir() if d.is_dir())
        if not nrof_classes:
            raise SystemExit(
                f'--classes is required: could not derive the class count '
                f'from {run_yaml} (dataset path missing or moved); the '
                f'count determines the checkpoint state structure')
    print(f'classes: {nrof_classes}')

    # Only the STATE STRUCTURE matters for restore: default IRv1-512
    # backbone, center-loss table present (the evidence recipe trains
    # with center loss), single-device mesh.
    cfg = Config({
        'batch_size': 2,
        'image': {'size': 160, 'normalization': 0,
                  'random_crop': False, 'random_flip': False},
        'train': {'adam_epsilon': 0.1,
                  'epoch': {'size': 1, 'max_nrof_epochs': 1},
                  'learning_rate': {'schedule': [[100, 0.01]]}},
        'loss': {'center_alfa': 0.95, 'center_factor': 0.5},
    })
    trainer = SoftmaxTrainer(cfg, nrof_classes=nrof_classes)
    state = trainer.init_state(seed=int(cfg.seed or 0))
    mgr = CheckpointManager(args.run_dir / 'checkpoints')
    restored, _ = mgr.restore(state, with_data_state=True)
    if restored is None:
        raise SystemExit(f'no checkpoint under {args.run_dir}/checkpoints')
    print(f'restored step {int(restored.step)}')
    mgr.close()

    variables = {
        'params': restored.params['backbone'],
        'batch_stats': restored.batch_stats['backbone'],
    }
    export.save_model(args.out, trainer.backbone, variables)
    print(f'bundle exported to {args.out}')


if __name__ == '__main__':
    main()
