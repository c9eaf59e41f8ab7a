"""End-to-end evidence run at the reference evaluation geometry.

The reference tree proves its pipeline with committed run logs
(reference models/20200820-121641/logs/report.txt: train -> validate at
530 classes / 26,489 images -> accuracy blocks). This tool reproduces
that artifact chain for the rebuild with ONE invocation:

  1. render a synthetic identity TRAIN set (~500 classes, 182px crops —
     the reference's 182 -> 160 random-crop recipe) and an EVAL set of
     UNSEEN identities at the reference geometry (530 classes x 50
     images ~= 26,489 images; SURVEY.md §6),
  2. run the real `train_softmax` app flow (full Inception-ResNet-v1-512,
     Adam eps 0.1, piecewise LR, center loss, random crop/flip, Orbax
     checkpoints, every-N-epochs 10-fold validation, final export),
  3. copy the run's logs/{report.txt, report.h5, revision_info.txt,
     arguments yaml} into models/<run>/logs/ in the repo.

Usage (defaults reproduce the committed evidence):
    python tools/e2e_evidence_run.py --out models/
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from concurrent.futures import ProcessPoolExecutor

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _render_class(job):
    """One class directory of identity crops (runs in a worker process)."""
    import numpy as np

    from facenet_tpu.utils.synthetic import identity_params, render_face_patch

    root, class_id, label, n_images, size, seed, hard = job
    rng = np.random.RandomState(seed)
    ident = identity_params(class_id, hard=hard)
    cls_dir = Path(root) / f'person_{label:04d}'
    cls_dir.mkdir(parents=True, exist_ok=True)
    from PIL import Image
    for i in range(n_images):
        img = render_face_patch(size, ident, rng, hard=hard)
        Image.fromarray(img).save(cls_dir / f'person_{label:04d}_{i:04d}.png')
    return label


def render_identity_set(root, class_ids, n_images, size, seed, workers=8,
                        hard=False):
    jobs = [(str(root), cid, lab, n_images, size, seed + lab, hard)
            for lab, cid in enumerate(class_ids)]
    t0 = time.time()
    with ProcessPoolExecutor(max_workers=workers) as pool:
        for n, _ in enumerate(pool.map(_render_class, jobs, chunksize=4), 1):
            if n % 100 == 0:
                print(f'  rendered {n}/{len(jobs)} classes '
                      f'({time.time() - t0:.0f}s)', flush=True)
    print(f'  {len(jobs)} classes x {n_images} images in '
          f'{time.time() - t0:.0f}s')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--classes', type=int, default=500)
    ap.add_argument('--images-per-class', type=int, default=40)
    ap.add_argument('--eval-classes', type=int, default=530)
    ap.add_argument('--eval-images-per-class', type=int, default=50)
    ap.add_argument('--batch-size', type=int, default=256)
    ap.add_argument('--epochs', type=int, default=10)
    ap.add_argument('--validate-every', type=int, default=5)
    ap.add_argument('--out', type=Path, default=Path('models'))
    ap.add_argument('--data-dir', type=Path, default=None,
                    help='reuse/keep rendered datasets here')
    ap.add_argument('--center-loss', type=float, default=0.5)
    ap.add_argument('--lfw-pairs', type=int, default=300,
                    help='fixed-pairs protocol pairs per fold per kind '
                         '(10 folds; 300 = the 6,000-pair LFW geometry). '
                         '0 disables the stage.')
    ap.add_argument('--freeze-bn-epoch', type=int, default=None,
                    help='0-based epoch from which BN stats freeze '
                         '(late-phase frozen-BN schedule; VERDICT r4 #5 '
                         'step-time/accuracy experiment)')
    ap.add_argument('--hard', action='store_true',
                    help='de-saturated benchmark mode: family-overlapped '
                         'identities + heavy per-image nuisance '
                         '(utils/synthetic.py hard=True). The standard '
                         'evidence configuration since round 3.')
    args = ap.parse_args()

    data_root = args.data_dir or Path(tempfile.mkdtemp(prefix='e2e_data_'))
    train_dir = data_root / 'train'
    eval_dir = data_root / 'eval'

    # ------------------------------------------------------------------
    # 1. datasets. Eval identities are DISJOINT from training identities
    # (ids offset by 10^6), matching the reference protocol of validating
    # on a dataset of unseen people (SURVEY.md §6: MegaFace subset).
    if not train_dir.exists() or not any(train_dir.glob('*/*.png')):  # empty dir = failed prior run
        print(f'rendering train set: {args.classes} classes '
              f'x {args.images_per_class} @182px -> {train_dir}'
              f'{" (hard)" if args.hard else ""}')
        render_identity_set(train_dir, range(args.classes),
                            args.images_per_class, size=182, seed=0,
                            hard=args.hard)
    if not eval_dir.exists() or not any(eval_dir.glob('*/*.png')):  # empty dir = failed prior run
        print(f'rendering eval set: {args.eval_classes} unseen classes '
              f'x {args.eval_images_per_class} @182px -> {eval_dir}'
              f'{" (hard)" if args.hard else ""}')
        render_identity_set(eval_dir,
                            range(10 ** 6, 10 ** 6 + args.eval_classes),
                            args.eval_images_per_class, size=182,
                            seed=7_000_000, hard=args.hard)
    n_eval = sum(1 for _ in eval_dir.glob('*/*.png'))
    print(f'eval geometry: {args.eval_classes} classes, {n_eval} images '
          '(reference: 530 classes / 26,489 images)')

    # ------------------------------------------------------------------
    # 2. the real app flow, via the same config preparer the CLI uses
    import yaml

    steps = (args.classes * args.images_per_class) // args.batch_size
    run_root = data_root / 'run'
    cfg_dict = {
        'seed': 0,
        'batch_size': args.batch_size,
        'dataset': {'path': str(train_dir)},
        'model': {'path': str(run_root)},
        'image': {'size': 160, 'normalization': 0,
                  'random_crop': True, 'random_flip': True},
        'train': {
            'adam_epsilon': 0.1,
            'epoch': {'size': steps, 'max_nrof_epochs': args.epochs},
            'learning_rate': {'schedule': [
                [max(args.epochs - 6, 1), 0.05],
                [max(args.epochs - 3, 2), 0.005],
                [args.epochs, 0.0005]]},
            **({'freeze_bn_epoch': args.freeze_bn_epoch}
               if args.freeze_bn_epoch is not None else {}),
        },
        'loss': {'center_alfa': 0.95, 'center_factor': args.center_loss},
        'validate': {
            'dataset': {'path': str(eval_dir)},
            'every_n_epochs': args.validate_every,
            'validate': {'metric': 0, 'nrof_folds': 10,
                         'far_target': 0.001},
        },
    }
    cfg_file = data_root / 'e2e_train_softmax.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg_dict))

    from facenet_tpu import config as config_mod
    from facenet_tpu.apps import train_softmax as ts_app

    t0 = time.time()
    cfg = config_mod.train_softmax({'config': cfg_file},
                                   app_file_name=ts_app.__file__)
    ts_app.run(cfg)
    print(f'training + validation + export: {time.time() - t0:.0f}s')

    # ------------------------------------------------------------------
    # 2b. the standard fixed-pairs (validate-on-LFW) protocol over the
    # unseen identities — the published-number protocol at LFW geometry
    # (nrof_folds x 2 x lfw-pairs pairs from identity-disjoint folds),
    # evaluated on the exported bundle. Writes validate_on_lfw.{txt,h5}
    # next to report.txt so the evidence chain carries both protocols.
    logs_src = Path(str(cfg.logs.dir))
    if args.lfw_pairs:
        from facenet_tpu import lfw
        from facenet_tpu.apps.validate_on_lfw import _embed
        from facenet_tpu.config import Config

        t0 = time.time()
        pairs_file = data_root / 'pairs.txt'
        lfw.generate_pairs(eval_dir, nrof_folds=10,
                           nrof_pairs=args.lfw_pairs, seed=0,
                           output=pairs_file)
        pairs = lfw.read_pairs(pairs_file)
        paths, issame, skipped = lfw.get_paths(eval_dir, pairs)
        assert not skipped, f'{skipped} generated pairs failed to resolve'
        emb = _embed(paths, Config({
            'model': {'path': str(cfg.model.path), 'normalize': True},
            'image': {'size': 160}, 'batch_size': args.batch_size,
            'validate': {}}))
        report = lfw.LfwValidation(emb, issame,
                                   {'nrof_folds': 10, 'metric': 0,
                                    'far_target': 0.001})
        report.write_report(logs_src / 'validate_on_lfw.txt')
        report.write_h5file(logs_src / 'validate_on_lfw.h5')
        print(f'fixed-pairs protocol ({len(issame)} pairs): '
              f'{report.accuracy:.5f}+-{report.accuracy_std:.5f} '
              f'({time.time() - t0:.0f}s)')

    # ------------------------------------------------------------------
    # 3. commit-able evidence: copy the log chain into models/<run>/logs
    run_dir = Path(str(cfg.model.path))
    dest = args.out / run_dir.name / 'logs'
    dest.mkdir(parents=True, exist_ok=True)
    for f in logs_src.glob('*'):
        if f.is_file():
            shutil.copy2(f, dest / f.name)
    print(f'evidence logs copied to {dest}')
    for f in sorted(dest.glob('*')):
        print(' ', f, f'{f.stat().st_size / 1024:.0f} KiB')


if __name__ == '__main__':
    main()
