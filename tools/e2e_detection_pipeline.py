"""Full-pipeline evidence run: detect -> extract -> train -> validate.

The reference's complete workflow is raw photos -> extract_faces (detect +
align) -> train_softmax on the crops -> validate (SURVEY.md §0). The
companion tool (tools/e2e_evidence_run.py) proves the train/validate
chain on pre-aligned crops; THIS one proves the front door too: the
bundled MTCNN weights detect synthetic faces in raw scenes, the
extract_faces app crops them, and an embedding net TRAINED ON THOSE
CROPS separates unseen identities far above chance.

    python tools/e2e_detection_pipeline.py --out models/

Writes models/<run>-detectchain/logs/{report.txt, report.h5,
revision_info.txt, ...} plus extraction statistics.
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


def _render_scene_class(job):
    """One identity's directory of raw scenes (worker process)."""
    import numpy as np
    from PIL import Image

    from facenet_tpu.utils.synthetic import render_scene

    root, class_id, label, n_scenes, seed, hard = job
    rng = np.random.RandomState(seed)
    cls_dir = Path(root) / f'person_{label:04d}'
    cls_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n_scenes):
        img, boxes, _ = render_scene(rng, shape=(240, 240), n_faces=1,
                                     identities=[class_id],
                                     min_face=100, max_face=200, hard=hard)
        Image.fromarray(img).save(cls_dir / f's{i:03d}.png')
    return label


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--classes', type=int, default=200)
    ap.add_argument('--scenes-per-class', type=int, default=30)
    ap.add_argument('--eval-classes', type=int, default=200)
    ap.add_argument('--eval-images-per-class', type=int, default=40)
    ap.add_argument('--epochs', type=int, default=8)
    ap.add_argument('--batch-size', type=int, default=128)
    ap.add_argument('--out', type=Path, default=Path('models'))
    ap.add_argument('--data-dir', type=Path, default=None)
    ap.add_argument('--hard', action='store_true',
                    help='de-saturated identities (archetype+delta, extra '
                         'nuisance) so the chain accuracy is off-ceiling')
    args = ap.parse_args()

    import yaml

    data_root = args.data_dir or Path(tempfile.mkdtemp(prefix='e2e_chain_'))
    raw_dir = data_root / 'raw'

    # ------------------------------------------------------------------
    # 1. raw scenes: one identity-conditioned face per cluttered image
    if not raw_dir.exists() or not any(raw_dir.glob('*/*.png')):  # empty dir = failed prior run
        print(f'rendering {args.classes} classes x {args.scenes_per_class} '
              f'raw 240x240 scenes -> {raw_dir}', flush=True)
        t0 = time.time()
        jobs = [(str(raw_dir), c, c, args.scenes_per_class, 5_000 + c,
                 args.hard)
                for c in range(args.classes)]
        with ProcessPoolExecutor(max_workers=8) as pool:
            list(pool.map(_render_scene_class, jobs, chunksize=4))
        print(f'  rendered in {time.time() - t0:.0f}s')

    # eval: UNSEEN identities (ids offset 2*10^6), also as raw scenes —
    # the reference's eval data is detector-aligned too (SURVEY.md §6:
    # "frcnnv3-aligned 160px"), so eval crops must come out of the same
    # detector as the training crops
    eval_raw = data_root / 'eval_raw'
    if not eval_raw.exists() or not any(eval_raw.glob('*/*.png')):
        print(f'rendering eval scenes: {args.eval_classes} unseen classes '
              f'x {args.eval_images_per_class}', flush=True)
        jobs = [(str(eval_raw), 2 * 10 ** 6 + c, c,
                 args.eval_images_per_class, 9_000_000 + c, args.hard)
                for c in range(args.eval_classes)]
        with ProcessPoolExecutor(max_workers=8) as pool:
            list(pool.map(_render_scene_class, jobs, chunksize=4))

    # ------------------------------------------------------------------
    # 2. extract_faces with the BUNDLED detector (detect + crop + resize)
    def extract(src, dst, tag):
        if dst.exists() and any(dst.glob('*/*.png')):
            return
        from click.testing import CliRunner

        from facenet_tpu.apps.extract_faces import main as extract_main

        cfg = {
            'dataset': {'path': str(src)},
            'outdir': str(dst),
            'detector': 'mtcnn',
            'image': {'size': 160, 'margin': 0},
            'detect_multiple_faces': False,
        }
        cfg_file = data_root / f'extract_{tag}.yaml'
        cfg_file.write_text(yaml.safe_dump(cfg))
        print(f'running extract_faces on {tag} (bundled MTCNN)...',
              flush=True)
        t0 = time.time()
        result = CliRunner().invoke(extract_main, ['--config', str(cfg_file)])
        if result.exit_code != 0:
            print(result.output)
            raise SystemExit('extract_faces failed')
        n_raw = sum(1 for _ in src.glob('*/*.png'))
        n_crops = sum(1 for _ in dst.glob('*/*.png'))
        rate = n_crops / max(n_raw, 1)
        print(f'  {n_crops}/{n_raw} faces extracted '
              f'({rate:.1%}) in {time.time() - t0:.0f}s')
        if rate < 0.8:
            raise SystemExit(f'extraction rate {rate:.1%} too low — '
                             'detector regression?')

    extracted = data_root / 'raw_extracted_160'
    eval_dir = data_root / 'eval_extracted_160'
    extract(raw_dir, extracted, 'train')
    extract(eval_raw, eval_dir, 'eval')

    # ------------------------------------------------------------------
    # 3. train on the detector's own crops; validate on unseen identities
    from facenet_tpu import config as config_mod
    from facenet_tpu.apps import train_softmax as ts_app

    n_images = sum(1 for _ in extracted.glob('*/*.png'))
    steps = max(n_images // args.batch_size, 1)
    run_root = data_root / 'run'
    cfg_dict = {
        'seed': 0,
        'batch_size': args.batch_size,
        'dataset': {'path': str(extracted)},
        'model': {'path': str(run_root)},
        'image': {'size': 160, 'normalization': 0,
                  'random_crop': False, 'random_flip': True},
        'train': {
            'adam_epsilon': 0.1,
            'epoch': {'size': steps, 'max_nrof_epochs': args.epochs},
            'learning_rate': {'schedule': [
                [max(args.epochs - 4, 1), 0.05],
                [max(args.epochs - 2, 2), 0.005],
                [args.epochs, 0.0005]]},
        },
        'loss': {'center_alfa': 0.95, 'center_factor': 0.5},
        'validate': {
            'dataset': {'path': str(eval_dir)},
            'every_n_epochs': args.epochs,
            'validate': {'metric': 0, 'nrof_folds': 10,
                         'far_target': 0.001},
        },
    }
    cfg_file = data_root / 'chain_train.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg_dict))

    t0 = time.time()
    cfg = config_mod.train_softmax({'config': cfg_file},
                                   app_file_name=ts_app.__file__)
    ts_app.run(cfg)
    print(f'train+validate+export: {time.time() - t0:.0f}s')

    # ------------------------------------------------------------------
    # 4. commit-able evidence
    run_dir = Path(str(cfg.model.path))
    logs_src = Path(str(cfg.logs.dir))
    dest = args.out / (run_dir.name + '-detectchain'
                       + ('-hard' if args.hard else '')) / 'logs'
    dest.mkdir(parents=True, exist_ok=True)
    for f in logs_src.glob('*'):
        if f.is_file():
            shutil.copy2(f, dest / f.name)
    with (dest / 'extraction.txt').open('w') as f:
        n_raw = sum(1 for _ in raw_dir.glob('*/*.png'))
        n_crops = sum(1 for _ in extracted.glob('*/*.png'))
        f.write(f'raw scenes: {n_raw}\nextracted crops: {n_crops}\n'
                f'extraction rate: {n_crops / max(n_raw, 1):.4f}\n'
                'detector: bundled mtcnn_synthetic.npz\n')
    print(f'evidence logs copied to {dest}')


if __name__ == '__main__':
    main()
