"""validate-on-LFW at PROTOCOL SCALE on synthetic data (VERDICT r4 #4).

The real LFW protocol is 13,233 images over 5,749 identities, an official
pairs.txt of 10 consecutive folds x (300 same + 300 diff), and a report
with accuracy / VAL@FAR / AUC / EER (reference README.md "Validate on
LFW"; BASELINE.json configs[2]). Until round 4 the app had only ever run
on ~8 pairs; this tool exercises the REAL geometry end to end:

  1. render an LFW-SHAPED identity tree: 5,749 hard-mode identities with
     the long-tail image-count profile of LFW (4,069 singletons, ~1,680
     multi-image identities, a ~530-image heaviest identity; 13,233
     images total, 1-based `<name>/<name>_%04d.png` like LFW's),
  2. write the official-format pairs.txt (10 x (300+300), identity-
     disjoint folds — `lfw.generate_pairs`),
  3. train the hard-mode evidence model (the same train_softmax flow as
     tools/e2e_evidence_run.py) unless --model points at an existing
     exported bundle,
  4. run the REAL app — `facenet_tpu.apps.validate_on_lfw` via its CLI
     entry — with flip + subtract_mean (the upstream accuracy-boosting
     eval options) against the tree,
  5. copy the run artifacts into models/<stamp>-lfwprotocol/logs/ for
     commit (report txt/h5, the app yaml, revision info, wall time).

Identity ids are offset (3e6+) so they are DISJOINT from both the
training identities (0..) and the class-protocol eval identities (1e6+).

Usage:
    python tools/lfw_protocol_run.py --out models/          # full chain
    python tools/lfw_protocol_run.py --model <bundle> --out models/
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ID_OFFSET = 3_000_000


def lfw_shape_counts(n_identities=5749, n_images=13233, n_multi=1680,
                     heaviest=530, seed=0):
    """LFW-like long-tail per-identity image counts.

    Exactly `n_identities` entries summing to exactly `n_images`:
    singletons for everyone except `n_multi` identities whose extra
    images follow a Zipf-style tail scaled so the heaviest identity has
    ~`heaviest` images (LFW: George_W_Bush, 530).
    """
    if n_identities < n_multi:
        raise ValueError('n_multi exceeds n_identities')
    extra_total = n_images - n_identities          # images beyond 1 each
    if extra_total < n_multi:
        raise ValueError('not enough images for the multi-image tail')
    # Zipf tail: extra_i = (heaviest-1)/i^a with the exponent solved by
    # bisection so the tail sums to extra_total (keeps the heaviest
    # identity pinned at ~`heaviest` instead of rescaling it away)
    ranks = np.arange(1, n_multi + 1, dtype=np.float64)

    def tail_sum(a):
        return np.maximum((heaviest - 1) / ranks ** a, 1).sum()

    lo, hi = 0.1, 3.0
    for _ in range(60):
        mid = (lo + hi) / 2
        if tail_sum(mid) > extra_total:
            lo = mid
        else:
            hi = mid
    tail = np.maximum(np.round((heaviest - 1) / ranks ** lo), 1)
    # exact-total correction on the mid ranks
    diff = int(extra_total - tail.sum())
    i = n_multi // 4
    while diff != 0:
        step = 1 if diff > 0 else -1
        if tail[i] + step >= 1:
            tail[i] += step
            diff -= step
        i = (i + 1) % n_multi
    counts = np.ones(n_identities, dtype=np.int64)
    counts[:n_multi] += tail.astype(np.int64)
    rng = np.random.RandomState(seed)
    rng.shuffle(counts)
    assert counts.sum() == n_images, counts.sum()
    return counts


def _render_identity(job):
    root, class_id, label, count, size, seed, hard = job
    from PIL import Image

    from facenet_tpu.utils.synthetic import (identity_params,
                                             render_face_patch)

    rng = np.random.RandomState(seed)
    ident = identity_params(class_id, hard=hard)
    name = f'person_{label:05d}'
    cls_dir = Path(root) / name
    cls_dir.mkdir(parents=True, exist_ok=True)
    for i in range(1, count + 1):                  # 1-based, like LFW
        img = render_face_patch(size, ident, rng, hard=hard)
        Image.fromarray(img).save(cls_dir / f'{name}_{i:04d}.png')
    return count


def render_lfw_tree(root, counts, size=160, seed=11_000_000, workers=8,
                    hard=True):
    jobs = [(str(root), ID_OFFSET + lab, lab, int(c), size, seed + lab, hard)
            for lab, c in enumerate(counts)]
    t0 = time.time()
    done_imgs = 0
    with ProcessPoolExecutor(max_workers=workers) as pool:
        for n, c in enumerate(pool.map(_render_identity, jobs,
                                       chunksize=16), 1):
            done_imgs += c
            if n % 500 == 0:
                print(f'  rendered {n}/{len(jobs)} identities '
                      f'({done_imgs} images, {time.time() - t0:.0f}s)',
                      flush=True)
    print(f'  {len(jobs)} identities / {done_imgs} images in '
          f'{time.time() - t0:.0f}s', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', type=Path, default=None,
                    help='existing exported bundle; omit to train the '
                         'hard-mode evidence model first')
    ap.add_argument('--out', type=Path, default=Path('models'))
    ap.add_argument('--data-dir', type=Path, default=None)
    ap.add_argument('--identities', type=int, default=5749)
    ap.add_argument('--images', type=int, default=13233)
    ap.add_argument('--pairs', type=int, default=300)
    ap.add_argument('--folds', type=int, default=10)
    ap.add_argument('--batch-size', type=int, default=256)
    args = ap.parse_args()

    data_root = args.data_dir or Path(tempfile.mkdtemp(prefix='lfw_synth_'))
    tree = data_root / 'lfw_synth'

    # 1. LFW-shaped tree ------------------------------------------------
    # a partially rendered tree (interrupted prior run) must re-render,
    # not silently proceed at sub-protocol scale — count, don't probe
    n_existing = sum(1 for _ in tree.glob('*/*.png')) if tree.exists() else 0
    if n_existing and n_existing < args.images:
        print(f'partial tree found ({n_existing}/{args.images} images) — '
              f're-rendering from scratch')
        shutil.rmtree(tree)
        n_existing = 0
    if not n_existing:
        # scale the multi-image tail / heaviest identity down with the
        # requested size (smoke tests); full scale keeps the LFW profile
        frac = min(args.identities / 5749, 1.0)
        counts = lfw_shape_counts(
            args.identities, args.images,
            n_multi=max(int(1680 * frac), min(args.identities // 2, 10)),
            heaviest=max(int(530 * frac), 4))
        print(f'rendering LFW-shaped tree: {args.identities} identities / '
              f'{args.images} images (max {counts.max()}, '
              f'{int((counts > 1).sum())} multi-image) -> {tree}')
        render_lfw_tree(tree, counts)
    n_imgs = sum(1 for _ in tree.glob('*/*.png'))
    n_ids = sum(1 for _ in tree.iterdir())
    print(f'tree: {n_ids} identities, {n_imgs} images '
          f'(LFW: 5,749 / 13,233)')

    # 2. official-format pairs.txt -------------------------------------
    from facenet_tpu import lfw

    pairs_file = data_root / 'pairs.txt'
    if not pairs_file.exists():
        t0 = time.time()
        lfw.generate_pairs(tree, nrof_folds=args.folds,
                           nrof_pairs=args.pairs, seed=0,
                           output=pairs_file)
        print(f'pairs.txt: {args.folds} folds x 2 x {args.pairs} '
              f'({time.time() - t0:.0f}s)')
    pairs = lfw.read_pairs(pairs_file)
    assert len(pairs) == args.folds * 2 * args.pairs

    # 3. model ---------------------------------------------------------
    model_path = args.model
    if model_path is None:
        print('training the hard-mode evidence model first '
              '(tools/e2e_evidence_run.py flow)...')
        import subprocess
        run_root = data_root / 'train_run'
        # smaller eval set: its class-protocol validation is not the
        # artifact here (the committed evidence runs cover that); the
        # training recipe itself is the standard hard-mode one
        rc = subprocess.call([
            sys.executable, str(Path(__file__).parent /
                                'e2e_evidence_run.py'),
            '--hard', '--data-dir', str(data_root / 'train_data'),
            '--out', str(run_root), '--lfw-pairs', '0',
            '--eval-classes', '80', '--eval-images-per-class', '25'])
        if rc:
            raise SystemExit(f'training failed rc={rc}')
        runs = sorted((data_root / 'train_data' / 'run').glob('*'))
        model_path = runs[-1]
        print(f'trained bundle: {model_path}')

    # 4. the REAL app, via its CLI entry -------------------------------
    import yaml

    cfg_file = data_root / 'validate_on_lfw.yaml'
    cfg_file.write_text(yaml.safe_dump({
        'dataset': {'path': str(tree), 'pairs': str(pairs_file)},
        'model': {'path': str(model_path)},
        'batch_size': args.batch_size,
        'validate': {'nrof_folds': args.folds, 'metric': 0,
                     'far_target': 0.001, 'flip': True,
                     'subtract_mean': True},
    }))
    t0 = time.time()
    import subprocess
    rc = subprocess.call([sys.executable, '-m',
                          'facenet_tpu.apps.validate_on_lfw',
                          '--config', str(cfg_file)],
                         cwd=str(Path(__file__).resolve().parent.parent))
    wall = time.time() - t0
    if rc:
        raise SystemExit(f'validate_on_lfw failed rc={rc}')
    print(f'validate_on_lfw wall time: {wall:.0f}s')

    # 5. commit-able artifacts -----------------------------------------
    outdir = Path(str(tree) + '_' + Path(str(model_path)).stem)
    stamp = time.strftime('%Y%m%d-%H%M%S')
    dest = args.out / f'{stamp}-lfwprotocol' / 'logs'
    dest.mkdir(parents=True, exist_ok=True)
    for f in outdir.glob('*'):
        if f.is_file():
            shutil.copy2(f, dest / f.name)
    (dest / 'protocol_scale.txt').write_text(
        f'LFW-protocol-scale synthetic run\n'
        f'identities: {n_ids} (LFW: 5749)\n'
        f'images: {n_imgs} (LFW: 13233)\n'
        f'pairs: {len(pairs)} = {args.folds} folds x 2 x {args.pairs}\n'
        f'app wall time (embed + report, on-chip): {wall:.0f}s\n'
        f'model: {model_path}\n')
    print(f'artifacts copied to {dest}')
    for f in sorted(dest.glob('*')):
        print(' ', f.name, f'{f.stat().st_size / 1024:.0f} KiB')


if __name__ == '__main__':
    main()
