"""Validate a face recognizer on the standard LFW fixed-pairs protocol.

The reference's published headline number — LFW 0.99650+-0.00252
(/root/reference/README.md:55) — is produced by the upstream
"validate_on_lfw" flow the README points at; BASELINE.json configs[2]
names this flow ("validate-on-LFW: batched embedding extraction + 10-fold
pairwise-distance accuracy/ROC") as a required capability. The in-tree
reference only ships the class-directory protocol (apps/validate.py);
this app adds the pairs one:

  pairs.txt -> resolve image paths -> batched TPU embedding extraction
  -> 10-fold fixed-pairs accuracy / VAL@FAR / ROC (facenet_tpu/lfw.py)
  -> report.txt + .h5 in `<dataset>_<model>/`.

One-command real-data parity check: once aligned LFW crops and the
official pairs.txt are on disk (and, if desired, a reference checkpoint
imported via models/import_weights.py), this single command reproduces
the published evaluation:

    python -m facenet_tpu.apps.validate_on_lfw --config lfw.yaml

Eval options of the upstream flow are supported: `validate.subtract_mean`
(per-fold train-mean subtraction) and `validate.flip` (embed horizontally
flipped images too and concatenate the features — distances then use the
2D-dimensional concatenation).
"""

from pathlib import Path

import click
import numpy as np

from facenet_tpu import config, dataset, facenet, ioutils, lfw


def _embed(paths, options):
    """Batched embeddings for an explicit path list, order-preserving."""
    from facenet_tpu import FaceNet

    model = FaceNet(options.model)
    loader = dataset.ImageLoader(config=options.image)
    batch_size = int(config.value_or(options.batch_size, 100))

    def run(forward):
        batches = dataset.BatchLoader(paths, np.arange(len(paths)), loader,
                                      batch_size, shuffle=False)
        emb, order = facenet.evaluate_embeddings(
            forward, batches, renormalize=model.normalize)
        # BatchLoader preserves order with shuffle=False; re-sort by the
        # index labels anyway so the pair structure can never silently skew
        return emb[np.argsort(order, kind='stable')]

    embeddings = run(model.dispatch)
    if options.validate.flip:
        flipped = run(lambda images: model.dispatch(
            np.asarray(images, dtype=np.uint8)[:, :, ::-1]))
        embeddings = np.concatenate([embeddings, flipped], axis=1)
    return embeddings


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    started = ioutils.get_time()
    options = config.validate_on_lfw(__file__,
                                     {'config': options['config_file']})

    def stage(obj):
        ioutils.write_text_log(options.logfile, obj)
        print(obj)
        return obj

    pairs = lfw.read_pairs(options.dataset.pairs)
    paths, issame, nrof_skipped = lfw.get_paths(
        options.dataset.path, pairs, options.dataset.file_ext or None)
    if not len(issame):
        raise SystemExit(f'no resolvable pairs under {options.dataset.path} '
                         f'({nrof_skipped} skipped)')
    stage(f'pairs file: {options.dataset.pairs}\n'
          f'pairs: {len(issame)} ({int(np.count_nonzero(issame))} same), '
          f'skipped: {nrof_skipped}\n'
          f'model: {options.model.path}')

    embeddings = _embed(paths, options)
    stage(f'embeddings: {embeddings.shape}')

    report = stage(lfw.LfwValidation(embeddings, issame, options.validate))
    report.write_h5file(Path(options.logfile).with_suffix('.h5'))

    ioutils.write_elapsed_time(options.logfile, started)
    print(f'report written to {options.logfile}')


if __name__ == '__main__':
    main()
