"""Compute embeddings for every image of a dataset and save them to disk.

Output container is chosen by the outfile suffix: `.h5` (h5utils layout),
`.npz` (numpy archive with file names), or TFRecord (dependency-free
framing from utils/tfrecord.py).

Parity: reference apps/embeddings.py (same CLI and h5/TFRecord outputs;
the npz container is an addition).
"""

import click
from pathlib import Path

import numpy as np

from facenet_tpu import config, dataset, facenet, h5utils, ioutils


def _save_h5(path, result, dbase):
    h5utils.write(path, 'embeddings', result.embeddings)
    h5utils.write(path, 'labels', result.labels)


def _save_npz(path, result, dbase):
    np.savez(path, embeddings=result.embeddings, labels=result.labels,
             files=np.array(dbase.files))


def _save_tfrecord(path, result, dbase):
    from facenet_tpu.utils.tfrecord import write_embeddings_tfrecord
    write_embeddings_tfrecord(path, result.embeddings, result.labels,
                              dbase.files)


_WRITERS = {'.h5': _save_h5, '.npz': _save_npz}


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    options = config.embeddings(__file__, {'config': options['config_file']})

    dbase = dataset.DBase(options.dataset)
    result = facenet.EvaluationOfEmbeddings(dbase, options)

    for part in (dbase, result):
        ioutils.write_text_log(options.logfile, part)
        print(part)

    writer = _WRITERS.get(options.outfile.suffix, _save_tfrecord)
    writer(options.outfile, result, dbase)

    print('output file:', options.outfile)
    print('number of examples:', dbase.nrof_images)


if __name__ == '__main__':
    main()
