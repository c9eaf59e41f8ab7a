"""Extract embeddings for a dataset and store them (h5 / npz / tfrecord).

Parity: reference apps/embeddings.py.
"""

import click
from pathlib import Path

import numpy as np

from facenet_tpu import config, dataset, facenet, h5utils, ioutils


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    options = config.embeddings(__file__, {'config': options['config_file']})

    dbase = dataset.DBase(options.dataset)
    ioutils.write_text_log(options.logfile, dbase)
    print(dbase)

    embeddings = facenet.EvaluationOfEmbeddings(dbase, options)
    ioutils.write_text_log(options.logfile, embeddings)
    print(embeddings)

    if options.outfile.suffix == '.h5':
        h5utils.write(options.outfile, 'embeddings', embeddings.embeddings)
        h5utils.write(options.outfile, 'labels', embeddings.labels)
    elif options.outfile.suffix == '.npz':
        np.savez(options.outfile, embeddings=embeddings.embeddings,
                 labels=embeddings.labels, files=np.array(dbase.files))
    else:
        from facenet_tpu.utils.tfrecord import write_embeddings_tfrecord
        write_embeddings_tfrecord(options.outfile, embeddings.embeddings,
                                  embeddings.labels, dbase.files)

    print('output file:', options.outfile)
    print('number of examples:', dbase.nrof_images)


if __name__ == '__main__':
    main()
