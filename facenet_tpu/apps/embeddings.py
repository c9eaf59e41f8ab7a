"""Compute embeddings for every image of a dataset and save them to disk.

Output container is chosen by the outfile suffix: `.h5` (h5utils layout),
`.npz` (numpy archive with file names), or TFRecord (dependency-free
framing from utils/tfrecord.py).

Parity: reference apps/embeddings.py (same CLI and h5/TFRecord outputs;
the npz container is an addition).

Beyond the reference: a `pipeline:` config section embeds RAW SCENES
(un-cropped photos) directly — detection, alignment and the embedding
forward run as one fused device dispatch per batch
(facenet_tpu/pipeline.py FacePipeline), replacing the reference's
extract_faces -> embeddings two-app round trip through PNG files:

    pipeline:
      image_shape: [480, 640]   # letterbox geometry
      align: crop               # or 'landmarks' (5-point warp)
      margin: 0.2

Images with no detected face are dropped from the output (count logged).
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


class _PipelineEmbeddings:
    """Raw scenes -> embeddings through the fused FacePipeline; rows
    whose scene yielded no valid detection are dropped."""

    def __init__(self, dbase, options):
        from facenet_tpu.pipeline import FacePipeline

        pcfg = options.pipeline
        shape = tuple(int(v) for v in pcfg.image_shape) \
            if pcfg.image_shape else (480, 640)
        from facenet_tpu import FaceNet
        pipe = FacePipeline(
            FaceNet(options.model),
            image_shape=shape,
            align=str(pcfg.align or 'crop'),
            margin=config.value_or(pcfg.margin, 0.2))
        emb, _, valid = pipe.process_files(
            dbase.files, batch_size=config.value_or(options.batch_size, 64))
        keep = valid[:, 0]
        self.embeddings = emb[keep, 0]
        self.labels = np.asarray(dbase.labels)[keep]
        self.files = [f for f, k in zip(dbase.files, keep) if k]
        self.nrof_images = len(self.files)
        self.dropped = int((~keep).sum())

    def __repr__(self):
        return (f'class {type(self).__name__}\n'
                f'embeddings {self.embeddings.shape}\n'
                f'scenes without a detected face: {self.dropped}')


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    options = config.embeddings(__file__, {'config': options['config_file']})

    dbase = dataset.DBase(options.dataset)
    if options.pipeline:
        result = _PipelineEmbeddings(dbase, options)
        file_source = result
    else:
        result = facenet.EvaluationOfEmbeddings(dbase, options)
        file_source = dbase

    for part in (dbase, result):
        ioutils.write_text_log(options.logfile, part)
        print(part)

    writer = _WRITERS.get(options.outfile.suffix, _save_tfrecord)
    writer(options.outfile, result, file_source)

    print('output file:', options.outfile)
    print('number of examples:', file_source.nrof_images)


if __name__ == '__main__':
    main()
