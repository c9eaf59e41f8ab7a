"""Validate a face recognizer: embeddings + 10-fold pair accuracy/ROC/EER.

Parity: reference apps/validate.py (dataset -> EvaluationOfEmbeddings ->
FaceToFaceValidation -> text report).
"""

import click
from pathlib import Path

from facenet_tpu import config, dataset, facenet, ioutils, statistics

start_time = ioutils.get_time()


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='Path to yaml config file with used options for the application.')
def main(**options):
    options = config.validate(__file__, {'config': options['config_file']})
    options.model.normalize = True

    dbase = dataset.DBase(options.dataset)
    ioutils.write_text_log(options.logfile, dbase)
    print(dbase)

    embeddings = facenet.EvaluationOfEmbeddings(dbase, options)
    ioutils.write_text_log(options.logfile, embeddings)
    print(embeddings)

    # optional: shard the all-pairs statistics over the mesh (same
    # mesh block as embedding extraction; data null = all devices)
    if options.mesh:
        import jax
        from facenet_tpu.parallel import mesh as mesh_mod
        n_data = int(config.value_or(options.mesh.data, jax.device_count()))
        if n_data > 1:
            statistics.set_eval_mesh(mesh_mod.create_mesh(data=n_data,
                                                          model=1))

    validate = statistics.FaceToFaceValidation(
        embeddings.embeddings, embeddings.labels, options.validate)
    ioutils.write_text_log(options.logfile, validate)
    validate.write_h5file(Path(options.logfile).with_suffix('.h5'))
    print(validate)

    ioutils.write_elapsed_time(options.logfile, start_time)
    print('Report has been written to the file', options.logfile)


if __name__ == '__main__':
    main()
