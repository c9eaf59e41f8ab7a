"""Validate a face recognizer: dataset -> embeddings -> K-fold pair report.

Capability parity with the reference validate app (reference
apps/validate.py): index the dataset, run every image through the model,
feed the L2-normalized embeddings to FaceToFaceValidation, and append each
stage's repr to the run log. Differences by design: embeddings and the
pair statistics can shard over a device mesh, and the metric history also
lands in an .h5 next to the text report.
"""

from pathlib import Path

import click

from facenet_tpu import config, dataset, facenet, ioutils, statistics


def _maybe_shard_eval(options):
    """Point the statistics stack at a data-parallel mesh when configured."""
    if not options.mesh:
        return
    import jax
    from facenet_tpu.parallel import mesh as mesh_mod

    n_data = int(config.value_or(options.mesh.data, jax.device_count()))
    if n_data > 1:
        statistics.set_eval_mesh(mesh_mod.create_mesh(data=n_data, model=1))


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    started = ioutils.get_time()
    options = config.validate(__file__, {'config': options['config_file']})
    options.model.normalize = True

    def stage(obj):
        """Every pipeline stage logs its repr to the run log and stdout."""
        ioutils.write_text_log(options.logfile, obj)
        print(obj)
        return obj

    dbase = stage(dataset.DBase(options.dataset))
    evaluation = stage(facenet.EvaluationOfEmbeddings(dbase, options))

    _maybe_shard_eval(options)
    report = stage(statistics.FaceToFaceValidation(
        evaluation.embeddings, evaluation.labels, options.validate))
    report.write_h5file(Path(options.logfile).with_suffix('.h5'))

    ioutils.write_elapsed_time(options.logfile, started)
    print(f'report written to {options.logfile}')


if __name__ == '__main__':
    main()
