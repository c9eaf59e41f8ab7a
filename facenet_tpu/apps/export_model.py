"""Export a training checkpoint as a deployable model bundle (+ optional
per-layer activation h5 dump for parity testing).

Parity: reference apps/export_frozen_graph.py + export_frozen_graph_h5.py
(frozen-graph export with smoke-test forward; per-layer h5 dump).
"""

import click
from pathlib import Path

import numpy as np

from facenet_tpu import export


@click.command()
@click.option('--model-dir', type=Path, default=None,
              help='Model bundle directory to load (or re-export).')
@click.option('--import-h5', 'import_h5', type=Path, default=None,
              help='INSTEAD of --model-dir: import reference-schema folded '
                   'h5 weights (the reference export_h5 format, '
                   'tfutils.py:225-264 — the one-command path from an '
                   'upstream pretrained checkpoint to a serving bundle).')
@click.option('--image-size', type=int, default=160,
              help='Input geometry for --import-h5 (default 160).')
@click.option('--output', type=Path, required=True,
              help='Output bundle directory.')
@click.option('--h5', 'h5file', type=Path, default=None,
              help='Also dump per-layer activations/weights to this h5 file.')
@click.option('--compiled/--no-compiled', default=True,
              help='Also serialize a standalone StableHLO inference artifact '
                   '(weights baked in, symbolic batch; runs with jax alone).')
def main(**options):
    if (options['model_dir'] is None) == (options['import_h5'] is None):
        raise click.UsageError(
            'exactly one of --model-dir / --import-h5 is required')

    if options['import_h5'] is not None:
        from facenet_tpu.models.import_weights import import_h5_weights
        from facenet_tpu.models.inception_resnet_v1 import create_model
        from facenet_tpu.config import Config

        variables = import_h5_weights(options['import_h5'],
                                      image_size=options['image_size'])
        model = create_model(
            image_cfg=Config({'size': options['image_size'],
                              'normalization': 0}))
        bundle = export.ModelBundle(model=model, variables=variables,
                                    meta={'source': str(options['import_h5'])})
    else:
        bundle = export.load_model(options['model_dir'])

    path = export.save_model(options['output'], bundle.model,
                             bundle.variables)

    # smoke-test forward on zeros (ref export_frozen_graph.py:52-58)
    import jax
    size = bundle.model.image_size
    imgs = np.zeros((1, size, size, 3), np.uint8)
    out = jax.jit(lambda v, x: bundle.model.apply(v, x, train=False))(
        bundle.variables, imgs)
    print(f'smoke forward: input {imgs.shape} -> output {tuple(out.shape)}')

    if options['compiled']:
        artifact = export.save_compiled(options['output'], bundle.model,
                                        bundle.variables)
        got = export.load_compiled(artifact)(imgs)
        assert tuple(got.shape) == tuple(out.shape)
        print(f'compiled artifact: {artifact} '
              f'(platforms {export.load_compiled(artifact).platforms})')

    if options['h5file']:
        export.export_h5(options['h5file'], bundle.model, bundle.variables,
                         imgs)
        print('activation dump:', options['h5file'])

    print('exported to', path)


if __name__ == '__main__':
    main()
