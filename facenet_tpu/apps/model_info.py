"""Print information about an exported model bundle.

Parity: reference apps/model_info.py (dump of trainable variables and graph
ops) — for a JAX model the equivalents are the parameter tree with shapes/
sizes and the jaxpr of the jitted forward.
"""

import click
from pathlib import Path

import numpy as np

from facenet_tpu import export


@click.command()
@click.option('--path', type=Path, required=True,
              help='Path to an exported model bundle directory.')
@click.option('--jaxpr', is_flag=True, default=False,
              help='Also print the jaxpr of the jitted forward pass.')
@click.option('--ops', is_flag=True, default=False,
              help='Print the compiled StableHLO op histogram (parity with '
                   'the reference frozen-graph op dump, ref model_info.py:'
                   '63-77). Needs a model.stablehlo in the bundle.')
def main(**options):
    if options['ops']:
        compiled = export.load_compiled(options['path'])
        print(f'platforms: {", ".join(compiled.platforms)}')
        hist = compiled.op_histogram()
        width = max(len(op) for op in hist)
        for op, count in hist.items():
            print(f'{op:<{width}}  {count:>6}')
        print(f'\ntotal ops: {sum(hist.values())}')
        return

    bundle = export.load_model(options['path'])

    print(f"model: {bundle.meta.get('model_class')}")
    print(f"image size: {bundle.meta.get('image_size')}  "
          f"normalization: {bundle.meta.get('normalization')}")
    print()

    import jax

    total = 0
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            bundle.variables['params']):
        name = '/'.join(str(getattr(p, 'key', p)) for p in path)
        rows.append((name, tuple(leaf.shape), leaf.size))
        total += leaf.size

    width = max(len(r[0]) for r in rows)
    for name, shape, size in rows:
        print(f'{name:<{width}}  {str(shape):<20} {size:>12,}')
    print(f'\ntotal parameters: {total:,}')

    if options['jaxpr']:
        imgs = np.zeros((1, bundle.model.image_size,
                         bundle.model.image_size, 3), np.uint8)
        expr = jax.make_jaxpr(
            lambda v, x: bundle.model.apply(v, x, train=False))(
            bundle.variables, imgs)
        print(expr)


if __name__ == '__main__':
    main()
