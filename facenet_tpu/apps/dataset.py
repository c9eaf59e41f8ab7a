"""Dataset inspection: print index statistics and find unreadable images.

Parity: reference apps/dataset.py — walk the directory-per-class index,
report class/image counts, and decode-check every file so corrupt images
surface before a training run trips over them. Decode checking prefers the
native C++ probe (facenet_tpu/native) and falls back to PIL.
"""

import click
from pathlib import Path

from facenet_tpu import dataset, native


def _check_file(path):
    """Return None if the image decodes, else a description of the problem."""
    if native.available():
        return None if native.probe_image(path) else f'unreadable: {path}'
    from PIL import Image
    try:
        with Image.open(path) as image:
            image.verify()
        return None
    except Exception as err:
        return f'{err}'


@click.command()
@click.option('--path', type=Path, required=True,
              help='Path to dataset directory to check for invalid files.')
def main(**options):
    dbase = dataset.DBase(dataset.DefaultConfig(options['path']))
    print(dbase)

    problems = [p for p in map(_check_file, dbase.files) if p]
    for problem in problems:
        print(problem)
    print(f'number of invalid files: {len(problems)}')


if __name__ == '__main__':
    main()
