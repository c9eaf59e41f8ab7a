"""Application to print information about a dataset and find corrupt images.

Parity: reference apps/dataset.py (PIL-opens every file to catch invalid
images, prints Database stats).
"""

import click
from pathlib import Path
from PIL import Image

from facenet_tpu import dataset


@click.command()
@click.option('--path', type=Path, required=True,
              help='Path to dataset directory to check for invalid files.')
def main(**options):
    dbase = dataset.DBase(dataset.DefaultConfig(options['path']))
    print(dbase)

    nrof_invalid = 0
    for f in dbase.files:
        try:
            with Image.open(f) as image:
                image.verify()
        except Exception as e:
            nrof_invalid += 1
            print(e)

    print(f'number of invalid files: {nrof_invalid}')


if __name__ == '__main__':
    main()
