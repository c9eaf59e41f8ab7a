"""Train a face-to-face pair classifier on stored embeddings.

Parity: reference apps/train_classifier.py — with the missing
`facenet.train_op` replaced by a working jitted Adam step
(facenet_tpu/train/classifier.py).
"""

import click
from pathlib import Path

import numpy as np
import yaml

from facenet_tpu import config, facenet, ioutils
from facenet_tpu.train.classifier import ClassifierTrainer, ConfusionMatrix


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    options = config.train_classifier(__file__, {'config': options['config_file']})

    embeddings = facenet.Embeddings(options.embeddings)
    ioutils.write_text_log(options.logfile, embeddings)
    print(embeddings)

    embarray = embeddings.data(normalize=bool(options.embeddings.normalize))

    batch_iter = facenet.equal_batches_input_pipeline(
        embarray, options, seed=int(options.seed or 0))

    trainer = ClassifierTrainer(
        options, normalized=bool(options.embeddings.normalize))

    print('start training')
    model = trainer.train(
        batch_iter,
        nrof_epochs=int(options.train.epoch.max_nrof_epochs or 2),
        epoch_size=int(options.train.epoch.size or 250),
        p=int(options.nrof_classes_per_batch),
        k=int(options.nrof_examples_per_class),
        embeddings_per_class=embarray,
        logfile=options.logfile)

    # persist the trained scalars
    outfile = options.classifier.path / 'classifier.yaml'
    with outfile.open('wt') as f:
        yaml.safe_dump(
            {'class': type(model).__name__,
             'variables': {k: float(v) for k, v in model.variables.items()}},
            f)

    conf_mat = ConfusionMatrix(embarray, model)
    print(conf_mat)
    ioutils.write_text_log(options.logfile, conf_mat)

    print(f'Model has been saved to the directory: {options.classifier.path}')


if __name__ == '__main__':
    main()
