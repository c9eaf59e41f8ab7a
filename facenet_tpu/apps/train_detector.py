"""Train a face detector (MTCNN cascade stage or Faster-RCNN) in-framework.

The reference cannot train either of its detection backends (MTCNN comes
from a pretrained pip package, the frcnnv3 frozen graph ships without
weights — SURVEY.md §2 #13/#14); this app closes that gap. Annotations are
a simple JSONL file, one object per image:

    {"image": "relative/or/absolute.jpg",
     "boxes": [[x1, y1, x2, y2], ...],
     "landmarks": [[[x1, y1], ..., [x5, y5]], ...]}   # optional, MTCNN only

Config selects the detector ('mtcnn' trains P/R/O stages in sequence,
'frcnnv3' trains the two-stage net jointly) and writes the learned params
as an .npy pytree loadable via FaceDetector(params=np.load(...).item()).
"""

import json

import click
from pathlib import Path

import numpy as np

from facenet_tpu import config, ioutils, logging
from facenet_tpu.logging import logger


def load_annotations(path):
    """Read the JSONL annotation file -> list of dicts with numpy arrays."""
    records = []
    base = Path(str(path)).expanduser().parent
    with open(Path(str(path)).expanduser()) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            image = Path(rec['image'])
            if not image.is_absolute():
                image = base / image
            boxes = np.asarray(rec.get('boxes', []),
                               np.float32).reshape(-1, 4)
            lmk = rec.get('landmarks')
            records.append({
                'image': str(image),
                'boxes': boxes,
                'landmarks': (np.asarray(lmk, np.float32).reshape(-1, 5, 2)
                              if lmk else None),
            })
    return records


def _read_image(path):
    from facenet_tpu import native
    if native.available():
        arr = native.decode_image_native_size(path)
        if arr is not None:
            return arr
    return ioutils.pil2array(ioutils.read_image(path))


def train_mtcnn(records, cfg, rng):
    """Stage-wise P -> R -> O training over crop samples from annotations."""
    from facenet_tpu.train import mtcnn as tm

    batch_size = int(config.value_or(cfg.batch_size, 256))
    steps = int(config.value_or(cfg.train.epoch.size, 200))
    epochs = int(config.value_or(cfg.train.epoch.max_nrof_epochs, 1))
    lr = float(config.value_or(cfg.train.learning_rate, 1e-3))

    params = {}
    for net in ('pnet', 'rnet', 'onet'):
        trainer = tm.MTCNNTrainer(net=net, learning_rate=lr)
        state = trainer.init_state(seed=int(cfg.seed or 0))

        def batches():
            pool = [np.zeros((0, trainer.size, trainer.size, 3), np.uint8),
                    np.zeros(0, np.int32), np.zeros((0, 4), np.float32),
                    np.zeros((0, 10), np.float32), np.zeros(0, np.int32)]
            produced = 0
            while produced < steps:
                rec = records[rng.randint(len(records))]
                image = _read_image(rec['image'])
                if image is None:
                    continue
                sample = tm.generate_training_crops(
                    image, rec['boxes'], trainer.size, rng,
                    gt_landmarks=rec['landmarks'])
                pool = [np.concatenate([a, b]) for a, b in zip(pool, sample)]
                while len(pool[0]) >= batch_size:
                    batch = [a[:batch_size] for a in pool]
                    pool = [a[batch_size:] for a in pool]
                    produced += 1
                    yield tuple(batch)

        state, metrics = trainer.train(state, batches, epochs=epochs,
                                       log_every=50)
        logger.info(f'{net} final: ' +
                    ' '.join(f'{k}={v:.4f}' for k, v in metrics.items()))
        params[net] = state['params']
    return params


def train_frcnn(records, cfg, rng):
    """Joint two-stage training over full annotated images."""
    from facenet_tpu.detectors.frcnn.detector import (FasterRCNN,
                                                      FasterRCNNTrainer)
    from facenet_tpu.detectors.mtcnn.cascade import letterbox_batch

    shape = (int(config.value_or(cfg.image.height, 480)),
             int(config.value_or(cfg.image.width, 640)))
    batch_size = int(config.value_or(cfg.batch_size, 8))
    steps = int(config.value_or(cfg.train.epoch.size, 200))
    epochs = int(config.value_or(cfg.train.epoch.max_nrof_epochs, 1))
    lr = float(config.value_or(cfg.train.learning_rate, 1e-3))

    det = FasterRCNN(image_shape=shape)
    trainer = FasterRCNNTrainer(det, learning_rate=lr)
    state = trainer.init_state(seed=int(cfg.seed or 0))

    metrics = {}
    for epoch in range(epochs):
        for n in range(steps):
            chosen = [records[rng.randint(len(records))]
                      for _ in range(batch_size)]
            images = [_read_image(r['image']) for r in chosen]
            keep = [i for i, im in enumerate(images) if im is not None]
            if not keep:
                continue
            batch, scales, pads = letterbox_batch(
                [images[i] for i in keep], shape)
            gts = []
            for j, i in enumerate(keep):
                b = chosen[i]['boxes'].copy()
                b[:, [0, 2]] = b[:, [0, 2]] * scales[j] + pads[j, 0]
                b[:, [1, 3]] = b[:, [1, 3]] * scales[j] + pads[j, 1]
                gts.append(b)
            state, metrics = trainer.train_step(state, batch, gts)
            if (n + 1) % 50 == 0:
                logger.info(f'epoch {epoch} step {n + 1}: ' + ' '.join(
                    f'{k}={float(v):.4f}' for k, v in metrics.items()))
    logger.info('final: ' + ' '.join(f'{k}={float(v):.4f}'
                                     for k, v in metrics.items()))
    return state['params']


@click.command()
@click.option('--config', 'config_file', default=None, type=Path,
              help='User yaml config merged on top of the app defaults.')
def main(**options):
    cfg = config.train_detector({'config': options['config_file']},
                                app_file_name=__file__)
    logging.configure_logging(cfg.logs)

    records = load_annotations(cfg.annotations)
    n_boxes = sum(len(r['boxes']) for r in records)
    print(f'annotations: {len(records)} images, {n_boxes} boxes')
    if not records:
        raise ValueError(f'no annotations in {cfg.annotations}')

    rng = np.random.RandomState(int(cfg.seed or 0))
    detector = str(cfg.detector or 'mtcnn')

    if detector in ('mtcnn', 'pypimtcnn'):
        params = train_mtcnn(records, cfg, rng)
    elif detector == 'frcnnv3':
        params = train_frcnn(records, cfg, rng)
    else:
        raise ValueError(f'unknown detector {detector}')

    import jax
    params = jax.device_get(params)
    out = Path(cfg.model.path) / 'detector_params.npy'
    np.save(out, params, allow_pickle=True)
    print(f'Trained {detector} params saved to {out}')


if __name__ == '__main__':
    main()
