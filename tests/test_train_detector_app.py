"""train_detector app: JSONL annotations -> trained detector params."""

import json

import numpy as np
import yaml
from click.testing import CliRunner
from pathlib import Path
from PIL import Image


def _annotated_scene_dir(tmp_path, n=6):
    rng = np.random.RandomState(0)
    root = tmp_path / 'scenes'
    root.mkdir()
    ann = root / 'annotations.jsonl'
    with ann.open('w') as f:
        for i in range(n):
            img = rng.randint(0, 50, (128, 128, 3)).astype(np.uint8)
            side = rng.randint(40, 70)
            x = rng.randint(0, 128 - side)
            y = rng.randint(0, 128 - side)
            img[y:y + side, x:x + side] = rng.randint(180, 255,
                                                      (side, side, 3))
            name = f's{i}.png'
            Image.fromarray(img).save(root / name)
            f.write(json.dumps({'image': name,
                                'boxes': [[x, y, x + side, y + side]]}) + '\n')
    return ann


def test_load_annotations(tmp_path):
    from facenet_tpu.apps.train_detector import load_annotations
    ann = _annotated_scene_dir(tmp_path)
    records = load_annotations(ann)
    assert len(records) == 6
    assert records[0]['boxes'].shape == (1, 4)
    assert Path(records[0]['image']).exists()
    assert records[0]['landmarks'] is None


def test_train_detector_app_mtcnn(tmp_path):
    from facenet_tpu.apps.train_detector import main
    ann = _annotated_scene_dir(tmp_path)
    cfg = {
        'detector': 'mtcnn',
        'annotations': str(ann),
        'model': {'path': str(tmp_path / 'run')},
        'batch_size': 32,
        'seed': 0,
        'train': {'learning_rate': 0.003,
                  'epoch': {'max_nrof_epochs': 1, 'size': 4}},
    }
    cfg_file = tmp_path / 'td.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))
    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    out = list((tmp_path / 'run').glob('*/detector_params.npy'))
    assert len(out) == 1
    params = np.load(out[0], allow_pickle=True).item()
    assert set(params) == {'pnet', 'rnet', 'onet'}

    # the trained params slot straight into the facade
    from facenet_tpu.detectors.face_detector import FaceDetector
    fd = FaceDetector(detector='mtcnn', image_shape=(128, 128), params=params)
    fd.detect_images([np.zeros((100, 100, 3), np.uint8)])


def test_train_detector_app_frcnn(tmp_path):
    from facenet_tpu.apps.train_detector import main
    ann = _annotated_scene_dir(tmp_path, n=4)
    cfg = {
        'detector': 'frcnnv3',
        'annotations': str(ann),
        'model': {'path': str(tmp_path / 'run')},
        'batch_size': 2,
        'seed': 0,
        'image': {'height': 128, 'width': 128},
        'train': {'learning_rate': 0.002,
                  'epoch': {'max_nrof_epochs': 1, 'size': 3}},
    }
    cfg_file = tmp_path / 'td.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))
    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    out = list((tmp_path / 'run').glob('*/detector_params.npy'))
    assert len(out) == 1
    params = np.load(out[0], allow_pickle=True).item()
    assert set(params) == {'backbone', 'rpn', 'head'}
