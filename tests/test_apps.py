"""End-to-end app tests: tiny synthetic dataset -> CLI apps -> artifacts.

Mirrors SURVEY.md §4's recommended strategy: "end-to-end: tiny synthetic face
dataset -> extract -> train 2 epochs -> validate, checking report fields
exist and accuracy is above chance."
"""

import numpy as np
import pytest
import yaml
from click.testing import CliRunner
from pathlib import Path
from PIL import Image

import jax

TINY_MODEL = {
    'block35': {'repeat': 1, 'scale': 0.17, 'activation': 'relu'},
    'block17': {'repeat': 1, 'scale': 0.10, 'activation': 'relu'},
    'block8_1': {'repeat': 1, 'scale': 0.2, 'activation': 'relu'},
    'output': {'size': 32},
}


@pytest.fixture(scope='module')
def face_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('aligned')
    rng = np.random.RandomState(0)
    for c in range(4):
        d = root / f'id_{c:02d}'
        d.mkdir()
        base = rng.randint(0, 255, (160, 160, 3)).astype(np.float32)
        for i in range(6):
            img = np.clip(base + rng.randn(160, 160, 3) * 8, 0,
                          255).astype(np.uint8)
            Image.fromarray(img).save(d / f'{i:04d}.png')
    return root


@pytest.fixture(scope='module')
def tiny_bundle(tmp_path_factory):
    from facenet_tpu import export
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    path = tmp_path_factory.mktemp('model') / 'bundle'
    model = InceptionResnetV1(config=TINY_MODEL)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 160, 160, 3), np.uint8), train=False)
    export.save_model(path, model, variables)
    return path


def test_dataset_app(face_tree):
    from facenet_tpu.apps.dataset import main
    result = CliRunner().invoke(main, ['--path', str(face_tree)])
    assert result.exit_code == 0, result.output
    assert 'Number of classes 4' in result.output
    assert 'number of invalid files: 0' in result.output


def test_validate_app(face_tree, tiny_bundle, tmp_path):
    from facenet_tpu.apps.validate import main

    cfg = {
        'dataset': {'path': str(face_tree)},
        'model': {'path': str(tiny_bundle)},
        'batch_size': 12,
        'validate': {'metric': 0, 'nrof_folds': 2, 'far_target': 0.1},
    }
    cfg_file = tmp_path / 'validate.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    outdir = Path(str(face_tree) + '_' + tiny_bundle.stem)
    report = outdir / 'validate.txt'
    assert report.exists()
    text = report.read_text()
    assert 'FaceToFaceValidation' in text
    assert 'Accuracy' in text
    assert (outdir / 'revision_info.txt').exists()
    assert (outdir / 'validate.yaml').exists()


def test_embeddings_app(face_tree, tiny_bundle, tmp_path):
    from facenet_tpu.apps.embeddings import main
    from facenet_tpu import h5utils

    cfg = {
        'dataset': {'path': str(face_tree)},
        'model': {'path': str(tiny_bundle)},
        'batch_size': 12,
        'suffix': '.h5',
    }
    cfg_file = tmp_path / 'embeddings.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    outfile = Path(str(face_tree) + '_' + tiny_bundle.stem) / 'embeddings.h5'
    assert outfile.exists()
    embs = h5utils.read(outfile, 'embeddings')
    labels = h5utils.read(outfile, 'labels')
    assert embs.shape == (24, 32)
    assert len(labels) == 24


def test_embeddings_app_pipeline_mode(tiny_bundle, tmp_path):
    """pipeline: config embeds RAW SCENES through the fused
    detect->align->embed FacePipeline — no extract_faces round trip."""
    from facenet_tpu.apps.embeddings import main
    from facenet_tpu.utils.synthetic import render_scene
    from facenet_tpu import h5utils

    raw = tmp_path / 'scenes'
    rng = np.random.RandomState(42)
    for c in range(2):
        d = raw / f'id_{c:02d}'
        d.mkdir(parents=True)
        for i in range(2):
            img, _, _ = render_scene(rng, shape=(256, 256), n_faces=1,
                                     min_face=90, max_face=150)
            Image.fromarray(img).save(d / f'{i}.png')

    cfg = {
        'dataset': {'path': str(raw)},
        # normalization here is the app's L2 flag (the app default is
        # raw bottleneck outputs, reference parity) — ask for unit norms
        'model': {'path': str(tiny_bundle), 'normalization': True},
        'batch_size': 4,
        'suffix': '.h5',
        'pipeline': {'image_shape': [256, 256], 'align': 'crop'},
    }
    cfg_file = tmp_path / 'embeddings.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    outfile = Path(str(raw) + '_' + tiny_bundle.stem) / 'embeddings.h5'
    embs = h5utils.read(outfile, 'embeddings')
    labels = h5utils.read(outfile, 'labels')
    assert embs.shape[1] == 32 and 1 <= embs.shape[0] <= 4
    assert len(labels) == embs.shape[0]
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-3)


def test_embeddings_app_tfrecord(face_tree, tiny_bundle, tmp_path):
    from facenet_tpu.apps.embeddings import main
    from facenet_tpu.utils.tfrecord import TFRecord

    cfg = {
        'dataset': {'path': str(face_tree)},
        'model': {'path': str(tiny_bundle)},
        'batch_size': 12,
        'suffix': '.tfrecord',
    }
    cfg_file = tmp_path / 'embeddings.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    outfile = Path(str(face_tree) + '_' + tiny_bundle.stem) / 'embeddings.tfrecord'
    loaded = TFRecord(outfile)
    assert loaded.embeddings.shape == (24, 32)


def test_model_info_app(tiny_bundle):
    from facenet_tpu.apps.model_info import main
    result = CliRunner().invoke(main, ['--path', str(tiny_bundle)])
    assert result.exit_code == 0, result.output
    assert 'total parameters' in result.output
    assert 'Bottleneck' in result.output


def test_export_model_app(tiny_bundle, tmp_path):
    from facenet_tpu.apps.export_model import main
    out = tmp_path / 'exported'
    h5 = tmp_path / 'dump.h5'
    result = CliRunner().invoke(main, [
        '--model-dir', str(tiny_bundle), '--output', str(out),
        '--h5', str(h5)])
    assert result.exit_code == 0, result.output
    assert (out / 'model.yaml').exists()
    assert (out / 'params.msgpack').exists()
    assert h5.exists()
    assert 'smoke forward' in result.output


def test_train_classifier_app(tmp_path):
    from facenet_tpu.apps.train_classifier import main
    from facenet_tpu import h5utils
    from conftest import make_embeddings

    rng = np.random.RandomState(0)
    embs, labels = make_embeddings(rng, nrof_classes=4, images_per_class=10,
                                   dim=16, spread=0.1)
    h5file = tmp_path / 'embeddings.h5'
    h5utils.write(h5file, 'embeddings', embs)
    h5utils.write(h5file, 'labels', labels)

    cfg = {
        'embeddings': {'path': str(h5file), 'normalize': True},
        'classifier': {'path': str(tmp_path / 'clf')},
        'nrof_classes_per_batch': 4,
        'nrof_examples_per_class': 3,
        'train': {
            'epoch': {'max_nrof_epochs': 1, 'size': 20},
            'learning_rate_schedule': {'initial_value': 0.05,
                                       'decay_rate': 0.5},
        },
    }
    cfg_file = tmp_path / 'train_classifier.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    runs = list((tmp_path / 'clf').glob('*/classifier.yaml'))
    assert len(runs) == 1
    saved = yaml.safe_load(runs[0].read_text())
    assert 'threshold' in saved['variables']


def test_graft_entry_shapes():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as ge
    fn, args = ge.entry()
    assert callable(fn)
    variables, images = args
    assert images.shape == (8, 160, 160, 3)
    assert 'params' in variables


def _train_cfg_dict(face_tree, tmp_path, extra=None):
    cfg = {
        'dataset': {'path': str(face_tree)},
        'model': {'path': str(tmp_path / 'run'),
                  'config': TINY_MODEL},
        'batch_size': 8,
        'seed': 0,
        'train': {
            'adam_epsilon': 0.1,
            'epoch': {'max_nrof_epochs': 1, 'size': 2},
            'learning_rate': {'schedule': [[1, 0.05]]},
        },
        'loss': {'center_factor': 0.0, 'triplet_factor': 0.0},
        'image': {'size': 160, 'normalization': 0},
        'mesh': {'data': 1, 'model': 1},
        'checkpoint': {'max_to_keep': 1},
        'validate': {
            'every_n_epochs': 1,
            'dataset': {'path': str(face_tree)},
            'validate': {'metric': 0, 'nrof_folds': 2, 'far_target': 0.1},
        },
    }
    if extra:
        cfg.update(extra)
    return cfg


def test_train_softmax_app(face_tree, tmp_path):
    """End-to-end: train 1 tiny epoch -> checkpoints + report + export."""
    from facenet_tpu.apps.train_softmax import main

    cfg_file = tmp_path / 'train_softmax.yaml'
    cfg_file.write_text(yaml.safe_dump(_train_cfg_dict(face_tree, tmp_path)))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output

    runs = list((tmp_path / 'run').glob('*'))
    assert len(runs) == 1
    run_dir = runs[0]
    assert (run_dir / 'logs' / 'report.txt').exists()
    assert (run_dir / 'logs' / 'revision_info.txt').exists()
    assert list((run_dir / 'checkpoints').glob('*'))
    report = (run_dir / 'logs' / 'report.txt').read_text()
    assert 'epoch [1/1]' in report
    assert 'FaceToFaceValidation' in report


@pytest.mark.slow
def test_train_softmax_distributed_app(face_tree, tmp_path):
    """Distributed app: 2-device data-parallel mesh on CPU virtual devices."""
    from facenet_tpu.apps.train_softmax_distributed import main

    extra = {'mesh': {'data': 2, 'model': 1},
             'distributed': {'enable': False}}
    cfg_file = tmp_path / 'train_softmax_distributed.yaml'
    cfg_file.write_text(yaml.safe_dump(
        _train_cfg_dict(face_tree, tmp_path, extra)))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    assert 'devices: 8' in result.output

    runs = list((tmp_path / 'run').glob('*'))
    assert len(runs) == 1
    assert (runs[0] / 'logs' / 'report.txt').exists()


@pytest.mark.slow
def test_train_softmax_app_pk_sampler_with_triplet(face_tree, tmp_path):
    """triplet_factor > 0 routes training through P x K equal batches."""
    from facenet_tpu.apps.train_softmax import main

    extra = {
        'loss': {'triplet_factor': 0.5, 'triplet_margin': 0.2},
        'nrof_classes_per_batch': 3,
        'nrof_examples_per_class': 2,
    }
    cfg_file = tmp_path / 'train_softmax.yaml'
    cfg_file.write_text(yaml.safe_dump(
        _train_cfg_dict(face_tree, tmp_path, extra)))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    report = list((tmp_path / 'run').glob('*/logs/report.txt'))[0].read_text()
    assert 'triplet_loss' in report


@pytest.mark.slow
def test_train_softmax_resume_from_checkpoint(face_tree, tmp_path):
    """Reference resume workflow: point model.checkpoint at a previous run's
    checkpoints dir; the new run continues from the saved step."""
    from facenet_tpu.apps.train_softmax import main

    cfg_file = tmp_path / 'train_softmax.yaml'
    cfg_file.write_text(yaml.safe_dump(_train_cfg_dict(face_tree, tmp_path)))
    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    first_run = sorted((tmp_path / 'run').glob('*'))[0]

    cfg2 = _train_cfg_dict(face_tree, tmp_path)
    cfg2['model']['checkpoint'] = str(first_run / 'checkpoints')
    cfg_file.write_text(yaml.safe_dump(cfg2))
    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    assert 'Restored checkpoint step 2' in result.output, result.output


def test_extract_faces_app(tmp_path):
    """Batched extract flow: artifacts + unreadable-file accounting
    (random-weight cascade finds nothing in noise; the contract here is
    the pipeline mechanics, matching ref extract_faces.py:37-85)."""
    from facenet_tpu.apps.extract_faces import main

    raw = tmp_path / 'raw'
    rng = np.random.RandomState(0)
    for c in range(2):
        d = raw / f'p{c:02d}'
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.randint(0, 256, (100, 120, 3), np.uint8)
                            ).save(d / f'{i}.jpg')
    (raw / 'p00' / 'broken.jpg').write_bytes(b'not an image')

    cfg = {
        'dataset': {'path': str(raw)},
        'outdir': str(tmp_path / 'out'),
        'detector': 'mtcnn',
        'image': {'size': 160, 'margin': 32},
        'detect_multiple_faces': False,
    }
    cfg_file = tmp_path / 'extract.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    result = CliRunner().invoke(main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    assert 'Number of extracted faces' in result.output
    log = (tmp_path / 'out' / 'log.txt').read_text()
    assert 'Number of files that cannot be read 1' in log
