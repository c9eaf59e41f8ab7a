"""Driver for the /verify recipe: end-to-end library slice + app surface.

Run from anywhere: `python tools/verify_slice.py` (forces CPU, ~2 min).
Follows .claude/skills/verify/SKILL.md: synthetic dataset -> Database ->
tiny IRv1 -> evaluate_embeddings -> FaceToFaceValidation -> report, then
the validate app via its CLI, then the error-path probes.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import yaml
from PIL import Image

TINY = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
        'block8_1': {'repeat': 1}, 'output': {'size': 128}}


def build_dataset(root, n_classes=4, n_images=5):
    rng = np.random.RandomState(0)
    for c in range(n_classes):
        d = root / f'person_{c:02d}'
        d.mkdir(parents=True)
        base = rng.randint(0, 200, (160, 160, 3))
        for i in range(n_images):
            noise = rng.randint(0, 56, (160, 160, 3))
            Image.fromarray((base + noise).astype(np.uint8)
                            ).save(d / f'{i}.png')


def library_slice(tmp):
    from facenet_tpu import dataset, facenet, statistics
    from facenet_tpu.config import Config
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    root = tmp / 'faces'
    build_dataset(root)
    db = dataset.Database(dataset.DefaultConfig(root))
    assert db.nrof_classes == 4 and db.nrof_images == 20

    model = InceptionResnetV1(config=Config(TINY))
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 160, 160, 3), np.uint8), train=False)
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))

    loader = dataset.ImageLoader(config=Config({'size': 160}))
    embs, labels = facenet.evaluate_embeddings(
        fwd, db.batches(loader, batch_size=20))
    norms = np.linalg.norm(embs, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-6), norms

    val = statistics.FaceToFaceValidation(
        embs, labels, Config({'metric': 0, 'nrof_folds': 5,
                              'far_target': 0.01}))
    report = tmp / 'report.txt'
    val.write_report(report)
    txt = report.read_text()
    assert 'MaximumAccuracy' in txt.replace(' ', ''), txt
    val.write_h5file(tmp / 'report.h5')

    # untrained model still separates: positive pairs closer on average
    d_pos, d_neg = [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            d = float(np.sum((embs[i] - embs[j]) ** 2))
            (d_pos if labels[i] == labels[j] else d_neg).append(d)
    assert np.mean(d_pos) < np.mean(d_neg), (np.mean(d_pos), np.mean(d_neg))
    print('library slice OK', flush=True)
    return root, embs, labels


def app_surface(tmp, root):


    from facenet_tpu import export
    from facenet_tpu.config import Config
    from facenet_tpu.models.inception_resnet_v1 import InceptionResnetV1

    bundle = tmp / 'bundle'
    model = InceptionResnetV1(config=Config(TINY))
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 160, 160, 3), np.uint8), train=False)
    export.save_model(bundle, model, variables)

    cfg = {
        'dataset': {'path': str(root)},
        'model': {'path': str(bundle)},
        'batch_size': 20,
        'validate': {'metric': 0, 'nrof_folds': 2, 'far_target': 0.01},
    }
    cfg_file = tmp / 'validate.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))
    # in-process via the click runner (like tests/test_apps.py) so the
    # forced-CPU jax config applies — a subprocess would hit the real chip
    from click.testing import CliRunner
    from facenet_tpu.apps.validate import main as validate_main
    result = CliRunner().invoke(validate_main, ['--config', str(cfg_file)])
    assert result.exit_code == 0, result.output
    outdir = Path(str(root) + '_' + bundle.stem)
    report = outdir / 'validate.txt'
    assert report.exists()
    assert 'FaceToFaceValidation' in report.read_text()
    assert (outdir / 'revision_info.txt').exists()
    assert (outdir / 'validate.yaml').exists()
    print('app surface OK', flush=True)


def probes(embs, labels):
    from facenet_tpu import statistics
    from facenet_tpu.config import Config

    try:
        statistics.FaceToFaceValidation(
            embs * 3.0, labels, Config({'metric': 0, 'nrof_folds': 2,
                                        'far_target': 0.01}))
        raise AssertionError('unnormalized embeddings accepted')
    except ValueError:
        pass

    try:
        statistics.FaceToFaceValidation(
            embs, labels, Config({'metric': 7, 'nrof_folds': 2,
                                  'far_target': 0.01}))
        raise AssertionError('invalid metric accepted')
    except ValueError:
        pass

    from facenet_tpu import dataset
    try:
        dataset.Database(dataset.DefaultConfig('/nonexistent/nowhere'))
        raise AssertionError('nonexistent dataset accepted')
    except (ValueError, FileNotFoundError) as e:
        assert 'nowhere' in str(e)
    print('probes OK', flush=True)


def main():
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        root, embs, labels = library_slice(tmp)
        app_surface(tmp, root)
        probes(embs, labels)
    print('VERIFY PASS', flush=True)


if __name__ == '__main__':
    main()
