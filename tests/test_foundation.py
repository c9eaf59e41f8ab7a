"""Direct unit tests for foundation pieces otherwise covered only through
app flows: callbacks, ioutils provenance/IO, and mesh helpers."""

import numpy as np
import pytest

from facenet_tpu import callbacks, ioutils
from facenet_tpu.config import Config, value_or
from facenet_tpu.parallel import mesh as mesh_mod


# ---------------------------------------------------------------------------
# callbacks
# ---------------------------------------------------------------------------

def _clustered_forward(dim=16):
    rng = np.random.RandomState(0)
    centers = rng.randn(4, dim).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def forward(images):
        labels = np.asarray(images)[:, 0, 0, 0] % 4
        emb = centers[labels] + 0.05 * rng.randn(len(labels), dim)
        return (emb / np.linalg.norm(emb, axis=1, keepdims=True)
                ).astype(np.float32)

    return forward


@pytest.mark.slow
def test_validate_callback_cadence_and_reports(tmp_path):
    """Fires every N epochs and on the final epoch; writes text + h5."""
    rng = np.random.RandomState(0)
    images = (rng.randint(0, 4, (24, 1, 1, 1)) *
              np.ones((1, 2, 2, 3))).astype(np.uint8)
    labels = (images[:, 0, 0, 0] % 4).astype(np.int32)
    batches = [(images, labels)]

    calls = []

    def forward_factory(state):
        calls.append(state)
        return _clustered_forward()

    cb = callbacks.ValidateCallback(
        forward_factory=forward_factory,
        batches_factory=lambda: batches,
        every_n_epochs=3,
        max_nrof_epochs=7,
        config=Config({'metric': 0, 'nrof_folds': 2, 'far_target': 0.1}),
        report_file=tmp_path / 'report.txt',
        h5file=tmp_path / 'report.h5')

    for epoch in range(7):
        cb.on_epoch_end(epoch, state='s')

    # epochs 2 and 5 (every 3rd) plus the final epoch 6
    assert len(calls) == 3
    text = (tmp_path / 'report.txt').read_text()
    assert text.count('FaceToFaceValidation') == 3
    assert (tmp_path / 'report.h5').exists()


# ---------------------------------------------------------------------------
# ioutils
# ---------------------------------------------------------------------------

def test_store_revision_info_contents(tmp_path):
    out = tmp_path / 'revision_info.txt'
    ioutils.store_revision_info(out)
    text = out.read_text()
    assert 'python' in text.lower()
    assert ioutils.git_hash() in text


def test_write_arguments_roundtrip(tmp_path):
    import yaml
    cfg = Config({'a': 1, 'nested': {'b': 'x'}})
    ioutils.write_arguments(cfg, tmp_path / 'arguments.yaml')
    loaded = yaml.safe_load((tmp_path / 'arguments.yaml').read_text())
    assert loaded['a'] == 1 and loaded['nested']['b'] == 'x'


def test_image_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
    ioutils.write_image(ioutils.array2pil(arr), tmp_path / 'img.png')
    back = ioutils.pil2array(ioutils.read_image(tmp_path / 'img.png'))
    np.testing.assert_array_equal(back, arr)


def test_elapsed_time_log(tmp_path):
    f = tmp_path / 'log.txt'
    ioutils.write_elapsed_time(f, ioutils.get_time())
    assert 'elapsed time:' in f.read_text()


# ---------------------------------------------------------------------------
# mesh helpers + config value_or
# ---------------------------------------------------------------------------

def test_mesh_shardings():
    mesh = mesh_mod.create_mesh(data=4, model=2)
    assert mesh.shape == {'data': 4, 'model': 2}
    assert tuple(mesh_mod.batch_sharding(mesh).spec) == ('data',)
    assert tuple(mesh_mod.logits_kernel_sharding(mesh).spec) == \
        (None, 'model')
    assert tuple(mesh_mod.replicated(mesh).spec) == ()


def test_value_or_semantics():
    cfg = Config({'zero': 0, 'off': False, 'name': 'x'})
    assert value_or(cfg.zero, 7) == 0          # 0 is a real value
    assert value_or(cfg.off, True) is False    # False is a real value
    assert value_or(cfg.name, 'y') == 'x'
    assert value_or(cfg.missing, 7) == 7       # empty Config -> default
    assert value_or(None, 7) == 7
    assert value_or('', 7) == 7


def test_write_elapsed_time_h5_appends(tmp_path):
    """Repeated calls must build a timing HISTORY in the h5 target (the
    docstring's appendable dataset), not overwrite a single value."""
    import h5py
    from facenet_tpu import ioutils

    f = tmp_path / 'report.h5'
    t = ioutils.get_time()
    ioutils.write_elapsed_time(f, t)
    ioutils.write_elapsed_time(f, t)
    ioutils.write_elapsed_time([f, tmp_path / 'report.txt'], t)
    with h5py.File(f, 'r') as hf:
        assert hf['elapsed_time'].shape[0] == 3
    assert (tmp_path / 'report.txt').read_text().startswith('elapsed time:')
