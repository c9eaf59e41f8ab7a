"""Input-pipeline checkpointing: kill/resume continues the exact sequence.

SURVEY.md §5 failure-recovery plan: the reference restarts its tf.data
iterator on resume (samples are skipped/repeated relative to the epoch
plan); here the pipeline cursor rides in the checkpoint and resume is
exact — verified sample-by-sample below.
"""

import numpy as np
import pytest

from facenet_tpu import dataset


class IndexLoader:
    """Fake decoder: the 'image' encodes the file index, so the test can
    recover exactly which sample each batch row came from."""

    def __init__(self, size=4):
        self.height = self.width = size

    def __call__(self, path):
        idx = int(str(path).rsplit('_', 1)[1])
        return np.full((self.height, self.width, 3), idx % 251, np.uint8)


def _files(n):
    return [f'mem_{i}' for i in range(n)]


def _batch_ids(batch):
    return batch[0][:, 0, 0, 0].tolist()


def test_batchloader_resume_mid_epoch():
    files = _files(23)
    labels = np.arange(23)
    loader = IndexLoader()

    def fresh(start_state=None):
        return dataset.BatchLoader(files, labels, loader, batch_size=5,
                                   shuffle=True, repeat=True, seed=7,
                                   num_workers=2, start_state=start_state)

    # reference run: 14 batches straight through (crosses epoch boundary)
    ref = []
    it = iter(fresh())
    for _ in range(14):
        ref.append(_batch_ids(next(it)))

    # interrupted run: consume 6, checkpoint the cursor, 'crash', resume
    first = fresh()
    it = iter(first)
    got = [_batch_ids(next(it)) for _ in range(6)]
    cursor = first.state()
    del it, first                                   # the crash

    resumed = fresh(start_state=cursor)
    it = iter(resumed)
    for _ in range(8):
        got.append(_batch_ids(next(it)))

    assert got == ref       # byte-identical schedule: nothing skipped/repeated


def test_batchloader_epoch_covers_every_sample_once():
    files = _files(20)
    bl = dataset.BatchLoader(files, np.arange(20), IndexLoader(),
                             batch_size=4, shuffle=True, repeat=False,
                             seed=3, num_workers=2)
    seen = []
    for batch in bl:
        seen.extend(_batch_ids(batch))
    assert sorted(seen) == list(range(20))

    # resume exactly at an epoch boundary: cursor says epoch 1, pos 0
    assert bl.state() == {'seed': 3, 'epoch': 1, 'pos': 0}


def test_pk_pipeline_resume():
    # directory-free classes: stub with .files/.nrof_images
    class Cls:
        def __init__(self, c, n):
            self.files = [f'mem_{c * 100 + i}' for i in range(n)]
            self.nrof_images = n

    from facenet_tpu.config import Config
    classes = [Cls(c, 8) for c in range(6)]

    def fresh(start_state=None):
        cfg = Config({'nrof_classes_per_batch': 3,
                      'nrof_examples_per_class': 2})
        return dataset.PKPipeline(IndexLoader(), classes, cfg, seed=11,
                                  num_workers=2, start_state=start_state)

    ref_pipe = fresh()
    it = iter(ref_pipe)
    ref = [(_batch_ids(b := next(it)), b[1].tolist()) for _ in range(7)]

    broken = fresh()
    it = iter(broken)
    got = [(_batch_ids(b := next(it)), b[1].tolist()) for _ in range(3)]
    cursor = broken.state()
    del it, broken

    resumed = fresh(start_state=cursor)
    it = iter(resumed)
    for _ in range(4):
        b = next(it)
        got.append((_batch_ids(b), b[1].tolist()))

    assert got == ref


def test_checkpoint_carries_data_state(tmp_path):
    """CheckpointManager round-trips the pipeline cursor next to the state."""
    from facenet_tpu.train.checkpoint import CheckpointManager

    state = {'w': np.arange(6, dtype=np.float32).reshape(2, 3),
             'step': np.asarray(41, np.int32)}
    cursor = {'seed': 7, 'epoch': 2, 'pos': 5}

    mgr = CheckpointManager(tmp_path / 'ckpt', max_to_keep=2)
    mgr.save(41, state, data_state=cursor)
    mgr.close()

    mgr2 = CheckpointManager(tmp_path / 'ckpt')
    template = {'w': np.zeros((2, 3), np.float32),
                'step': np.asarray(0, np.int32)}
    restored, data_state = mgr2.restore(template, with_data_state=True)
    mgr2.close()

    assert data_state == cursor
    np.testing.assert_array_equal(restored['w'], state['w'])
    assert int(restored['step']) == 41


def test_checkpoint_without_data_state_still_restores(tmp_path):
    from facenet_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / 'ckpt')
    mgr.save(1, {'x': np.ones(3, np.float32)})
    mgr.close()

    mgr2 = CheckpointManager(tmp_path / 'ckpt')
    restored, data_state = mgr2.restore({'x': np.zeros(3, np.float32)},
                                        with_data_state=True)
    mgr2.close()
    assert data_state is None
    np.testing.assert_array_equal(restored['x'], np.ones(3))


def test_batchloader_resume_native_path(tmp_path):
    """Resume correctness through the C++ native decode pipeline: the
    cursor counts DELIVERED batches even with prefetch running ahead."""
    from facenet_tpu import native
    if not native.available():
        pytest.skip('native library unavailable')

    from PIL import Image

    files = []
    rng = np.random.RandomState(0)
    for i in range(17):
        # encode the file index in the red channel so batches identify rows
        img = np.full((20, 20, 3), (i * 11) % 251, np.uint8)
        path = tmp_path / f'f_{i:03d}.png'
        Image.fromarray(img).save(path)
        files.append(str(path))
    labels = np.arange(17)
    loader = dataset.ImageLoader(size=16)

    def fresh(start_state=None):
        return dataset.BatchLoader(files, labels, loader, batch_size=4,
                                   shuffle=True, repeat=True, seed=5,
                                   num_workers=2, prefetch=3,
                                   start_state=start_state)

    def ids(batch):
        return batch[0][:, 0, 0, 0].tolist(), batch[1].tolist()

    ref_it = iter(fresh())
    ref = [ids(next(ref_it)) for _ in range(12)]
    del ref_it

    broken = fresh()
    it = iter(broken)
    got = [ids(next(it)) for _ in range(5)]
    cursor = broken.state()
    del it, broken

    resumed = fresh(start_state=cursor)
    it = iter(resumed)
    for _ in range(7):
        got.append(ids(next(it)))
    del it

    assert got == ref
