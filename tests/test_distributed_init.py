"""Multi-host path smoke test: jax.distributed.initialize through the
distributed app with num_processes=1.

The reference's only parallel path is single-host MirroredStrategy
(ref train_softmax_tf2_gpus.py:49-51); the rebuild adds multi-host via
jax.distributed (SURVEY.md §2.8). This exercises the coordinator
handshake + device discovery + full training flow in a REAL subprocess
(initialize() mutates process-global state, so it must not run inside
the shared pytest process).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml
from pathlib import Path
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _run_two_workers(mode, timeout=600):
    """Launch tests/distributed_worker.py twice (4 CPU devices each) and
    return each worker's RESULT value."""
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env['PYTHONPATH'] = str(REPO)
    coord = f'127.0.0.1:{_free_port()}'
    worker = REPO / 'tests' / 'distributed_worker.py'

    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(pid), mode],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f'worker failed:\n{out}\n{err}'
        line = [ln for ln in out.splitlines() if ln.startswith('RESULT')]
        assert line, out
        outs.append(float(line[-1].split()[1]))
    return outs


def test_two_process_psum():
    """Cross-process collective: an 8-device psum spanning two REAL
    processes (the DCN pattern) sums both processes' contributions."""
    r0, r1 = _run_two_workers('psum')
    expected = sum(range(4)) + sum(10 + i for i in range(4))
    assert r0 == r1 == float(expected)


@pytest.mark.slow
def test_two_process_train_step():
    """Full SoftmaxTrainer step over a (data=4, model=2) mesh whose data
    axis spans two processes: params placed globally (place_global),
    per-process local batch rows assembled via distribute_batch, gradient
    all-reduce crossing the process boundary. Both processes must agree
    on the loss."""
    r0, r1 = _run_two_workers('train', timeout=840)
    assert r0 == r1
    assert np.isfinite(r0) and r0 > 0


@pytest.mark.slow
def test_two_process_train_epoch():
    """The app-level epoch loop under 2 processes: every process draws
    the identical global batch and train_epoch slices its local rows."""
    r0, r1 = _run_two_workers('epoch', timeout=840)
    assert r0 == r1
    assert np.isfinite(r0) and r0 > 0


def test_two_process_eval():
    """Multi-host EVALUATION (VERDICT r2 next #5): confusion_counts with
    per-process row stripes (uneven 12+11 split, non-dense labels) over an
    8-device/2-process mesh — the column all-gather and histogram psum
    cross the process boundary — must equal the single-process result."""
    r0, r1 = _run_two_workers('eval')
    assert r0 == r1
    assert np.isfinite(r0) and r0 > 0


@pytest.mark.slow
def test_distributed_initialize_single_process(tmp_path):
    # tiny 4-class dataset
    root = tmp_path / 'faces'
    rng = np.random.RandomState(0)
    for c in range(4):
        d = root / f'p{c}'
        d.mkdir(parents=True)
        base = rng.randint(0, 200, (160, 160, 3))
        for i in range(4):
            noise = rng.randint(0, 56, (160, 160, 3))
            Image.fromarray((base + noise).astype(np.uint8)
                            ).save(d / f'{i}.png')

    tiny = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
            'block8_1': {'repeat': 1}, 'output': {'size': 32}}
    cfg = {
        'seed': 0, 'batch_size': 8,
        'dataset': {'path': str(root)},
        'model': {'config': tiny, 'path': str(tmp_path / 'run')},
        'image': {'size': 160, 'normalization': 0, 'random_crop': False,
                  'random_flip': False},
        'mesh': {'data': 2, 'model': 1},
        'train': {'epoch': {'size': 2, 'max_nrof_epochs': 1},
                  'learning_rate': {'schedule': [[100, 0.01]]}},
        'validate': {'dataset': {'path': str(root)},
                     'every_n_epochs': 100, 'metric': 0, 'nrof_folds': 2,
                     'far_target': 0.01},
        'distributed': {
            'enable': True,
            'platform': 'cpu',
            'coordinator_address': f'127.0.0.1:{_free_port()}',
            'num_processes': 1,
            'process_id': 0,
        },
    }
    cfg_file = tmp_path / 'dist.yaml'
    cfg_file.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                        ' --xla_force_host_platform_device_count=8').strip()
    env['PYTHONPATH'] = str(REPO)

    proc = subprocess.run(
        [sys.executable, '-m', 'facenet_tpu.apps.train_softmax_distributed',
         '--config', str(cfg_file)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=840)

    assert proc.returncode == 0, proc.stdout + proc.stderr
    # the coordinator handshake happened and the mesh saw all devices
    assert 'process 0/1' in proc.stdout, proc.stdout
    assert 'devices: 8' in proc.stdout, proc.stdout

    runs = list((tmp_path / 'run').glob('*'))
    assert runs and (runs[0] / 'logs' / 'report.txt').exists()
