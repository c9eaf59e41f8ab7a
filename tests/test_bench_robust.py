"""bench.py must yield a parseable result line under ANY failure mode.

Round 4's scoreboard entry was rc=124/parsed=null: bench.py printed
nothing until both dtype paths had been measured, so a slow tunnel left
the driver with no number at all (VERDICT r4 "What's missing" #1). The
round-5 protocol emits progressive JSON lines — the last parseable line
wins — and a whole-run watchdog flushes the best-so-far result before
exiting. These tests drive the real script as a subprocess on CPU
(BENCH_TINY=1) and assert the protocol holds, including under a
simulated mid-run stall (BENCH_FAULT).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, 'bench.py')


def _run(env_extra, timeout=600):
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.update({'BENCH_TINY': '1', **env_extra})
    proc = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=timeout)
    return proc


def _last_parseable(stdout):
    last = None
    for line in stdout.splitlines():
        line = line.strip()
        if not line.startswith('{'):
            continue
        try:
            last = json.loads(line)
        except json.JSONDecodeError:
            pass
    return last


@pytest.mark.slow
def test_clean_run_emits_progressive_lines():
    proc = _run({})
    assert proc.returncode == 0, proc.stderr[-2000:]
    parsed = [_last_parseable(line) for line in proc.stdout.splitlines()
              if line.strip().startswith('{')]
    # init fallback + int8 + final: at least three parseable lines
    assert len(parsed) >= 3, proc.stdout
    final = _last_parseable(proc.stdout)
    assert final['metric'] == 'embeddings_per_sec_single_chip'
    assert final['value'] > 0
    assert 'error' not in final
    assert final['int8_img_per_s'] > 0 and final['bf16_img_per_s'] > 0
    # vs_baseline is rounded to 2 decimals in the emitted line
    assert final['vs_baseline'] == pytest.approx(
        final['value'] / 297.0, abs=0.006)


@pytest.mark.slow
def test_stall_before_bf16_still_yields_int8_number():
    """Simulated slow run (VERDICT r4 next #1 'Done' criterion): a stall
    after the headline int8 measurement must still leave a parseable
    line carrying the int8 value."""
    proc = _run({'BENCH_FAULT': 'before_bf16', 'BENCH_DEADLINE_S': '240'})
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-2000:])
    final = _last_parseable(proc.stdout)
    assert final is not None, proc.stdout
    assert final['value'] > 0, final
    assert final.get('serving') == 'int8'


@pytest.mark.slow
def test_stall_before_int8_still_yields_parseable_line():
    """A stall before ANY measurement still emits the diagnostic
    fallback (value 0) — parsed != null no matter what."""
    proc = _run({'BENCH_FAULT': 'before_int8', 'BENCH_DEADLINE_S': '120'})
    assert proc.returncode == 3, (proc.returncode, proc.stderr[-2000:])
    final = _last_parseable(proc.stdout)
    assert final is not None, proc.stdout
    assert final['metric'] == 'embeddings_per_sec_single_chip'
    assert 'error' in final
