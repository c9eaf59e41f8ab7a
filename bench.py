"""Benchmark: single-chip embedding throughput of the flagship model.

Prints progressive JSON lines: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}. THE LAST PARSEABLE LINE WINS — a line is emitted the
moment the backend is up (diagnostic, value 0), again after the headline
int8 measurement, and finally after the bf16 continuity measurement, so a
driver timeout at ANY point after init still records the best-so-far
number (round-4 lesson: BENCH_r04 was rc=124/parsed=null because nothing
printed until BOTH paths finished).

Robustness (round 5, VERDICT r4 next #1):
  * whole-run wall-clock watchdog (BENCH_DEADLINE_S, default 1500 s) that
    emits the best-so-far JSON and exits — covers remote compiles, which
    the init-only watchdog never did;
  * the headline (int8) path is measured FIRST;
  * PTQ calibration is pinned to the CPU backend — it runs eagerly
    (hundreds of ops), and each eager op on the TPU is a ~1.6 ms tunnel
    dispatch, so calibrating on-device cost minutes of silent wall clock;
  * BENCH_FAULT=hang simulates a mid-run stall (tests) and BENCH_TINY=1
    runs a tiny model on CPU so the whole protocol is testable off-chip.

Baseline: the reference's published embedding throughput — 297 img/s on a
2020-era GPU with the frozen TF graph at batch 100 (BASELINE.md,
reference models/20200505-200824/logs/report.txt "time per image"). The
north-star target is >= 2,500 img/s/chip (20k/s on a v5e-8, BASELINE.json).

Measurement design (round-2 tuning, all measured on v5e through the axon
tunnel):
  * the fused serving path (models/irv1_fast.py: BN folded into conv
    biases, parallel branch-head 1x1 convs fused into wide convs);
  * one dispatch runs a lax.scan over K=32 chunks of B=128 images (each
    dispatch costs ~1.6 ms fixed; B=128 is per-image fastest for both
    dtypes — see CLAUDE.md measured numbers);
  * calls are chained through their outputs so the wall clock measures
    true serialized execution (async dispatch + the tunnel make
    block_until_ready alone unreliable — CLAUDE.md).

Round 3: the headline value is the INT8 serving path (models/quantize.py
per-channel PTQ, measured 1.24-1.32x the bf16 path end-to-end on v5e).
It is quality-free at the committed evidence geometry (tools/
validate_int8.py: 10-fold report digit-identical bf16 vs int8).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_PER_S = 297.0
METRIC = 'embeddings_per_sec_single_chip'

TINY = bool(os.environ.get('BENCH_TINY'))
CHUNK = 8 if TINY else 128   # images per scan step (per-image fastest)
K = 2 if TINY else 32        # scan steps per dispatch (amortizes ~1.6 ms)
WARMUP = 1 if TINY else 3
ITERS = 2 if TINY else 8

# Best-so-far result; mutated in place so the watchdog thread always
# emits the latest state.
_result = {
    'metric': METRIC, 'value': 0.0, 'unit': 'img/s', 'vs_baseline': 0.0,
    'error': 'no measurement completed',
}


def _emit(extra=None):
    out = dict(_result)
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def _note(msg):
    print(f'[bench +{time.monotonic() - _T0:.0f}s] {msg}',
          file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _install_run_watchdog(deadline_s):
    """Emit best-so-far JSON and exit if the WHOLE run (compiles included)
    exceeds deadline_s. Round 4's failure mode was exactly this: remote
    compiles consumed the driver's window with zero output."""
    import threading

    def expire():
        _result.setdefault(
            'error', '')
        _result['error'] = (f'run exceeded {deadline_s}s deadline; '
                            'emitted best-so-far')
        _emit()
        os._exit(3)

    timer = threading.Timer(deadline_s, expire)
    timer.daemon = True
    timer.start()
    return timer


def _init_backend_with_watchdog(timeout_s=900):
    """jax backend init hangs FOREVER when the TPU tunnel is down (an
    observed multi-hour failure mode); emit a diagnostic JSON line and
    exit instead of stalling the driver. Normal init is ~75 s."""
    import threading

    def expire():
        _result['error'] = (f'TPU backend init exceeded {timeout_s}s '
                            '(tunnel outage?)')
        _emit()
        os._exit(2)

    timer = threading.Timer(timeout_s, expire)
    timer.daemon = True
    timer.start()
    import jax
    if TINY:
        jax.config.update('jax_platforms', 'cpu')
    jax.devices()
    timer.cancel()
    return jax


def _fault(point):
    """Test hook: BENCH_FAULT=<point> stalls at that point so the
    watchdog/progressive-output protocol can be exercised off-chip."""
    if os.environ.get('BENCH_FAULT') == point:
        _note(f'BENCH_FAULT={point}: stalling')
        time.sleep(3600)


def main():
    deadline = float(os.environ.get('BENCH_DEADLINE_S', '1500'))
    _install_run_watchdog(deadline)

    jax = _init_backend_with_watchdog()
    import jax.numpy as jnp

    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models.irv1_fast import build_fast_params, fast_forward
    from facenet_tpu.models.quantize import quantize_fast_params

    _note(f'backend up: {jax.devices()[0].platform}')
    # Parseable fallback from this point on — overridden by real lines.
    _emit({'error': 'backend up; measurement incomplete'})

    model_cfg = None
    if TINY:
        model_cfg = {'block35': {'repeat': 1}, 'block17': {'repeat': 1},
                     'block8_1': {'repeat': 1}, 'output': {'size': 32}}
    model = create_model(model_cfg) if model_cfg else create_model()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (K, CHUNK, 160, 160, 3), dtype=np.uint8)

    # ALL setup is host work — pin it to CPU so none of it rides the
    # tunnel. model.init is EAGER flax interpretation: on the TPU backend
    # every one of its hundreds of ops is a separate tunnel dispatch, and
    # on a degraded-tunnel day that alone exceeds the whole-run deadline
    # (observed 2026-08-20: >25 min inside init, the true round-4 killer;
    # the jitted measurement path compiled in minutes the same hour).
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), images[0, :1],
                               train=False)
        _note('model init done (CPU)')
        params, cfg = build_fast_params(variables, model_cfg)
    _note('params built')

    # Chaining rides `cur` (each call's input depends on the previous
    # call's output); the probe forces completion of the chain. NOTE: the
    # r1-r4 version threaded an unused `prev` whose shape CHANGED between
    # the first and second call, silently doubling the remote full-model
    # compiles (2 per dtype at 80-170 s each) — a likely round-4 killer.
    def forward_chained(params, images):
        def body(carry, chunk):
            emb = fast_forward(params, cfg, chunk)
            return carry + emb[0, 0] * 0, emb[:, 0]
        acc, probe = jax.lax.scan(body, jnp.float32(0), images)
        return probe, images + (acc * 0).astype(jnp.uint8)

    fwd = jax.jit(forward_chained)
    device = jax.devices()[0]

    def measure(p, label):
        _note(f'{label}: compiling + warmup')
        p = jax.device_put(p, device)
        cur = jax.device_put(images, device)
        out = None
        for _ in range(WARMUP):
            out, cur = fwd(p, cur)
        np.asarray(out[0, 0])
        _note(f'{label}: measuring')
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out, cur = fwd(p, cur)
        np.asarray(out[0, 0])     # forces completion of the whole chain
        rate = K * CHUNK * ITERS / (time.perf_counter() - t0)
        _note(f'{label}: {rate:,.0f} img/s')
        return rate

    # ---- headline path FIRST: int8 PTQ serving --------------------------
    # Calibration is eager (one op per conv) — pin it to CPU so it never
    # rides the tunnel; scales are dtype-insensitive at this batch size.
    _note('calibrating int8 on CPU')
    with jax.default_device(jax.devices('cpu')[0]):
        qparams = quantize_fast_params(params, cfg, images[0, :32])
    _fault('before_int8')
    int8_img_per_s = measure(qparams, 'int8')

    _result.pop('error', None)
    _result.update({
        'value': round(int8_img_per_s, 1),
        'vs_baseline': round(int8_img_per_s / BASELINE_IMG_PER_S, 2),
        'serving': 'int8',
        'int8_img_per_s': round(int8_img_per_s, 1),
    })
    _emit()

    # ---- continuity path: bf16 ------------------------------------------
    _fault('before_bf16')
    bf16_img_per_s = measure(params, 'bf16')

    img_per_s = max(int8_img_per_s, bf16_img_per_s)
    _result.update({
        'value': round(img_per_s, 1),
        'vs_baseline': round(img_per_s / BASELINE_IMG_PER_S, 2),
        'serving': 'int8' if int8_img_per_s >= bf16_img_per_s else 'bf16',
        'int8_img_per_s': round(int8_img_per_s, 1),
        'bf16_img_per_s': round(bf16_img_per_s, 1),
    })
    _emit()


if __name__ == '__main__':
    main()
