"""Tracing, profiling, and debug instrumentation.

The reference's observability is tqdm bars + elapsed-time log lines
(SURVEY.md §5 "Tracing / profiling"; reference ioutils.py:25-41,
statistics.py:246,313) and `tf.debugging.set_log_device_placement`
(train_softmax_tf2_gpus.py:47). The TPU-native equivalents here:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable trace (XLA ops, HBM usage, ICI collectives);
  * `StepTimer` — cheap per-step wall timing with EMA + throughput, logged
    every N steps (the train-loop hook the reference got from Keras verbose
    output);
  * `apply_debug_config(cfg)` — config-driven switches: NaN checking
    (`jax_debug_nans`, SURVEY.md §5 "Race detection / sanitizers" plan) and
    XLA HLO dumps (`XLA_FLAGS=--xla_dump_to=...`, which must be set before
    the backend initializes — apply_debug_config warns if it is too late).
"""

from __future__ import annotations

import contextlib
import os
import time

from facenet_tpu.logging import logger


@contextlib.contextmanager
def trace(logdir, create_perfetto_link=False):
    """Profile everything inside the context into `logdir`.

    View with TensorBoard's profile plugin or the generated perfetto link.
    """
    import jax
    logdir = str(logdir)
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info(f'profiler trace written to {logdir}')


def start_server(port=9999):
    """Start the on-demand profiling server (connect with TensorBoard)."""
    import jax
    return jax.profiler.start_server(int(port))


def annotate(name):
    """Named region that shows up in profiler traces (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(str(name))


class StepTimer:
    """Wall-clock per-step timing with EMA and items/s throughput."""

    def __init__(self, items_per_step=0, ema=0.95, log_every=0, name='step'):
        self.items_per_step = items_per_step
        self.ema_factor = ema
        self.log_every = log_every
        self.name = name
        self.reset()

    def reset(self):
        self.count = 0
        self.ema_s = None
        self.total_s = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        self.total_s += dt
        self.ema_s = (dt if self.ema_s is None
                      else self.ema_factor * self.ema_s +
                      (1 - self.ema_factor) * dt)
        if self.log_every and self.count % self.log_every == 0:
            logger.info(str(self))
        return False

    @property
    def items_per_sec(self):
        if not self.ema_s:
            return 0.0
        return self.items_per_step / self.ema_s

    def __repr__(self):
        msg = (f'{self.name} {self.count}: '
               f'{(self.ema_s or 0) * 1000:.1f} ms/step (ema)')
        if self.items_per_step:
            msg += f', {self.items_per_sec:.1f} items/s'
        return msg


def apply_debug_config(cfg):
    """Apply config-driven debug switches (cfg.debug.* from the app YAML).

    debug:
      nans: true           # jax_debug_nans — error on first NaN producer
      xla_dump_to: <dir>   # XLA HLO dumps (set before backend init!)
    """
    if not cfg:
        return
    import jax
    if cfg.nans:
        jax.config.update('jax_debug_nans', True)
        logger.info('jax_debug_nans enabled')
    if cfg.xla_dump_to:
        dump = str(cfg.xla_dump_to)
        flags = os.environ.get('XLA_FLAGS', '')
        if f'--xla_dump_to={dump}' not in flags:
            os.environ['XLA_FLAGS'] = (
                f'{flags} --xla_dump_to={dump}').strip()
        try:
            backend_up = jax._src.xla_bridge._backends  # noqa: SLF001
        except Exception:
            backend_up = None
        if backend_up:
            logger.warning(
                'xla_dump_to set after the JAX backend initialized — '
                'dumps will only appear for new compilations in fresh '
                'processes; set XLA_FLAGS before importing jax for full '
                'coverage')
