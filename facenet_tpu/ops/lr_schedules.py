"""Learning-rate schedules.

Parity with the reference scheduling (SURVEY.md §2 #16):
  * epoch-boundary piecewise table [[epoch, lr], ...] (ref facenet.py:381-400;
    default schedule [[100,.05],[200,.005],[300,.0005]] in
    apps/configs/train_softmax.yaml)
  * exponential decay lr0 * decay_rate^floor(step / decay_steps)
    (ref apps/train_classifier.py:113-125)

Both are provided as plain-python epoch callables (reference semantics) and
as step-wise optax-compatible schedules for jitted train loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class LearningRateScheduler:
    """Piecewise epoch schedule (ref facenet.py:381-400).

    config.value overrides; otherwise config.schedule is a list of
    [epoch_boundary, lr] rows — the lr of the first row whose boundary
    exceeds the current epoch is used.
    """

    def __init__(self, config):
        self.config = config
        self.default_value = config.value if config.value else None

    def __call__(self, epoch):
        if self.default_value is not None:
            return self.default_value

        learning_rate = self.config.schedule[-1][1]
        for (epoch_, learning_rate) in self.config.schedule:
            if epoch < epoch_:
                break

        return learning_rate


def piecewise_schedule(schedule, steps_per_epoch):
    """Step-wise (jit-friendly) version of LearningRateScheduler.

    :param schedule: [[epoch, lr], ...]
    :param steps_per_epoch: batches per epoch
    :return: optax-style schedule fn step -> lr (jnp scalar)
    """
    boundaries = jnp.asarray([int(e) * int(steps_per_epoch)
                              for e, _ in schedule])
    values = jnp.asarray([float(v) for _, v in schedule], jnp.float32)

    def fn(step):
        idx = jnp.sum(step >= boundaries)       # 0..len
        idx = jnp.minimum(idx, len(values) - 1)
        return values[idx]

    return fn


def constant_schedule(value):
    def fn(step):
        return jnp.asarray(float(value), jnp.float32)
    return fn


def exponential_decay_schedule(initial_value, decay_rate, decay_steps):
    """lr = lr0 * decay_rate ** floor(step / decay_steps) (ref train_classifier.py:116-125)."""
    lr0 = float(initial_value)
    rate = float(decay_rate)
    steps = float(decay_steps)

    def fn(step):
        return jnp.asarray(
            lr0 * rate ** jnp.floor(step / steps), jnp.float32)

    return fn


def schedule_from_config(train_cfg, steps_per_epoch):
    """Build a step schedule from a train config (value or schedule table)."""
    lr_cfg = train_cfg.learning_rate
    if lr_cfg.value:
        return constant_schedule(lr_cfg.value)
    return piecewise_schedule([list(row) for row in lr_cfg.schedule],
                              steps_per_epoch)
