"""Checkpointing with Orbax — the TPU-native replacement for the reference's
Keras ModelCheckpoint / TF1 save_variables_and_metagraph
(SURVEY.md §5 "Checkpoint / resume"; reference train_softmax.py:74-78,
tfutils.py:267-283).

Per-epoch checkpoints of the full TrainState (params, BN stats, optimizer
state, center table, step, rng) with automatic retention and resume-latest.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory, max_to_keep=3):
        self.directory = Path(str(directory)).expanduser().resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=int(max_to_keep or 3), create=True),
        )

    def save(self, step, state):
        """Save a TrainState (or any pytree) at `step` — asynchronously.

        Orbax writes in the background so the train loop continues
        immediately (SURVEY.md §5 checkpoint plan); restore()/close() wait
        for any in-flight write first.
        """
        self._mgr.save(int(step), args=ocp.args.StandardSave(_to_savable(state)))

    def latest_step(self):
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, abstract_state, step=None):
        """Restore into the structure of `abstract_state` (a template pytree)."""
        self._mgr.wait_until_finished()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            int(step),
            args=ocp.args.StandardRestore(_to_savable(abstract_state)))
        return _from_savable(abstract_state, restored)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def _to_savable(state):
    """TrainState -> plain dict pytree (drop None leaves orbax can't store).

    Plain dict/pytree states pass through unchanged."""
    if not hasattr(state, 'params'):
        return state
    d = {
        'step': state.step,
        'params': state.params,
        'batch_stats': state.batch_stats,
        'opt_state': state.opt_state,
        'rng': state.rng,
    }
    if getattr(state, 'centers', None) is not None:
        d['centers'] = state.centers
    return d


def _from_savable(template, restored):
    if not hasattr(template, 'params'):
        return restored
    kw = dict(
        step=restored['step'],
        params=restored['params'],
        batch_stats=restored['batch_stats'],
        opt_state=restored['opt_state'],
        rng=restored['rng'],
    )
    kw['centers'] = restored.get('centers', None)
    return template.replace(**kw)
