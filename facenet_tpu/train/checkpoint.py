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
            # declare the handler so a freshly opened manager can serve
            # item_metadata() (used by restore()'s data_state probe)
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, step, state, data_state=None):
        """Save a TrainState (or any pytree) at `step` — asynchronously.

        Orbax writes in the background so the train loop continues
        immediately (SURVEY.md §5 checkpoint plan); restore()/close() wait
        for any in-flight write first.

        :param data_state: optional input-pipeline cursor (BatchLoader /
            PKPipeline `.state()`) written alongside, so a resumed run
            continues the exact sample sequence mid-epoch.
        """
        savable = _to_savable(state)
        if data_state is not None:
            savable = dict(savable)
            savable['data_state'] = {k: np.asarray(v)
                                     for k, v in data_state.items()}
        self._mgr.save(int(step), args=ocp.args.StandardSave(savable))

    def latest_step(self):
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, abstract_state, step=None, with_data_state=False):
        """Restore into the structure of `abstract_state` (a template pytree).

        With `with_data_state=True` returns (state, data_state_dict_or_None)
        — the pipeline cursor saved by `save(..., data_state=...)`, if any.
        """
        self._mgr.wait_until_finished()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return (None, None) if with_data_state else None

        template = dict(_to_savable(abstract_state))
        # probe the stored tree for a pipeline cursor; restoring against a
        # template silently drops keys the template doesn't have, so the
        # cursor slot must be added before the restore
        template.pop('data_state', None)
        cursor_keys = None
        try:
            meta = self._mgr.item_metadata(int(step))
            if 'data_state' in meta.keys():
                cursor_keys = list(meta['data_state'].keys())
        except Exception:
            pass
        if cursor_keys is not None:
            template['data_state'] = {k: np.zeros((), np.int64)
                                      for k in cursor_keys}

        restored = self._mgr.restore(
            int(step), args=ocp.args.StandardRestore(template))
        restored = dict(restored)
        data_state = restored.pop('data_state', None)
        if data_state is not None:
            data_state = {k: int(v) for k, v in data_state.items()}
        state = _from_savable(abstract_state, restored)
        return (state, data_state) if with_data_state else state

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
