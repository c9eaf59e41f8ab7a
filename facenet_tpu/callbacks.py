"""Training callbacks.

Parity with the reference callbacks module (reference facenet/callbacks.py):
an every-N-epochs validation hook that embeds the test set and runs the full
FaceToFaceValidation, plus checkpoint/report hooks for the app-driven loop
(the Keras callback protocol becomes plain on_epoch_end callables).
"""

from __future__ import annotations

from facenet_tpu import facenet, statistics
from facenet_tpu.logging import logger


class ValidateCallback:
    """Every-N-epochs validation (ref callbacks.py:12-28).

    :param forward_factory: state -> (images -> embeddings) jitted forward
    :param batches_factory: () -> iterable of (images, labels) over test set
    """

    def __init__(self, forward_factory, batches_factory, every_n_epochs,
                 max_nrof_epochs, config, report_file=None, h5file=None):
        self.forward_factory = forward_factory
        self.batches_factory = batches_factory
        self.every_n_epochs = int(every_n_epochs or 10)
        self.max_nrof_epochs = int(max_nrof_epochs or 0)
        self.config = config
        self.report_file = report_file
        self.h5file = h5file
        self.last_validation = None

    def on_epoch_end(self, epoch, state):
        epoch1 = epoch + 1
        if epoch1 % self.every_n_epochs != 0 and epoch1 != self.max_nrof_epochs:
            return None

        logger.info(f'perform validation for epoch {epoch1}')

        forward = self.forward_factory(state)
        embeddings, labels = facenet.evaluate_embeddings(
            forward, self.batches_factory())

        validation = statistics.FaceToFaceValidation(
            embeddings, labels, self.config.validate)

        if self.report_file:
            validation.write_report(self.report_file)
        if self.h5file:
            validation.write_h5file(self.h5file, tag=f'epoch_{epoch1}')

        self.last_validation = validation
        return validation


class CheckpointCallback:
    """Per-epoch checkpointing (the reference's ModelCheckpoint role,
    reference train_softmax.py:74-78)."""

    def __init__(self, manager):
        self.manager = manager

    def on_epoch_end(self, epoch, state):
        self.manager.save(int(state.step), state)
