"""Pair-classifier training — the working version of the reference's
train_classifier path (reference apps/train_classifier.py, whose
`facenet.train_op` symbol is missing — SURVEY.md §2.9).

A tiny (2-3 scalar) classifier is trained with weighted BCE over
upper-triangle pair logits of P-classes x K-examples equal batches, with
exponential-decay LR (ref train_classifier.py:113-125). The whole step —
distance matrix, logits, loss, grads, update — is one jitted computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facenet_tpu.faceclass import (FaceToFaceDistanceClassifier,
                                   FaceToFaceNormalizedEmbeddingsClassifier)
from facenet_tpu.logging import logger
from facenet_tpu.ops.losses import binary_cross_entropy_pair_loss
from facenet_tpu.ops.lr_schedules import exponential_decay_schedule


class ConfusionMatrix:
    """Class-pair confusion of a pair classifier (ref train_classifier.py:17-57)."""

    def __init__(self, embeddings, classifier):
        nrof_classes = len(embeddings)
        nrof_positive_class_pairs = nrof_classes
        nrof_negative_class_pairs = nrof_classes * (nrof_classes - 1) / 2

        tp = tn = fp = fn = 0.0

        for i in range(nrof_classes):
            for k in range(i):
                outs = classifier.predict(embeddings[i], embeddings[k])
                mean = np.mean(outs)
                fp += mean
                tn += 1 - mean

            outs = classifier.predict(embeddings[i])
            mean = np.mean(outs)
            tp += mean
            fn += 1 - mean

        tp /= nrof_positive_class_pairs
        fn /= nrof_positive_class_pairs
        fp /= nrof_negative_class_pairs
        tn /= nrof_negative_class_pairs

        self.classifier = classifier
        self.accuracy = (tp + tn) / (tp + fp + tn + fn)
        self.precision = tp / (tp + fp) if (tp + fp) > 0 else 1.0
        self.tp_rate = tp / (tp + fn) if (tp + fn) > 0 else 1.0
        self.tn_rate = tn / (tn + fp) if (tn + fp) > 0 else 1.0

    def __repr__(self):
        return (f'{self.__class__.__name__}\n' +
                f'{str(self.classifier)}\n' +
                f'accuracy  {self.accuracy}\n' +
                f'precision {self.precision}\n' +
                f'tp rate   {self.tp_rate}\n' +
                f'tn rate   {self.tn_rate}\n')


class ClassifierTrainer:
    """Train a faceclass pair classifier on equal embedding batches."""

    def __init__(self, cfg, normalized=False):
        self.cfg = cfg
        self.normalized = normalized

        if normalized:
            self.model = FaceToFaceNormalizedEmbeddingsClassifier()
        else:
            self.model = FaceToFaceDistanceClassifier()

        lr_cfg = cfg.train.learning_rate_schedule
        decay_steps = lr_cfg.decay_steps or cfg.train.epoch.size
        self.schedule = exponential_decay_schedule(
            lr_cfg.initial_value or 0.01, lr_cfg.decay_rate or 0.1,
            decay_steps)
        self.tx = optax.adam(self.schedule)

        self._step = None

    def _build_step(self, p, k):
        model = self.model

        def loss_fn(variables, batch):
            logits = model(batch, variables=variables)
            return binary_cross_entropy_pair_loss(logits, p, k)

        @jax.jit
        def step(variables, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(variables, batch)
            updates, opt_state = self.tx.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
            return variables, opt_state, loss

        return step

    def train(self, batch_iter, nrof_epochs, epoch_size, p, k,
              embeddings_per_class=None, logfile=None):
        """Run the training loop; returns the trained classifier.

        :param batch_iter: infinite iterator of [P*K, D] float32 batches
        :param embeddings_per_class: optional list of per-class arrays for
            the per-epoch ConfusionMatrix evaluation
        """
        step = self._build_step(p, k)
        variables = self.model.variables
        opt_state = self.tx.init(variables)

        loss = None
        for epoch in range(nrof_epochs):
            for _ in range(epoch_size):
                batch = jnp.asarray(next(batch_iter))
                variables, opt_state, loss = step(variables, opt_state, batch)

            self.model.variables = jax.device_get(variables)
            lr = float(self.schedule(jnp.asarray((epoch + 1) * epoch_size)))
            info = (f'epoch [{epoch + 1}/{nrof_epochs}], '
                    f'loss {float(loss):.5f}, learning rate {lr:.6f}')
            logger.info(info)

            if embeddings_per_class is not None:
                conf_mat = ConfusionMatrix(embeddings_per_class, self.model)
                logger.info(str(conf_mat))
                if logfile:
                    from facenet_tpu import ioutils
                    ioutils.write_text_log(logfile, info)
                    ioutils.write_text_log(logfile, conf_mat)

        self.model.variables = jax.device_get(variables)
        return self.model
