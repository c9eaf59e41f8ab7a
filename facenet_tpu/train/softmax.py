"""Softmax (+ center / triplet) embedding training under pjit data parallelism.

Rebuilds the reference training path (SURVEY.md §3.1, reference
apps/train_softmax.py): backbone + Dense logits head over identity classes,
sparse softmax CE with Adam(eps=0.1) (ref train_softmax.py:90-93), optional
center loss (ref facenet.py:204-217) and triplet loss with online semi-hard
mining (BASELINE.json configs[4]), piecewise epoch LR schedule
(ref facenet.py:381-400), per-epoch checkpoints and every-N-epochs validation
(ref callbacks.py:21-28).

TPU-first design:
  * one jitted `train_step` — forward, losses, grads, Adam update, BN stats
    and center-table updates all inside a single XLA computation;
  * GSPMD parallelism: batch sharded over the 'data' mesh axis, the wide
    logits kernel optionally sharded over 'model' (ref's MirroredStrategy
    all-reduce becomes XLA ICI collectives, SURVEY.md §2.8);
  * bf16 activations; f32 params, optimizer state, loss arithmetic;
  * host pipeline feeds uint8 batches; preprocessing runs in-model.
"""

from __future__ import annotations

import itertools
import time
from functools import partial
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import freeze, unfreeze

from facenet_tpu.config import Config
from facenet_tpu.logging import logger
from facenet_tpu.models.inception_resnet_v1 import (
    WEIGHT_DECAY, InceptionResnetV1, l2_regularization)
from facenet_tpu.ops import losses as losses_mod
from facenet_tpu.ops.lr_schedules import schedule_from_config
from facenet_tpu.parallel import mesh as mesh_mod


class SoftmaxClassifier(nn.Module):
    """Backbone + identity-logits head (ref train_softmax.py:55-64)."""
    backbone: nn.Module     # any zoo model: IRv1 or IRv2 (models/__init__.py)
    nrof_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = False):
        # prelogits: unnormalized bottleneck embedding
        prelogits = self.backbone(images, train=train, normalize=False)
        logits = nn.Dense(self.nrof_classes, dtype=self.dtype,
                          param_dtype=jnp.float32,
                          kernel_init=nn.initializers.glorot_uniform(),
                          bias_init=nn.initializers.zeros,
                          name='logits')(prelogits.astype(self.dtype))
        return logits.astype(jnp.float32), prelogits


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    centers: Any                     # [C, D] center-loss table (or None)
    rng: Any

    def replace_step(self, **kw):
        return self.replace(**kw)


def make_train_step(model, tx, loss_cfg, augment_cfg=None, image_size=160,
                    remat=False, frozen_bn=False):
    """Build the jitted train step closure.

    Returns step(state, images, labels) -> (state, metrics).
    With remat=True the forward is wrapped in jax.checkpoint so backward
    recomputes activations instead of keeping them in HBM — trades ~1/3 more
    FLOPs for the activation memory of the whole backbone (enables larger
    per-chip batches).

    With frozen_bn=True the forward normalizes with the RUNNING BN
    statistics (train=False semantics, batch_stats untouched) while
    params still train — the late-phase schedule that removes the
    train-BN activation passes (the +17.6 ms structural floor measured
    in tools/profile_train.py; VERDICT r4 next #5). The model has no
    dropout, so train=False changes BN behavior only.
    """
    center_factor = float(loss_cfg.center_factor or 0.0)
    center_alfa = float(loss_cfg.center_alfa or 0.95)
    triplet_factor = float(loss_cfg.triplet_factor or 0.0)
    triplet_margin = float(loss_cfg.triplet_margin or 0.2)
    # softmax CE weight; 0 makes triplet (or center) the primary objective —
    # the FaceNet-paper recipe (BASELINE.json configs[4]). softmax_factor is
    # "missing means 1.0", not `or`-defaulted, because 0 is a valid setting.
    from facenet_tpu.config import value_or
    softmax_factor = float(value_or(loss_cfg.softmax_factor, 1.0))
    random_crop = bool(augment_cfg.random_crop) if augment_cfg else False
    random_flip = bool(augment_cfg.random_flip) if augment_cfg else False

    def apply_fn(params, batch_stats, images, rng):
        if frozen_bn:
            out = model.apply({'params': params, 'batch_stats': batch_stats},
                              images, train=False)
            return out, {'batch_stats': batch_stats}
        return model.apply(
            {'params': params, 'batch_stats': batch_stats},
            images, train=True, mutable=['batch_stats'], rngs={'dropout': rng})

    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(params, batch_stats, centers, images, labels, rng):
        (logits, prelogits), mutated = apply_fn(params, batch_stats, images,
                                                rng)

        ce = losses_mod.softmax_cross_entropy_with_logits(logits, labels)
        reg = l2_regularization(params, WEIGHT_DECAY)
        total = softmax_factor * ce + reg

        metrics = {'cross_entropy': ce, 'regularization': reg}

        new_centers = centers
        if centers is not None and center_factor > 0:
            c_loss, new_centers = losses_mod.center_loss(
                prelogits, labels, centers, center_alfa)
            total = total + center_factor * c_loss
            metrics['center_loss'] = c_loss

        if triplet_factor > 0:
            emb = prelogits.astype(jnp.float32)
            emb = emb / jnp.sqrt(jnp.maximum(
                jnp.sum(jnp.square(emb), axis=1, keepdims=True), 1e-10))
            t_loss = losses_mod.triplet_semihard_loss(emb, labels,
                                                      triplet_margin)
            total = total + triplet_factor * t_loss
            metrics['triplet_loss'] = t_loss

        acc = jnp.mean(
            (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
        metrics.update({'loss': total, 'accuracy': acc})

        return total, (mutated['batch_stats'], new_centers, metrics)

    def train_step(state, images, labels):
        rng, step_rng, aug_rng = jax.random.split(state.rng, 3)

        if random_crop or random_flip:
            from facenet_tpu.ops.preprocessing import random_augment
            images = random_augment(aug_rng, images,
                                    random_crop=random_crop,
                                    random_flip=random_flip,
                                    crop_size=image_size)

        grads, (batch_stats, centers, metrics) = jax.grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.centers, images, labels, step_rng)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=batch_stats,
            opt_state=opt_state, centers=centers, rng=rng)
        return new_state, metrics

    return train_step


class SoftmaxTrainer:
    """End-to-end trainer: mesh, state, jitted step, epoch loop, checkpoints."""

    def __init__(self, cfg, nrof_classes, model_cfg=None, mesh=None,
                 devices=None):
        """:param mesh: explicit jax.sharding.Mesh (overrides cfg.mesh)
        :param devices: explicit device list for mesh construction — lets a
            caller (tests, the driver's multi-chip dryrun) build the mesh over
            virtual CPU devices instead of whatever jax.devices() returns.
        """
        self.cfg = cfg
        self.nrof_classes = int(nrof_classes)

        from facenet_tpu.utils import profiling
        profiling.apply_debug_config(cfg.debug)

        image_cfg = cfg.image
        # model selection via the `module:` key of the model config (the
        # reference's model-YAML contract); bare topology dicts still build
        # the default Inception-ResNet-v1
        from facenet_tpu import models as models_zoo
        zoo_cfg = model_cfg if model_cfg is not None else cfg.model
        backbone = models_zoo.create_model_from_config(zoo_cfg,
                                                       image_cfg=image_cfg)
        self.backbone = backbone
        self.model = SoftmaxClassifier(backbone=backbone,
                                       nrof_classes=self.nrof_classes)

        self.mesh = mesh if mesh is not None else mesh_mod.create_mesh(
            data=cfg.mesh.data or None, model=cfg.mesh.model or 1,
            devices=devices)

        steps_per_epoch = int(cfg.train.epoch.size or 1000)
        self.steps_per_epoch = steps_per_epoch
        self.schedule = schedule_from_config(cfg.train, steps_per_epoch)
        self.tx = optax.adam(self.schedule,
                             eps=float(cfg.train.adam_epsilon or 0.1))

        self.image_size = int(image_cfg.size or 160)
        self._step_fn = None

    # ------------------------------------------------------------------
    def init_state(self, seed=0):
        rng = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(rng)

        dummy = jnp.zeros((2, self.image_size, self.image_size, 3), jnp.uint8)
        variables = jax.jit(self.model.init, static_argnames=('train',))(
            init_rng, dummy, train=False)

        params = variables['params']
        batch_stats = variables['batch_stats']

        center_factor = float(self.cfg.loss.center_factor or 0.0)
        embedding_dim = int(
            params['backbone']['Bottleneck']['kernel'].shape[1])
        centers = (jnp.zeros((self.nrof_classes, embedding_dim), jnp.float32)
                   if center_factor > 0 else None)

        opt_state = self.tx.init(params)

        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state,
                           centers=centers, rng=state_rng)
        return self.shard_state(state)

    def shard_state(self, state):
        """Place the state on the mesh: logits head sharded over 'model',
        everything else replicated. Adam's mu/nu moments mirror the params
        pytree, so they take the params shardings — a sharded logits kernel
        keeps its optimizer state sharded the same way (no per-chip full
        copies, no resharding inside the step)."""
        p_shard = mesh_mod.param_shardings(self.mesh, state.params)
        rep = mesh_mod.replicated(self.mesh)
        # place_global == device_put single-process; multi-host it builds
        # global arrays from each process's identical host copy
        place = mesh_mod.place_global

        def put(tree, shardings):
            return jax.tree_util.tree_map(place, tree, shardings)

        pdef = jax.tree_util.tree_structure(state.params)

        def params_like(node):
            try:
                return jax.tree_util.tree_structure(node) == pdef
            except Exception:
                return False

        def place_opt(node):
            if params_like(node):
                return put(node, p_shard)
            return place(node, rep)

        opt_state = jax.tree_util.tree_map(
            place_opt, state.opt_state,
            is_leaf=lambda n: params_like(n) or hasattr(n, 'shape'))

        return state.replace(
            params=put(state.params, p_shard),
            batch_stats=jax.tree_util.tree_map(
                lambda x: place(x, rep), state.batch_stats),
            opt_state=opt_state,
            centers=(place(state.centers, rep)
                     if state.centers is not None else None),
            rng=place(state.rng, rep),
            step=place(state.step, rep),
        )

    # ------------------------------------------------------------------
    def warm_start(self, state, variables):
        """Graft pretrained BACKBONE variables into a fresh train state.

        The reference fine-tunes from a pretrained checkpoint (README
        "Pre-trained models" + train_softmax's pretrained_model option
        upstream); here the source is a serving bundle or an imported
        reference-h5 tree (models/import_weights.py) — {'params',
        'batch_stats'} of the backbone only. The classifier head,
        optimizer state and centers stay freshly initialized; imported
        identity BN stats are re-estimated from data as training runs.

        Leaves are placed with each target leaf's existing sharding, so a
        warm-started state is exactly as mesh-placed as `init_state`'s.
        Raises on any shape mismatch (topology/config drift fails loudly).
        """
        variables = unfreeze(variables)

        def graft(path, old, new):
            # shape/dtype are array metadata — never fetch `old` to host
            # (a full-model pull through the dev tunnel costs seconds)
            new_np = np.asarray(new)
            if tuple(old.shape) != new_np.shape:
                name = '/'.join(str(getattr(k, 'key', k)) for k in path)
                raise ValueError(
                    f'warm_start shape mismatch at backbone/{name}: '
                    f'state {tuple(old.shape)} vs weights {new_np.shape}')
            return jax.device_put(new_np.astype(old.dtype), old.sharding)

        params = unfreeze(state.params)
        params['backbone'] = jax.tree_util.tree_map_with_path(
            graft, params['backbone'], variables['params'])
        batch_stats = unfreeze(state.batch_stats)
        batch_stats['backbone'] = jax.tree_util.tree_map_with_path(
            graft, batch_stats['backbone'], variables['batch_stats'])
        return state.replace(params=freeze(params) if not
                             isinstance(state.params, dict) else params,
                             batch_stats=freeze(batch_stats) if not
                             isinstance(state.batch_stats, dict)
                             else batch_stats)

    # ------------------------------------------------------------------
    @property
    def step_fn(self):
        if self._step_fn is None:
            raw = make_train_step(self.model, self.tx, self.cfg.loss,
                                  augment_cfg=self.cfg.image,
                                  image_size=self.image_size,
                                  remat=bool(self.cfg.train.remat))
            self._step_fn = jax.jit(raw, donate_argnums=(0,))
        return self._step_fn

    @property
    def frozen_bn_step_fn(self):
        """Late-phase step: running-BN-stats forward (see make_train_step
        frozen_bn); jitted lazily so runs that never freeze pay nothing."""
        if getattr(self, '_frozen_step_fn', None) is None:
            raw = make_train_step(self.model, self.tx, self.cfg.loss,
                                  augment_cfg=self.cfg.image,
                                  image_size=self.image_size,
                                  remat=bool(self.cfg.train.remat),
                                  frozen_bn=True)
            self._frozen_step_fn = jax.jit(raw, donate_argnums=(0,))
        return self._frozen_step_fn

    def _placed_batches(self, batches, batch_shard, prefetch):
        """Yield (global_batch_size, device_images, device_labels) with up
        to `prefetch` batches' host->device transfers in flight ahead of
        the consumer. device_put is async, so enqueueing batch n+1 while
        step n computes overlaps the PCIe/ICI copy with compute (the
        tf.data prefetch the reference gets from dataset.py:15-43); with
        prefetch <= 1 this degrades to the strictly serial order."""
        from collections import deque

        n_proc = jax.process_count()
        queue = deque()
        for images, labels in batches:
            size = len(images)
            # multi-host: every process's pipeline draws the IDENTICAL
            # global batch (same seed and cursor), so each contributes its
            # own contiguous slice and distribute_batch reassembles the
            # global array — batch_size stays the GLOBAL batch size.
            if n_proc > 1:
                if size % n_proc:
                    raise ValueError(
                        f'global batch {size} not divisible by '
                        f'{n_proc} processes')
                per = size // n_proc
                lo = jax.process_index() * per
                images = images[lo:lo + per]
                labels = labels[lo:lo + per]
            queue.append((size,
                          mesh_mod.distribute_batch(self.mesh, images,
                                                    batch_shard),
                          mesh_mod.distribute_batch(self.mesh, labels,
                                                    batch_shard)))
            if len(queue) >= max(int(prefetch), 1):
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    def train_epoch(self, state, batches, epoch, log_every=100,
                    frozen_bn=False):
        """One epoch over an iterable of (images, labels) host batches.

        :param frozen_bn: run this epoch with running-BN-stats forwards
            (cfg.train.freeze_bn_epoch wiring in apps/train_softmax.py)
        """
        from facenet_tpu.config import value_or
        from facenet_tpu.utils import profiling

        batch_shard = mesh_mod.batch_sharding(self.mesh)
        prefetch = int(value_or(self.cfg.train.prefetch, 2))
        # Bound the draw from the underlying pipeline to exactly one
        # epoch BEFORE the prefetch queue: the generator transfers up to
        # `prefetch` batches ahead of the consumer, so breaking out of
        # the loop below would otherwise abandon already-pulled batches —
        # advancing the resumable cursor past data that was never
        # trained (batches is shared across epochs by the caller).
        batches = itertools.islice(iter(batches), self.steps_per_epoch)
        t0 = time.monotonic()
        metrics = None
        n = 0

        # optional jax.profiler trace of a step window (cfg.profiling)
        prof = self.cfg.profiling
        trace_dir = str(prof.trace_dir) if prof and prof.trace_dir else None

        trace_epoch = int(value_or(prof.epoch if prof else None, 0))
        trace_start = int(value_or(prof.start_step if prof else None, 3))
        trace_steps = int(value_or(prof.num_steps if prof else None, 5))
        tracing = False

        timer = profiling.StepTimer(
            items_per_step=0, log_every=0, name=f'epoch {epoch} step')

        for size, images, labels in self._placed_batches(batches, batch_shard,
                                                         prefetch):
            if trace_dir and epoch == trace_epoch and n == trace_start:
                from jax import profiler as jax_profiler
                jax_profiler.start_trace(trace_dir)
                tracing = True
            timer.items_per_step = size
            step = self.frozen_bn_step_fn if frozen_bn else self.step_fn
            with timer:
                state, metrics = step(state, images, labels)
            n += 1
            if tracing and n >= trace_start + trace_steps:
                from jax import profiler as jax_profiler
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                jax_profiler.stop_trace()
                tracing = False
                logger.info(f'profiler trace written to {trace_dir}')
            if log_every and n % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logger.info(
                    f'epoch {epoch} step {n}/{self.steps_per_epoch} ' +
                    ' '.join(f'{k}={v:.4f}' for k, v in m.items()))
            if n >= self.steps_per_epoch:
                break

        if tracing:
            from jax import profiler as jax_profiler
            jax_profiler.stop_trace()

        # sync BEFORE reading the clock: steps chain through `state`, so
        # materializing the last step's metrics waits for the whole epoch
        # (async dispatch makes unsynced timing lie — see CLAUDE.md)
        m = {k: float(v) for k, v in (metrics or {}).items()}
        dt = time.monotonic() - t0
        m['epoch_time_s'] = dt
        m['steps'] = n
        m['img_per_s'] = (n * timer.items_per_step / dt) if dt > 0 else 0.0
        return state, m

    # ------------------------------------------------------------------
    def embedding_forward(self, state):
        """Jitted inference forward: uint8 images -> L2-normalized embeddings."""
        backbone = self.backbone

        @jax.jit
        def forward(images, params, batch_stats):
            return backbone.apply(
                {'params': params['backbone'], 'batch_stats': batch_stats['backbone']},
                images, train=False)

        def fn(images):
            return forward(images, state.params, state.batch_stats)

        return fn


