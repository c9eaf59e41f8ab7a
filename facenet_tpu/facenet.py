"""Core helpers — the facenet_tpu equivalent of the reference's `facenet.facenet`
module (/root/reference/facenet/facenet.py): batch embedding evaluation, the
embeddings store, loss/schedule re-exports, and input-pipeline shims.

The reference module is mid-refactor (SURVEY.md §2.9); this module implements
the coherent union under one naming scheme.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

from facenet_tpu import h5utils
from facenet_tpu.dataset import (  # noqa: F401  (re-exports, reference names)
    ImageLoader, equal_batches_input_pipeline, pipeline_with_equal_batches)
from facenet_tpu.logging import logger
from facenet_tpu.ops.losses import (  # noqa: F401
    center_loss, softmax_cross_entropy_with_logits, triplet_semihard_loss)
from facenet_tpu.ops.lr_schedules import LearningRateScheduler  # noqa: F401
from facenet_tpu.ops.preprocessing import image_processing as ImageProcessing  # noqa: F401


def inputs(config):
    """Example input spec for the configured image size (ref facenet.py:35-36)."""
    import jax.numpy as jnp
    return np.zeros((1, int(config.size), int(config.size), 3), dtype=jnp.uint8)


def sharded_forward(forward_fn, mesh):
    """Wrap a jitted forward so input batches shard over the mesh 'data'
    axis — data-parallel embedding extraction (the v5e-8 north-star path:
    one uint8 batch split over all chips, XLA runs the same program SPMD).

    Uneven final batches are zero-padded to a device multiple and trimmed
    (two compiled shapes total: full batches and the padded remainder).
    """
    import jax
    from facenet_tpu.parallel.mesh import DATA_AXIS, batch_sharding

    n_dev = mesh.shape[DATA_AXIS]
    sharding = batch_sharding(mesh)

    def dispatch(images):
        """Async variant: enqueue transfer+forward, return the un-fetched
        device array plus the valid row count (evaluate_embeddings uses
        this to overlap batch n+1's load/transfer with batch n's
        compute)."""
        images = np.asarray(images)
        n = images.shape[0]
        pad = (-n) % n_dev
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        # single-controller eval: device_put over the local mesh. (The
        # TRAINING path is multi-host via mesh.distribute_batch; sharded
        # eval stays one process per SURVEY §2.8 — the reference's eval is
        # single-process numpy.)
        return forward_fn(jax.device_put(images, sharding)), n

    def fn(images):
        out, n = dispatch(images)
        return np.asarray(out)[:n]

    fn.dispatch = dispatch
    return fn


def evaluate_embeddings(forward_fn, batches, renormalize=True, mesh=None):
    """Run `forward_fn` over all batches; concatenate embeddings and labels.

    Equivalent of the reference evaluate_embeddings (facenet.py:184-201).

    :param forward_fn: images [B,H,W,3] uint8 -> [B,D] embeddings (jitted)
    :param batches: iterable of (images, labels)
    :param renormalize: re-apply exact L2 normalization in float64 on host.
        The TPU forward runs in bfloat16 and XLA may keep the final normalize
        in reduced precision; the validation statistics assert unit norms to
        1e-5 (reference statistics.py:38-42), so the eval path restores exact
        norms here (distances change by < 1e-3, accuracy is unaffected).
    :param mesh: optional jax.sharding.Mesh — batches shard over its 'data'
        axis (see sharded_forward)
    :return: (embeddings [N, D] float32, labels [N])

    The loop runs pipelined: each batch's forward is DISPATCHED before the
    previous batch's result is fetched, so when `forward_fn` returns an
    un-fetched device array (FaceNet.dispatch, sharded_forward.dispatch,
    or any jitted fn), batch n+1's host load + transfer overlap batch n's
    device compute. Sync forwards (plain numpy-returning callables)
    degrade to the serial order with identical results.
    """
    from collections import deque

    if mesh is not None:
        forward_fn = sharded_forward(forward_fn, mesh)
    # prefer the async dispatch when the forward exposes one
    dispatch = getattr(forward_fn, 'dispatch', forward_fn)

    embeddings_ = []
    labels_ = []

    def fetch(out, labels):
        if isinstance(out, tuple):      # (device array, valid rows)
            out, n = out
            arr = np.asarray(out)[:n]
        else:
            arr = np.asarray(out)
        embeddings_.append(arr)
        labels_.append(np.asarray(labels))

    pending = deque()
    for images, labels in batches:
        pending.append((dispatch(images), labels))
        if len(pending) >= 2:
            fetch(*pending.popleft())
    while pending:
        fetch(*pending.popleft())

    embeddings = np.concatenate(embeddings_)
    labels = np.concatenate(labels_)

    if renormalize:
        norms = np.linalg.norm(embeddings.astype(np.float64), axis=1,
                               keepdims=True)
        embeddings = (embeddings / np.maximum(norms, 1e-10)).astype(np.float32)

    return embeddings, labels


def split_embeddings(embeddings, labels):
    """Split a flat embeddings array into per-class arrays (ref facenet.py:220-225)."""
    list_of_embeddings = []
    for label in np.unique(labels):
        list_of_embeddings.append(embeddings[label == labels])
    return list_of_embeddings


class Embeddings:
    """Stored-embeddings loader with class/image subsampling (ref facenet.py:228-296)."""

    def __init__(self, config):
        self.config = config
        self.file = Path(str(config.path)).expanduser()

        per_class = split_embeddings(h5utils.read(self.file, 'embeddings'),
                                     h5utils.read(self.file, 'labels'))

        # Optional subsampling: first a random subset of classes, then a
        # per-class cap on image count. Both draws are without replacement
        # and leave smaller-than-cap groups untouched.
        class_cap = int(self.config.nrof_classes or 0)
        if class_cap and class_cap < len(per_class):
            per_class = random.sample(per_class, class_cap)

        image_cap = int(self.config.max_nrof_images or 0)
        if image_cap:
            per_class = [
                emb if emb.shape[0] <= image_cap
                else emb[random.sample(range(emb.shape[0]), image_cap)]
                for emb in per_class
            ]

        self.embeddings = per_class

    def __repr__(self):
        data = [len(e) for e in self.embeddings]
        embeddings = np.concatenate(self.embeddings, axis=0)
        norm = np.linalg.norm(embeddings, axis=1)

        return (f'{self.__class__.__name__}\n' +
                f'Input file {self.file}\n' +
                f'Number of classes {self.nrof_classes} \n' +
                f'Number of images {self.nrof_images}\n' +
                f'Minimal number of images in class {min(data)}\n' +
                f'Maximal number of images in class {max(data)}\n' +
                '\n' +
                f'Minimal embedding {np.min(norm)}\n' +
                f'Maximal embedding {np.max(norm)}\n' +
                f'Mean embedding {np.mean(norm)}\n')

    @property
    def nrof_classes(self):
        return len(self.embeddings)

    @property
    def nrof_images(self):
        return sum(len(e) for e in self.embeddings)

    @property
    def length(self):
        return self.embeddings[0].shape[1]

    def data(self, normalize=False):
        embeddings = self.embeddings
        if normalize:
            embeddings = [e / np.linalg.norm(e, axis=1, keepdims=True)
                          for e in embeddings]
        return embeddings


class EvaluationOfEmbeddings:
    """Batched embedding extraction over a Database (ref facenet.py:299-338,
    commented out there; the apps still call it — SURVEY.md §2.9)."""

    def __init__(self, dbase, config, forward_fn=None):
        from facenet_tpu.dataset import ImageLoader as Loader

        self.config = config
        self.dbase = dbase

        renormalize = True
        if forward_fn is None:
            from facenet_tpu import FaceNet
            facenet = FaceNet(config.model)
            # async dispatch: evaluate_embeddings fetches one batch behind
            forward_fn = facenet.dispatch
            # when raw (unnormalized) embeddings were requested, the host
            # must not re-normalize them either
            renormalize = facenet.normalize

        loader = Loader(config=config.image)
        batches = dbase.batches(loader, batch_size=int(config.batch_size or 100))

        # optional data-parallel extraction (config.mesh; data null = all
        # devices, the same convention as mesh.create_mesh)
        mesh = None
        if config.mesh:
            import jax
            from facenet_tpu.config import value_or
            from facenet_tpu.parallel import mesh as mesh_mod
            n_data = int(value_or(config.mesh.data, jax.device_count()))
            if n_data > 1:
                mesh = mesh_mod.create_mesh(data=n_data, model=1)

        self.embeddings, self.labels = evaluate_embeddings(
            forward_fn, batches, renormalize=renormalize, mesh=mesh)
        logger.info(str(self))

    def __repr__(self):
        return ('{}\n'.format(self.__class__.__name__) +
                'model: {}\n'.format(self.config.model.path) +
                'embedding size: {}\n'.format(self.embeddings.shape))
