"""Device mesh and sharding helpers.

The reference's only parallelism is single-host data parallelism via
tf.distribute.MirroredStrategy (SURVEY.md §2.8,
reference apps/train_softmax_tf2_gpus.py:49-51). The TPU-native equivalent is
a `jax.sharding.Mesh` over all chips with named axes:

  'data'  — batch dimension sharding (DP); XLA emits gradient all-reduces
            over ICI automatically.
  'model' — optional tensor parallelism for the wide softmax head (8.6k-10.6k
            identity classes): the logits kernel is sharded on its output
            dimension so each chip holds C/model columns and computes its
            logits shard; the softmax normalizer becomes an XLA all-reduce.

Multi-host: call `jax.distributed.initialize()` before `create_mesh` and the
same code spans slices (DCN between hosts, ICI within).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def create_mesh(data=None, model=1, devices=None):
    """Build a (data, model) mesh over the available devices.

    :param data: number of data-parallel shards (default: all_devices / model)
    :param model: number of model-parallel shards for the logits head
    :param devices: explicit device list (default jax.devices())
    """
    if devices is None:
        devices = jax.devices()

    model = int(model or 1)
    n = len(devices)
    if data is None or not data:
        data = n // model
    data = int(data)

    if data * model > n:
        raise ValueError(
            f'mesh {data}x{model} needs {data * model} devices, have {n}')

    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh):
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def logits_kernel_sharding(mesh):
    """[D, C] kernel of the classifier head: columns over the model axis."""
    return NamedSharding(mesh, P(None, MODEL_AXIS))


def logits_bias_sharding(mesh):
    return NamedSharding(mesh, P(MODEL_AXIS))


def shard_batch(mesh, batch):
    """Device-put a host batch with the batch dimension sharded over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def place_global(x, sharding):
    """Place a host array every process holds IN FULL onto a (possibly
    multi-process) sharding.

    Single-process this is jax.device_put. Multi-host, device_put cannot
    address remote devices, so the global array is assembled from each
    process's addressable shards via make_array_from_callback — each
    process slices its own devices' pieces out of the (identical) host
    value. Used for params / optimizer state, which every process
    computes identically from the same seed.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def distribute_batch(mesh, local_batch, sharding=None):
    """Form the global sharded batch from each process's LOCAL rows.

    Single-process: plain device_put with the batch dim sharded over
    'data'. Multi-host: every process loads only its slice of the global
    batch (the standard JAX data-loading pattern) and
    make_array_from_process_local_data assembles the global array —
    global batch size = local batch size x process_count.
    """
    sharding = sharding or batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch))


def allgather_host_varlen(x):
    """Allgather a 1-D host array of per-process-varying length; returns
    the concatenation (process order) on every process.

    jax.experimental.multihost_utils.process_allgather needs equal shapes,
    so lengths are agreed first and arrays padded to the max.
    """
    from jax.experimental import multihost_utils

    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    lengths = np.asarray(
        multihost_utils.process_allgather(np.int64(x.shape[0])))
    m = int(lengths.max())
    padded = np.zeros((m,), x.dtype)
    padded[:x.shape[0]] = x
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return np.concatenate(
        [gathered[p, :int(lengths[p])] for p in range(len(lengths))])


def param_shardings(mesh, params):
    """Sharding tree for a param pytree: logits head sharded over 'model',
    everything else replicated (the 23.5M-param backbone fits every chip)."""

    def spec_for(path, leaf):
        names = [str(getattr(p, 'key', getattr(p, 'name', ''))) for p in path]
        if 'logits' in names:
            name = names[-1]
            if name == 'kernel' and leaf.ndim == 2:
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            if name == 'bias' and leaf.ndim == 1:
                return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
