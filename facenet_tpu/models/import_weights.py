"""Reference-format (h5) weight import/export for the embedding net.

The reference exports trained models to an h5 whose schema is one pair of
datasets per conv/dense unit — ``<tf_scope>/weights`` + ``<tf_scope>/biases``
— with BatchNorm already FOLDED into them (fold math at reference
tfutils.py:238-258: ``scale = 1/sqrt(var + eps)``, ``weights *= scale``,
``biases = beta - mean*scale``; schema writer tfutils.py:225-264). The tf
scopes come from the upstream tf-slim InceptionResnetV1 graph (the
"Pre-trained models" table in the reference README), e.g.::

    InceptionResnetV1/Conv2d_1a_3x3/weights
    InceptionResnetV1/Repeat/block35_1/Branch_0/Conv2d_1x1/weights
    InceptionResnetV1/Mixed_6a/Branch_1/Conv2d_1a_3x3/weights
    InceptionResnetV1/Bottleneck/weights

Our flax module names mirror those scopes with '.' where tf uses '/'
(models/inception_resnet_v1.py), so the mapping is mechanical: normalize
both sides to '/'-separated paths and match. No hand-written name table —
the walker discovers every unit from the param pytree itself, so any
topology the Config can express (TINY test nets included) round-trips.

Conv kernels are HWIO in both worlds and dense kernels are [in, out] in
both, so values copy through unchanged.

Import target: since the h5 weights are folded, the flax variables are
reconstructed with *identity* BatchNorm statistics (mean=0, var=1-eps, so
``rsqrt(var+eps) == 1`` exactly) and the folded bias in the BN beta. That
reproduces inference-mode behavior bit-for-bit; train-mode fine-tuning
from imported weights re-estimates batch statistics from data (the fold
discards the raw mean/var, in the reference's format as in ours).

One-command path from a public checkpoint to serving::

    # reference side (has TF): python -m facenet.apps.export_h5 ...
    vars_ = import_h5_weights('20180402-114759.h5')
    net = FaceNet(...)/FastEmbedder(vars_)        # or build_fast_params
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from facenet_tpu import h5utils
from facenet_tpu.models.inception_resnet_v1 import BN_EPS

DEFAULT_SCOPE = 'InceptionResnetV1'


def _is_conv_bn(node):
    return isinstance(node, dict) and 'conv' in node and 'bn' in node


def _is_plain_conv(node):
    return isinstance(node, dict) and 'kernel' in node and 'bias' in node


def iter_units(params):
    """Yield (scope, kind, path) for every importable unit in a backbone
    param tree.

    scope: '/'-separated tf-style scope (flax '.' separators expanded);
    kind: 'conv_bn' (ConvBnRelu), 'conv' (plain conv with bias) or
          'dense_bn' (Bottleneck dense + its sibling '<name>.bn');
    path: tuple of keys from the tree root to the unit's module dict.
    """
    def walk(node, path):
        if not isinstance(node, dict):
            return
        for key, child in sorted(node.items()):
            sub = path + (key,)
            if _is_conv_bn(child):
                yield '/'.join(p.replace('.', '/') for p in sub), 'conv_bn', sub
            elif _is_plain_conv(child):
                yield '/'.join(p.replace('.', '/') for p in sub), 'conv', sub
            elif isinstance(child, dict) and 'kernel' in child and (
                    key + '.bn') in node:
                yield '/'.join(p.replace('.', '/') for p in sub), 'dense_bn', sub
            elif key.endswith('.bn'):
                continue   # consumed by its dense sibling
            else:
                yield from walk(child, sub)

    yield from walk(params, ())


def _get(tree, path):
    for key in path:
        tree = tree[key]
    return tree


def _fold(kernel, beta, mean, var):
    scale = 1.0 / np.sqrt(np.asarray(var, np.float32) + BN_EPS)
    return (np.asarray(kernel, np.float32) * scale,
            np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * scale)


def export_ref_h5(variables, h5file, scope=DEFAULT_SCOPE):
    """Write backbone variables to the reference's folded h5 weight schema.

    The inverse of `import_h5_weights`; also the fixture generator for the
    round-trip test (a synthetic ref-schema h5 without needing TF).

    :param variables: {'params', 'batch_stats'} of the BACKBONE.
    """
    params = variables['params']
    stats = variables['batch_stats']
    h5file = Path(h5file)

    for scope_path, kind, path in iter_units(params):
        node = _get(params, path)
        if kind == 'conv_bn':
            snode = _get(stats, path)
            w, b = _fold(node['conv']['kernel'], node['bn']['bias'],
                         snode['bn']['mean'], snode['bn']['var'])
        elif kind == 'dense_bn':
            bn_path = path[:-1] + (path[-1] + '.bn',)
            bn = _get(params, bn_path)
            sbn = _get(stats, bn_path)
            w, b = _fold(node['kernel'], bn['bias'], sbn['mean'], sbn['var'])
        else:
            w = np.asarray(node['kernel'], np.float32)
            b = np.asarray(node['bias'], np.float32)
        h5utils.write(h5file, f'{scope}/{scope_path}/weights', w)
        h5utils.write(h5file, f'{scope}/{scope_path}/biases', b)
    return h5file


def _read_pairs(h5file):
    """All (scope, weights, biases) pairs in the file, scope prefix stripped."""
    names = [d['name'] for d in h5utils.visititems(h5file)
             if d['name'].endswith('/weights')]
    pairs = {}
    for name in names:
        scope_path = name[:-len('/weights')]
        # A real export_h5 file carries BOTH a top-level 'checkpoint/'
        # group (input/output/config tensors, ref tfutils.py:170-184) and
        # per-unit '<path>/checkpoint/input|output' activation dumps
        # (ref tfutils.py:186-195) alongside the weight pairs — skip any
        # dataset under a checkpoint group at either level.
        if 'checkpoint' in scope_path.split('/'):
            continue
        pairs[scope_path] = (h5utils.read(h5file, name),
                             h5utils.read(h5file, scope_path + '/biases'))
    if not pairs:
        raise ValueError(f'no <scope>/weights datasets in {h5file}')
    # strip the common model scope (e.g. InceptionResnetV1/)
    roots = {p.split('/', 1)[0] for p in pairs}
    if len(roots) == 1 and all('/' in p for p in pairs):
        pairs = {p.split('/', 1)[1]: v for p, v in pairs.items()}
    return pairs


def import_h5_weights(h5file, config=None, image_size=160, normalization=0):
    """Reference-schema h5 -> flax variables for `InceptionResnetV1`.

    Returns {'params', 'batch_stats'} of the backbone, ready for
    `model.apply` (inference), `irv1_fast.build_fast_params`, or
    `FastEmbedder`. Raises if any h5 unit has no model target or any model
    unit is missing from the h5 (a topology/config mismatch should fail
    loudly, not serve a half-initialized net).
    """
    import jax
    from flax.core import unfreeze

    from facenet_tpu.config import Config
    from facenet_tpu.models.inception_resnet_v1 import create_model

    model = create_model(config, image_cfg=Config(
        {'size': image_size, 'normalization': normalization}))
    dummy = np.zeros((1, image_size, image_size, 3), np.uint8)
    variables = unfreeze(jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, train=False)))

    params = jax.tree_util.tree_map(
        lambda leaf: np.zeros(leaf.shape, leaf.dtype), variables['params'])
    stats = jax.tree_util.tree_map(
        lambda leaf: np.zeros(leaf.shape, leaf.dtype),
        variables['batch_stats'])

    pairs = _read_pairs(h5file)
    unused = set(pairs)

    for scope_path, kind, path in iter_units(params):
        if scope_path not in pairs:
            raise KeyError(
                f'model unit {scope_path!r} ({kind}) missing from {h5file}')
        w, b = pairs[scope_path]
        unused.discard(scope_path)
        if kind == 'conv_bn':
            node = _get(params, path)
            node['conv']['kernel'] = np.asarray(w, np.float32).reshape(
                node['conv']['kernel'].shape)
            node['bn']['bias'] = np.asarray(b, np.float32).reshape(
                node['bn']['bias'].shape)
            snode = _get(stats, path)
            snode['bn']['mean'] = np.zeros_like(snode['bn']['mean'])
            snode['bn']['var'] = np.full_like(snode['bn']['var'], 1.0 - BN_EPS)
        elif kind == 'dense_bn':
            node = _get(params, path)
            node['kernel'] = np.asarray(w, np.float32).reshape(
                node['kernel'].shape)
            bn_path = path[:-1] + (path[-1] + '.bn',)
            bn = _get(params, bn_path)
            bn['bias'] = np.asarray(b, np.float32).reshape(bn['bias'].shape)
            sbn = _get(stats, bn_path)
            sbn['mean'] = np.zeros_like(sbn['mean'])
            sbn['var'] = np.full_like(sbn['var'], 1.0 - BN_EPS)
        else:
            node = _get(params, path)
            node['kernel'] = np.asarray(w, np.float32).reshape(
                node['kernel'].shape)
            node['bias'] = np.asarray(b, np.float32).reshape(
                node['bias'].shape)

    if unused:
        raise KeyError(f'h5 weight units with no model target: '
                       f'{sorted(unused)[:5]}{"..." if len(unused) > 5 else ""}')

    return {'params': params, 'batch_stats': stats}
