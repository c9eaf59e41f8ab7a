"""Import pretrained MTCNN weights into the Flax cascade.

The reference gets its trained P/R/O-Net weights from the external PyPI
`mtcnn` package (reference detectors/face_detector.py:63-66); the
davidsandberg upstream ships the same Caffe-trained weights as
`det1.npy / det2.npy / det3.npy` dict-of-dicts:

    {'conv1': {'weights': [h, w, in, out], 'biases': [out]},
     'PReLU1': {'alpha': [C]},
     ...,
     'conv4-1': ...cls head..., 'conv4-2': ...reg head...}

This module maps that layout onto facenet_tpu.detectors.mtcnn.networks
params so a user of the reference can carry their detector weights over:

    params = load_davidsandberg_weights('/path/with/det1-3.npy')
    det = MTCNN(image_shape=(480, 640), params=params)

Caveats (documented, not hidden):
  * FC layers after flatten assume NHWC flatten order; pass
    fc_order='nchw' to permute weights exported from a channels-first
    flatten.
  * The original davidsandberg runtime feeds TRANSPOSED (W, H) images into
    the nets (its detect_face.py transposes in and swaps coordinates out).
    If your weight files expect that orientation, pass transpose=True:
    conv kernels are spatially transposed, FC flatten rows are permuted
    (h<->w), box-regression channels swap x/y pairs, and the landmark
    x-block/y-block swap — a mathematically exact conversion to
    upright-image inputs (proven by the equivalence test in
    tests/test_mtcnn_weights.py). If detections come out with swapped
    axes, flip this flag.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _norm_keys(d):
    return {str(k).lower(): v for k, v in d.items()}


def _conv(entry, transpose=False, out_perm=None):
    w = np.asarray(entry['weights'], np.float32)
    b = np.asarray(entry['biases'], np.float32)
    if w.ndim != 4:
        raise ValueError(f'conv weights must be [h,w,in,out], got {w.shape}')
    if transpose:
        w = w.transpose(1, 0, 2, 3)         # swap kernel spatial axes
    if out_perm is not None:
        w = w[..., out_perm]
        b = b[out_perm]
    return {'kernel': w, 'bias': b}


def _dense(entry, feature_hwc=None, fc_order='nhwc', transpose=False,
           out_perm=None):
    w = np.asarray(entry['weights'], np.float32)
    b = np.asarray(entry['biases'], np.float32)
    if w.ndim != 2:
        raise ValueError(f'dense weights must be [in, out], got {w.shape}')
    if feature_hwc is not None and fc_order == 'nchw':
        # weights were built for a (C, H, W) flatten; our nets flatten NHWC
        h, wd, c = feature_hwc
        w = (w.reshape(c, h, wd, -1).transpose(1, 2, 0, 3)
             .reshape(h * wd * c, -1))
    if transpose and feature_hwc is not None:
        # upstream fed transposed feature maps: its flatten order is
        # (w, h, c) of our upright map — permute the input rows
        h, wd, c = feature_hwc
        w = (w.reshape(wd, h, c, -1).transpose(1, 0, 2, 3)
             .reshape(h * wd * c, -1))
    if out_perm is not None:
        w = w[:, out_perm]
        b = b[out_perm]
    return {'kernel': w, 'bias': b}


# output-channel permutations for transpose=True: box regression swaps
# (dx1, dy1, dx2, dy2) -> (dy1, dx1, dy2, dx2); landmarks swap the x-block
# and y-block ([x1..x5, y1..y5] layout)
_REG_PERM = [1, 0, 3, 2]
_LMK_PERM = list(range(5, 10)) + list(range(0, 5))


def _prelu(entry):
    return {'alpha': np.asarray(entry['alpha'], np.float32).reshape(-1)}


def pnet_params(data, fc_order='nhwc', transpose=False):
    d = _norm_keys(data)
    t = transpose
    return {
        'conv1': _conv(d['conv1'], transpose=t),
        'prelu1': _prelu(d['prelu1']),
        'conv2': _conv(d['conv2'], transpose=t),
        'prelu2': _prelu(d['prelu2']),
        'conv3': _conv(d['conv3'], transpose=t),
        'prelu3': _prelu(d['prelu3']),
        'cls': _conv(d['conv4-1'], transpose=t),
        'reg': _conv(d['conv4-2'], transpose=t,
                     out_perm=_REG_PERM if t else None),
    }


def rnet_params(data, fc_order='nhwc', transpose=False):
    d = _norm_keys(data)
    t = transpose
    return {
        'conv1': _conv(d['conv1'], transpose=t),
        'prelu1': _prelu(d['prelu1']),
        'conv2': _conv(d['conv2'], transpose=t),
        'prelu2': _prelu(d['prelu2']),
        'conv3': _conv(d['conv3'], transpose=t),
        'prelu3': _prelu(d['prelu3']),
        # R-Net flatten feature map is [3, 3, 64]
        'fc1': _dense(d['conv4'], feature_hwc=(3, 3, 64), fc_order=fc_order,
                      transpose=t),
        'prelu4': _prelu(d['prelu4']),
        'cls': _dense(d['conv5-1']),
        'reg': _dense(d['conv5-2'], out_perm=_REG_PERM if t else None),
    }


def onet_params(data, fc_order='nhwc', transpose=False):
    d = _norm_keys(data)
    t = transpose
    return {
        'conv1': _conv(d['conv1'], transpose=t),
        'prelu1': _prelu(d['prelu1']),
        'conv2': _conv(d['conv2'], transpose=t),
        'prelu2': _prelu(d['prelu2']),
        'conv3': _conv(d['conv3'], transpose=t),
        'prelu3': _prelu(d['prelu3']),
        'conv4': _conv(d['conv4'], transpose=t),
        'prelu4': _prelu(d['prelu4']),
        # O-Net flatten feature map is [3, 3, 128]
        'fc1': _dense(d['conv5'], feature_hwc=(3, 3, 128), fc_order=fc_order,
                      transpose=t),
        'prelu5': _prelu(d['prelu5']),
        'cls': _dense(d['conv6-1']),
        'reg': _dense(d['conv6-2'], out_perm=_REG_PERM if t else None),
        'landmarks': _dense(d['conv6-3'],
                            out_perm=_LMK_PERM if t else None),
    }


def load_davidsandberg_weights(path, fc_order='nhwc', transpose=False):
    """Load det1/det2/det3.npy from a directory (or explicit tuple of paths).

    :param transpose: convert weights that expect transposed (W, H) inputs
        (the upstream runtime's convention) to upright-image inputs.
    :returns: params pytree for MTCNN(params=...) — keys pnet/rnet/onet.
    """
    if isinstance(path, (tuple, list)):
        p1, p2, p3 = (Path(str(p)).expanduser() for p in path)
    else:
        base = Path(str(path)).expanduser()
        p1, p2, p3 = base / 'det1.npy', base / 'det2.npy', base / 'det3.npy'

    def load(p):
        # the original davidsandberg files are Python-2 pickles; latin1 is
        # the standard decode for them and is harmless for py3 pickles
        data = np.load(p, allow_pickle=True, encoding='latin1')
        return data.item() if hasattr(data, 'item') else dict(data)

    return {
        'pnet': pnet_params(load(p1), fc_order=fc_order, transpose=transpose),
        'rnet': rnet_params(load(p2), fc_order=fc_order, transpose=transpose),
        'onet': onet_params(load(p3), fc_order=fc_order, transpose=transpose),
    }


def validate_params(params, mtcnn):
    """Shape-check imported params against a freshly initialized cascade.

    Raises ValueError naming every mismatched leaf (the error you want at
    import time, not at first jit).
    """
    import jax
    ref = mtcnn.init_params(seed=0)
    errors = []

    ref_leaves = jax.tree_util.tree_leaves_with_path(ref)
    got = params

    def lookup(tree, path):
        for p in path:
            key = getattr(p, 'key', getattr(p, 'name', None))
            try:
                tree = tree[key]
            except (KeyError, TypeError):
                return None
        return tree

    for path, leaf in ref_leaves:
        val = lookup(got, path)
        name = '/'.join(str(getattr(p, 'key', p)) for p in path)
        if val is None:
            errors.append(f'missing: {name}')
        elif tuple(np.shape(val)) != tuple(leaf.shape):
            errors.append(
                f'shape mismatch at {name}: got {np.shape(val)}, '
                f'want {tuple(leaf.shape)}')
    if errors:
        raise ValueError('imported MTCNN params invalid:\n  ' +
                         '\n  '.join(errors))
    return params
