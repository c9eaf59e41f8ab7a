"""Post-training int8 quantization of the fused serving path.

v5e's MXU runs int8 x int8 -> int32 at ~2x its bf16 rate, so a
quantized serving forward can beat the bf16 fast path wherever the
network is MXU-bound. This module turns a `build_fast_params` tree
(models/irv1_fast.py — BN already folded, branch heads already fused)
into a tree whose conv entries carry int8 kernels plus the scales a
quantized `_conv` needs:

  {'kq': int8 [kh,kw,ic,oc],   # symmetric per-output-channel weights
   'ws': f32 [oc],             # weight scale (absmax/127 per channel)
   'xs': f32 [],               # input scale from calibration (absmax/127)
   'b':  f32 [oc]}             # folded bias, applied after dequant

Calibration is one eager (un-jitted) forward over a representative
uint8 batch: every conv input's absolute maximum is recorded by tagging
each conv dict and letting `irv1_fast._conv` report into a collector
(see `_Calibration`). Per-tensor activation scales + per-channel weight
scales are the standard PTQ recipe (Jacob et al. 2018,
arXiv:1712.05877). The bottleneck dense stays bf16/f32 — the embedding
head sets final quality and is a negligible share of the FLOPs.

The reference has no quantization story (frozen f32 TF graphs,
reference facenet.py:60-76); this is TPU-native headroom on top of
parity. Serving integration: `FaceNet(..., quantize='int8')` /
`FastEmbedder(..., quantize='int8')`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _walk_convs(tree, path=()):
    """Yield (path_tuple, conv_dict) for every {'k','b'} leaf dict."""
    if isinstance(tree, dict):
        if 'k' in tree and 'b' in tree:
            yield path, tree
            return
        for name, sub in tree.items():
            yield from _walk_convs(sub, path + (name,))


class _Calibration:
    """Collector the instrumented `_conv` reports input absmax into."""

    active = None          # the running _Calibration, if any

    def __init__(self):
        self.absmax = {}

    def record(self, tag, x):
        v = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        self.absmax[tag] = max(self.absmax.get(tag, 0.0), v)

    def __enter__(self):
        _Calibration.active = self
        return self

    def __exit__(self, *exc):
        _Calibration.active = None


def calibrate(params, cfg, images, image_size=160, normalization=0,
              forward=None):
    """Per-conv input absmax over one representative batch.

    Runs the forward EAGERLY (outside jit) so the tag hook in
    `irv1_fast._conv` sees concrete values. ~seconds on CPU for a
    64-image batch with the full IRv1.
    """
    from facenet_tpu.models import irv1_fast

    forward = forward or irv1_fast.fast_forward
    tagged = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for path, w in _walk_convs(tagged):
        w['tag'] = '/'.join(path)
    with _Calibration() as calib:
        forward(tagged, cfg, images, image_size, normalization)
    for _, w in _walk_convs(tagged):
        del w['tag']
    return calib.absmax


def quantize_fast_params(params, cfg, calib_images, image_size=160,
                         normalization=0, skip=('Bottleneck',),
                         forward=None):
    """Fast-path params -> int8-serving params (see module docstring).

    :param calib_images: uint8 [N, H, W, 3] batch for activation ranges
        (64-256 representative images; more sharpens per-tensor scales)
    :param skip: top-level entries kept in bf16 (the embedding head by
        default; add e.g. 'Conv2d_1a_s2d' to keep the stem float)
    """
    absmax = calibrate(params, cfg, calib_images, image_size,
                       normalization, forward=forward)

    def q(path, w):
        tag = '/'.join(path)
        if path[0] in skip or tag not in absmax or absmax[tag] == 0.0:
            return dict(w)
        k = np.asarray(w['k'], np.float32)
        wmax = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12)  # [oc]
        ws = (wmax / 127.0).astype(np.float32)
        kq = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
        return {
            'kq': jnp.asarray(kq),
            'ws': jnp.asarray(ws),
            'xs': jnp.float32(absmax[tag] / 127.0),
            'b': jnp.asarray(np.asarray(w['b'], np.float32)),
        }

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            if 'k' in tree and 'b' in tree:
                return q(path, tree)
            return {n: rebuild(s, path + (n,)) for n, s in tree.items()}
        return tree

    return rebuild(params)
