"""Fused inference fast path for Inception-ResNet-v2.

Same two exact transformations as the v1 fast path (models/irv1_fast.py,
where the shared helpers live): BatchNorm folded into conv biases (the
reference's export-time fold, tfutils.py:238-258) and parallel 1x1
branch-head convs concatenated into single wide convs — Block35 3x32->96,
Block17 192+128->320, Block8 2x192->384, Mixed_5a 96+48+64->208,
Mixed_7a 3x256->768. Equivalence vs the Flax model is asserted in
tests/test_irv2_fast.py; `FaceNet` serves IRv2 bundles through this path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from facenet_tpu.models.inception_resnet_v2 import check_input_config
from facenet_tpu.models.irv1_fast import (_concat_folded, _conv, _crelu,
                                          _fold)
from facenet_tpu.ops.preprocessing import image_processing


def build_fast_params(variables, config=None, dtype=jnp.bfloat16):
    """Fold + fuse a trained IRv2 variable tree for `fast_forward`."""
    p, s = variables['params'], variables['batch_stats']
    cfg = check_input_config(config)
    out = {}

    def conv(name, block=None):
        tp = p[block][name] if block else p[name]
        ts = s[block][name] if block else s[name]
        k, b = _fold(tp, ts)
        return {'k': k, 'b': b}

    def fused_heads(names, block=None):
        parts = [_fold(p[block][n] if block else p[n],
                       s[block][n] if block else s[n]) for n in names]
        k, b = _concat_folded(parts)
        return {'k': k, 'b': b}

    def up(block):
        return {'k': np.asarray(p[block]['Conv2d_1x1']['kernel'], np.float32),
                'b': np.asarray(p[block]['Conv2d_1x1']['bias'], np.float32)}

    for name in ('Conv2d_1a_3x3', 'Conv2d_2a_3x3', 'Conv2d_2b_3x3',
                 'Conv2d_3b_1x1', 'Conv2d_4a_3x3', 'Conv2d_7b_1x1'):
        out[name] = conv(name)

    out['Mixed_5a'] = {
        'heads': fused_heads(['Mixed_5a.Branch_0.Conv2d_1x1',
                              'Mixed_5a.Branch_1.Conv2d_0a_1x1',
                              'Mixed_5a.Branch_2.Conv2d_0a_1x1']),
        'b1b': conv('Mixed_5a.Branch_1.Conv2d_0b_5x5'),
        'b2b': conv('Mixed_5a.Branch_2.Conv2d_0b_3x3'),
        'b2c': conv('Mixed_5a.Branch_2.Conv2d_0c_3x3'),
        'b3': conv('Mixed_5a.Branch_3.Conv2d_0b_1x1'),
    }

    repeat = [int(r) for r in cfg.repeat]
    for i in range(repeat[0]):
        blk = f'Repeat.block35_{i + 1}'
        out[blk] = {
            'heads': fused_heads(['Branch_0.Conv2d_1x1',
                                  'Branch_1.Conv2d_0a_1x1',
                                  'Branch_2.Conv2d_0a_1x1'], blk),
            'b1b': conv('Branch_1.Conv2d_0b_3x3', blk),
            'b2b': conv('Branch_2.Conv2d_0b_3x3', blk),
            'b2c': conv('Branch_2.Conv2d_0c_3x3', blk),
            'up': up(blk),
        }

    out['Mixed_6a'] = {
        'b0': conv('Mixed_6a.Branch_0.Conv2d_1a_3x3'),
        'b1a': conv('Mixed_6a.Branch_1.Conv2d_0a_1x1'),
        'b1b': conv('Mixed_6a.Branch_1.Conv2d_0b_3x3'),
        'b1c': conv('Mixed_6a.Branch_1.Conv2d_1a_3x3'),
    }

    for i in range(repeat[1]):
        blk = f'Repeat_1.block17_{i + 1}'
        out[blk] = {
            'heads': fused_heads(['Branch_0.Conv2d_1x1',
                                  'Branch_1.Conv2d_0a_1x1'], blk),
            'b1b': conv('Branch_1.Conv2d_0b_1x7', blk),
            'b1c': conv('Branch_1.Conv2d_0c_7x1', blk),
            'up': up(blk),
        }

    out['Mixed_7a'] = {
        'heads': fused_heads(['Mixed_7a.Branch_0.Conv2d_0a_1x1',
                              'Mixed_7a.Branch_1.Conv2d_0a_1x1',
                              'Mixed_7a.Branch_2.Conv2d_0a_1x1']),
        'b0b': conv('Mixed_7a.Branch_0.Conv2d_1a_3x3'),
        'b1b': conv('Mixed_7a.Branch_1.Conv2d_1a_3x3'),
        'b2b': conv('Mixed_7a.Branch_2.Conv2d_0b_3x3'),
        'b2c': conv('Mixed_7a.Branch_2.Conv2d_1a_3x3'),
    }

    for i in range(repeat[2] + 1):
        blk = 'Block8' if i == repeat[2] else f'Repeat_2.block8_{i + 1}'
        out[blk] = {
            'heads': fused_heads(['Branch_0.Conv2d_1x1',
                                  'Branch_1.Conv2d_0a_1x1'], blk),
            'b1b': conv('Branch_1.Conv2d_0b_1x3', blk),
            'b1c': conv('Branch_1.Conv2d_0c_3x1', blk),
            'up': up(blk),
        }

    from facenet_tpu.models.inception_resnet_v1 import BN_EPS
    kb = np.asarray(p['Bottleneck']['kernel'], np.float32)
    beta = np.asarray(p['Bottleneck.bn']['bias'], np.float32)
    mean = np.asarray(s['Bottleneck.bn']['mean'], np.float32)
    var = np.asarray(s['Bottleneck.bn']['var'], np.float32)
    sc = 1.0 / np.sqrt(var + BN_EPS)
    out['Bottleneck'] = {'k': kb * sc, 'b': beta - mean * sc}

    out = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), out)
    return out, cfg


def _maxpool(x):
    return jax.lax.reduce_window(
        x, jnp.finfo(x.dtype).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')


def fast_forward(params, cfg, images, image_size=160, normalization=0,
                 dtype=jnp.bfloat16, normalize=True):
    """Fused IRv2 inference forward (same contract as model(train=False))."""
    x = image_processing(images, image_size, normalization, dtype=dtype)

    x = _crelu(x, params['Conv2d_1a_3x3'], 2, 'VALID')
    x = _crelu(x, params['Conv2d_2a_3x3'], 1, 'VALID')
    x = _crelu(x, params['Conv2d_2b_3x3'], 1, 'SAME')
    x = _maxpool(x)
    x = _crelu(x, params['Conv2d_3b_1x1'], 1, 'VALID')
    x = _crelu(x, params['Conv2d_4a_3x3'], 1, 'VALID')
    x = _maxpool(x)

    # Mixed_5a: fused 1x1 heads + 5x5/3x3 tails + avg-pool branch
    w = params['Mixed_5a']
    b5 = [list(v) for v in cfg.mixed_5a.branch]
    c0, c1 = int(b5[0][0]), int(b5[1][0])
    heads = _crelu(x, w['heads'])
    t0 = heads[..., :c0]
    t1 = _crelu(heads[..., c0:c0 + c1], w['b1b'], 1, 'SAME')
    t2 = _crelu(_crelu(heads[..., c0 + c1:], w['b2b'], 1, 'SAME'),
                w['b2c'], 1, 'SAME')
    # flax nn.avg_pool divides by the full window (count_include_pad)
    tp = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, 3, 3, 1), (1, 1, 1, 1), 'SAME') / jnp.asarray(9.0, x.dtype)
    t3 = _crelu(tp, w['b3'])
    x = jnp.concatenate([t0, t1, t2, t3], axis=3)

    s35 = jnp.asarray(0.17, dtype)
    repeat = [int(r) for r in cfg.repeat]
    for i in range(repeat[0]):
        w = params[f'Repeat.block35_{i + 1}']
        heads = _crelu(x, w['heads'])
        t0, t1, t2 = heads[..., :32], heads[..., 32:64], heads[..., 64:]
        t1 = _crelu(t1, w['b1b'])
        t2 = _crelu(_crelu(t2, w['b2b']), w['b2c'])
        upv = _conv(jnp.concatenate([t0, t1, t2], axis=3), w['up'])
        x = jax.nn.relu(x + s35 * upv)

    w = params['Mixed_6a']
    t0 = _crelu(x, w['b0'], 2, 'VALID')
    t1 = _crelu(_crelu(_crelu(x, w['b1a']), w['b1b']), w['b1c'], 2, 'VALID')
    x = jnp.concatenate([t0, t1, _maxpool(x)], axis=3)

    s17 = jnp.asarray(0.10, dtype)
    for i in range(repeat[1]):
        w = params[f'Repeat_1.block17_{i + 1}']
        heads = _crelu(x, w['heads'])
        t0, t1 = heads[..., :192], heads[..., 192:]
        t1 = _crelu(_crelu(t1, w['b1b']), w['b1c'])
        upv = _conv(jnp.concatenate([t0, t1], axis=3), w['up'])
        x = jax.nn.relu(x + s17 * upv)

    w = params['Mixed_7a']
    b7 = [list(v) for v in cfg.mixed_7a.branch]
    c0, c1 = int(b7[0][0]), int(b7[1][0])
    heads = _crelu(x, w['heads'])
    t0 = _crelu(heads[..., :c0], w['b0b'], 2, 'VALID')
    t1 = _crelu(heads[..., c0:c0 + c1], w['b1b'], 2, 'VALID')
    t2 = _crelu(_crelu(heads[..., c0 + c1:], w['b2b'], 1, 'SAME'),
                w['b2c'], 2, 'VALID')
    x = jnp.concatenate([t0, t1, t2, _maxpool(x)], axis=3)

    for i in range(repeat[2] + 1):
        final = i == repeat[2]
        w = params['Block8' if final else f'Repeat_2.block8_{i + 1}']
        heads = _crelu(x, w['heads'])
        t0, t1 = heads[..., :192], heads[..., 192:]
        t1 = _crelu(_crelu(t1, w['b1b']), w['b1c'])
        upv = _conv(jnp.concatenate([t0, t1], axis=3), w['up'])
        x = x + jnp.asarray(1.0 if final else 0.2, dtype) * upv
        if not final:
            x = jax.nn.relu(x)

    x = _crelu(x, params['Conv2d_7b_1x1'])

    x = jnp.mean(x, axis=(1, 2))          # dropout is identity at inference
    w = params['Bottleneck']
    x = (jnp.dot(x, w['k'], preferred_element_type=jnp.float32) +
         w['b'].astype(jnp.float32))

    if normalize:
        norm = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(x), axis=1, keepdims=True), 1e-10))
        x = x / norm
    return x


class FastEmbedderV2:
    """Jitted fused IRv2 forward bound to one trained parameter set."""

    def __init__(self, variables, config=None, image_size=160,
                 normalization=0, dtype=jnp.bfloat16, normalize=True,
                 quantize=None, calib_images=None):
        self.params, self.cfg = build_fast_params(variables, config, dtype)
        self.image_size = int(image_size)
        self.normalization = int(normalization)
        self.normalize = bool(normalize)
        if quantize:
            # same int8 entries + _conv dispatch as the IRv1 path (the
            # conv helpers are shared); see models/quantize.py
            if quantize != 'int8':
                raise ValueError(f'unknown quantize mode {quantize!r}')
            if calib_images is None:
                raise ValueError('quantize="int8" needs calib_images '
                                 '(a representative uint8 batch)')
            from facenet_tpu.models.quantize import quantize_fast_params
            self.params = quantize_fast_params(
                self.params, self.cfg, calib_images, self.image_size,
                self.normalization, forward=fast_forward)
        cfg = self.cfg

        def fwd(params, images):
            return fast_forward(params, cfg, images, self.image_size,
                                self.normalization, dtype,
                                normalize=self.normalize)
        self._fwd = jax.jit(fwd)

    def __call__(self, images):
        return self._fwd(self.params, images)
