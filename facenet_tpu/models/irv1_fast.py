"""Fused inference fast path for Inception-ResNet-v1.

Serving-time reformulation of `models/inception_resnet_v1.py` (the
training source of truth). Two exact transformations, applied once per
parameter set:

  1. **BN folding** — Conv(no bias) + BatchNorm(center-only) collapses to
     Conv + bias:  W' = W / sqrt(var + eps),  b = beta - mean / sqrt(var
     + eps). The reference does the same fold when exporting per-layer h5
     weights (reference tfutils.py:238-258); here it feeds the live
     serving path.
  2. **Branch-head fusion** — each inception block applies several 1x1
     convs to the SAME input (three 32-channel heads in Block35, two
     128s in Block17, two 192s in Block8, three 256s in ReductionB).
     Concatenated along the output axis they become ONE conv with 3-6x
     the output width: identical arithmetic, but the MXU sees N=96..768
     instead of N=32..256 lanes, and XLA launches one conv instead of
     2-3.

The result is bit-compatible with `model.apply(..., train=False)` up to
bf16 rounding (tests/test_irv1_fast.py asserts closeness), and is the
path `bench.py` and the serving runtime use. Works for any IRv1 config
(repeats / output size); raises KeyError on a non-IRv1 parameter tree.

MEASURED NEGATIVE (round 3, stem relayout — don't redo): per-stage
attribution (tools/profile_embed.py, chunk=128 bf16, v5e) puts
preprocessing+stem at 1.8 of 3.4 ms/chunk; the 3/32/64-channel stem
tensors pay feature-minor lane padding, so a 4x4-block relayout
(channels = 2x2 position x feature = 128/256 wide, zero padding;
normalization folded into conv1's epilogue) was built and proven exact
(tools/try_block_stem.py). It is SLOWER everywhere (tools/
try_block_stem2.py piecewise, ms/chunk): conv1 s2d 0.47 vs block 0.53 /
shifted-matmul 1.07; conv2ab std 1.32 vs block 1.97 / matmul 4.48; pool
reduce_window 1.51 vs 9-shifted-max 3.16. The fused XLA stem (1.31
ms/chunk for conv1..4b TOTAL) already beats the SUM of its isolated
parts — XLA picks low-channel conv layouts and fusions that the manual
block form forfeits. Flat-view [B,-1] preprocessing reductions are
likewise end-to-end neutral (39.6k vs 39.9k img/s, tunnel noise): the
reduce fuses into the uint8 read either way. Conclusion: the serving
forward is within ~25% of its HBM/MXU bound at 40k img/s single-chip;
remaining headroom is a full VMEM-resident Pallas stem (est. ceiling
~43k img/s end-to-end) whose cost/risk the P-Net record
(detectors/mtcnn/pallas_pnet.py) prices as high.

That Pallas stem was then BUILT and MEASURED (ops/pallas_stem.py,
flat-lane conv1+2a+2b+pool fusion): 0.43x at kernel level and 25.8k vs
38.2k img/s bf16 / 28.7k vs 49.9k int8 at serving level
(tools/try_stem_flat.py, tools/time_stem_serving.py). The stem='xla'
default is final for this design family; see pallas_stem.py's docstring
for the full record.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from facenet_tpu.models.inception_resnet_v1 import BN_EPS, check_input_config
from facenet_tpu.ops.preprocessing import image_processing

_DN = ('NHWC', 'HWIO', 'NHWC')


def _fold(tree_p, tree_s):
    """Fold one ConvBnRelu's BN into (kernel, bias) — both float32."""
    w = np.asarray(tree_p['conv']['kernel'], np.float32)
    beta = np.asarray(tree_p['bn']['bias'], np.float32)
    mean = np.asarray(tree_s['bn']['mean'], np.float32)
    var = np.asarray(tree_s['bn']['var'], np.float32)
    s = 1.0 / np.sqrt(var + BN_EPS)
    return w * s, beta - mean * s


def _concat_folded(parts):
    """Concatenate (kernel, bias) pairs along the output-channel axis."""
    ks = [k for k, _ in parts]
    bs = [b for _, b in parts]
    return np.concatenate(ks, axis=3), np.concatenate(bs, axis=0)


def build_fast_params(variables, config=None, dtype=jnp.bfloat16):
    """Fold + fuse a trained IRv1 variable tree into the fast-path params.

    :param variables: {'params': ..., 'batch_stats': ...} of the BACKBONE
        (as stored by export.save_model)
    :returns: (params pytree of jnp arrays, cfg) for `fast_forward`
    """
    p, s = variables['params'], variables['batch_stats']
    cfg = check_input_config(config)
    out = {}

    def conv(name):
        k, b = _fold(p[name], s[name])
        return {'k': k, 'b': b}

    for name in ('Conv2d_1a_3x3', 'Conv2d_2a_3x3', 'Conv2d_2b_3x3',
                 'Conv2d_3b_1x1', 'Conv2d_4a_3x3', 'Conv2d_4b_3x3'):
        out[name] = conv(name)

    # Space-to-depth rewrite of the stride-2 stem conv: a 3x3/s2 conv on
    # [160, 160, 3] is EXACTLY a 2x2/s1 conv on the 2x2-block-to-channel
    # transform [80, 80, 12] — tap (a, b) plane (dy, dx) reads original
    # offset (2a+dy, 2b+dx), zero where that exceeds the 3x3 support.
    # Stride-1 convs map onto the MXU better than strided ones and the
    # input rows halve (the standard TPU ResNet input trick).
    k1, b1 = _fold(p['Conv2d_1a_3x3'], s['Conv2d_1a_3x3'])
    cin = k1.shape[2]
    k_s2d = np.zeros((2, 2, 4 * cin, k1.shape[3]), np.float32)
    for a in range(2):
        for b_ in range(2):
            for dy in range(2):
                for dx in range(2):
                    ky, kx = 2 * a + dy, 2 * b_ + dx
                    if ky <= 2 and kx <= 2:
                        c0 = (dy * 2 + dx) * cin
                        k_s2d[a, b_, c0:c0 + cin] = k1[ky, kx]
    out['Conv2d_1a_s2d'] = {'k': k_s2d, 'b': b1}

    def fused_heads(block, names):
        k, b = _concat_folded([_fold(p[block][n], s[block][n])
                               for n in names])
        return {'k': k, 'b': b}

    def plain(block, name):
        k, b = _fold(p[block][name], s[block][name])
        return {'k': k, 'b': b}

    for i in range(int(cfg.block35.repeat)):
        blk = f'Repeat.block35_{i + 1}'
        out[blk] = {
            'heads': fused_heads(blk, ['Branch_0.Conv2d_1x1',
                                       'Branch_1.Conv2d_0a_1x1',
                                       'Branch_2.Conv2d_0a_1x1']),
            'b1b': plain(blk, 'Branch_1.Conv2d_0b_3x3'),
            'b2b': plain(blk, 'Branch_2.Conv2d_0b_3x3'),
            'b2c': plain(blk, 'Branch_2.Conv2d_0c_3x3'),
            'up': {'k': np.asarray(p[blk]['Conv2d_1x1']['kernel'], np.float32),
                   'b': np.asarray(p[blk]['Conv2d_1x1']['bias'], np.float32)},
        }

    ra = 'Mixed_6a'
    out[ra] = {
        'b0': plain(ra, 'Branch_0.Conv2d_1a_3x3'),
        'b1a': plain(ra, 'Branch_1.Conv2d_0a_1x1'),
        'b1b': plain(ra, 'Branch_1.Conv2d_0b_3x3'),
        'b1c': plain(ra, 'Branch_1.Conv2d_1a_3x3'),
    }

    for i in range(int(cfg.block17.repeat)):
        blk = f'Repeat_1.block17_{i + 1}'
        out[blk] = {
            'heads': fused_heads(blk, ['Branch_0.Conv2d_1x1',
                                       'Branch_1.Conv2d_0a_1x1']),
            'b1b': plain(blk, 'Branch_1.Conv2d_0b_1x7'),
            'b1c': plain(blk, 'Branch_1.Conv2d_0c_7x1'),
            'up': {'k': np.asarray(p[blk]['Conv2d_1x1']['kernel'], np.float32),
                   'b': np.asarray(p[blk]['Conv2d_1x1']['bias'], np.float32)},
        }

    rb = 'Mixed_7a'
    out[rb] = {
        'heads': fused_heads(rb, ['Branch_0.Conv2d_0a_1x1',
                                  'Branch_1.Conv2d_0a_1x1',
                                  'Branch_2.Conv2d_0a_1x1']),
        'b0b': plain(rb, 'Branch_0.Conv2d_1a_3x3'),
        'b1b': plain(rb, 'Branch_1.Conv2d_1a_3x3'),
        'b2b': plain(rb, 'Branch_2.Conv2d_0b_3x3'),
        'b2c': plain(rb, 'Branch_2.Conv2d_1a_3x3'),
    }

    n8 = int(cfg.block8_1.repeat)
    for i in range(n8 + 1):
        blk = 'Block8' if i == n8 else f'Repeat_2.block8_{i + 1}'
        out[blk] = {
            'heads': fused_heads(blk, ['Branch_0.Conv2d_1x1',
                                       'Branch_1.Conv2d_0a_1x1']),
            'b1b': plain(blk, 'Branch_1.Conv2d_0b_1x3'),
            'b1c': plain(blk, 'Branch_1.Conv2d_0c_3x1'),
            'up': {'k': np.asarray(p[blk]['Conv2d_1x1']['kernel'], np.float32),
                   'b': np.asarray(p[blk]['Conv2d_1x1']['bias'], np.float32)},
        }

    # Bottleneck dense + its BN fold into one biased matmul
    kb = np.asarray(p['Bottleneck']['kernel'], np.float32)
    beta = np.asarray(p['Bottleneck.bn']['bias'], np.float32)
    mean = np.asarray(s['Bottleneck.bn']['mean'], np.float32)
    var = np.asarray(s['Bottleneck.bn']['var'], np.float32)
    sc = 1.0 / np.sqrt(var + BN_EPS)
    out['Bottleneck'] = {'k': kb * sc, 'b': beta - mean * sc}

    out = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), out)
    return out, cfg


def _conv(x, w, stride=1, padding='SAME'):
    if 'kq' in w:
        # int8 serving entry (models/quantize.py): symmetric per-tensor
        # activation scale xs, per-output-channel weight scale ws; the
        # MXU contracts int8 x int8 -> int32 at 2x its bf16 rate and the
        # quantize/dequantize affines fuse into the neighbouring ops.
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / w['xs']),
                      -127.0, 127.0).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, w['kq'], window_strides=(stride, stride), padding=padding,
            dimension_numbers=_DN, preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * (w['ws'] * w['xs']) + w['b']
        return yf.astype(x.dtype)
    if 'tag' in w:
        from facenet_tpu.models.quantize import _Calibration
        if _Calibration.active is not None:
            _Calibration.active.record(w['tag'], x)
    return jax.lax.conv_general_dilated(
        x, w['k'], window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DN) + w['b']


def _crelu(x, w, stride=1, padding='SAME'):
    return jax.nn.relu(_conv(x, w, stride, padding))


def _in_ch(w):
    """Input-channel width of a (possibly int8-quantized) conv entry —
    the fused branch-head tensors are split by what each consumer conv
    actually takes, so non-default filter configs slice correctly."""
    k = w['k'] if 'k' in w else w['kq']
    return int(k.shape[2])


STEM_SKIP = ('Bottleneck', 'Conv2d_1a_s2d', 'Conv2d_1a_3x3',
             'Conv2d_2a_3x3', 'Conv2d_2b_3x3')


def fast_forward(params, cfg, images, image_size=160, normalization=0,
                 dtype=jnp.bfloat16, normalize=True, stem='xla'):
    """Fused inference forward: uint8/float images -> [B, 512] embeddings.

    Same contract as InceptionResnetV1.__call__(train=False): in-model
    preprocessing, L2-normalized float32 output (eps 1e-10).

    :param stem: 'xla' (default) runs the conv1/2a/2b/pool prefix as XLA
        convs; 'pallas' runs it as the fused flat-lane kernel
        (ops/pallas_stem.py, 160x160 only, needs the bf16 s2d stem —
        quantize with skip=STEM_SKIP); 'pallas-interpret' for CPU tests.
    """
    x = image_processing(images, image_size, normalization, dtype=dtype)

    if stem != 'xla':
        if stem not in ('pallas', 'pallas-interpret'):
            raise ValueError(f'unknown stem {stem!r}')
        if 'k' not in params.get('Conv2d_1a_s2d', {}):
            raise ValueError("stem='pallas' needs bf16 s2d stem params "
                             "(quantize with skip=irv1_fast.STEM_SKIP)")
        if x.shape[1:3] != (160, 160):
            raise ValueError("stem='pallas' supports 160x160 inputs only")
        from facenet_tpu.ops import pallas_stem as _pstem
        planes = _pstem.to_planes(x)
        x = _pstem.stem_forward_flat(_pstem.pack_stem(params), planes,
                                     interpret=stem == 'pallas-interpret')
    elif 'Conv2d_1a_s2d' in params and x.shape[1] % 2 == 0 \
            and x.shape[2] % 2 == 0:
        # space-to-depth stem (see build_fast_params): [B,H,W,3] ->
        # [B,H/2,W/2,12], then the rewritten 2x2/s1 conv
        b, h, w, c = x.shape
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = jax.nn.relu(_conv(xs, params['Conv2d_1a_s2d'], 1, 'VALID'))
    else:
        x = _crelu(x, params['Conv2d_1a_3x3'], 2, 'VALID')
    if stem == 'xla':
        x = _crelu(x, params['Conv2d_2a_3x3'], 1, 'VALID')
        x = _crelu(x, params['Conv2d_2b_3x3'], 1, 'VALID')
        x = jax.lax.reduce_window(
            x,
            -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
            jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
    x = _crelu(x, params['Conv2d_3b_1x1'], 1, 'VALID')
    x = _crelu(x, params['Conv2d_4a_3x3'], 1, 'VALID')
    x = _crelu(x, params['Conv2d_4b_3x3'], 2, 'VALID')

    scale35 = jnp.asarray(float(cfg.block35.scale), dtype)
    for i in range(int(cfg.block35.repeat)):
        w = params[f'Repeat.block35_{i + 1}']
        heads = _crelu(x, w['heads'])                      # [.., 96 default]
        n1, n2 = _in_ch(w['b1b']), _in_ch(w['b2b'])
        n0 = heads.shape[-1] - n1 - n2
        t0, t1, t2 = (heads[..., :n0], heads[..., n0:n0 + n1],
                      heads[..., n0 + n1:])
        t1 = _crelu(t1, w['b1b'])
        t2 = _crelu(_crelu(t2, w['b2b']), w['b2c'])
        up = _conv(jnp.concatenate([t0, t1, t2], axis=3), w['up'])
        x = jax.nn.relu(x + scale35 * up)

    w = params['Mixed_6a']
    t0 = _crelu(x, w['b0'], 2, 'VALID')
    t1 = _crelu(_crelu(_crelu(x, w['b1a']), w['b1b']), w['b1c'], 2, 'VALID')
    tp = jax.lax.reduce_window(
        x, jnp.finfo(x.dtype).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
    x = jnp.concatenate([t0, t1, tp], axis=3)

    scale17 = jnp.asarray(float(cfg.block17.scale), dtype)
    for i in range(int(cfg.block17.repeat)):
        w = params[f'Repeat_1.block17_{i + 1}']
        heads = _crelu(x, w['heads'])                      # [.., 256 default]
        n1 = _in_ch(w['b1b'])
        t0, t1 = heads[..., :heads.shape[-1] - n1], heads[..., -n1:]
        t1 = _crelu(_crelu(t1, w['b1b']), w['b1c'])
        up = _conv(jnp.concatenate([t0, t1], axis=3), w['up'])
        x = jax.nn.relu(x + scale17 * up)

    w = params['Mixed_7a']
    heads = _crelu(x, w['heads'])                          # [.., 768 default]
    n0, n1 = _in_ch(w['b0b']), _in_ch(w['b1b'])
    h0, h1, h2 = (heads[..., :n0], heads[..., n0:n0 + n1],
                  heads[..., n0 + n1:])
    t0 = _crelu(h0, w['b0b'], 2, 'VALID')
    t1 = _crelu(h1, w['b1b'], 2, 'VALID')
    t2 = _crelu(_crelu(h2, w['b2b']), w['b2c'], 2, 'VALID')
    tp = jax.lax.reduce_window(
        x, jnp.finfo(x.dtype).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
    x = jnp.concatenate([t0, t1, t2, tp], axis=3)

    n8 = int(cfg.block8_1.repeat)
    for i in range(n8 + 1):
        final = i == n8
        blk = 'Block8' if final else f'Repeat_2.block8_{i + 1}'
        w = params[blk]
        heads = _crelu(x, w['heads'])                      # [.., 384 default]
        n1 = _in_ch(w['b1b'])
        t0, t1 = heads[..., :heads.shape[-1] - n1], heads[..., -n1:]
        t1 = _crelu(_crelu(t1, w['b1b']), w['b1c'])
        up = _conv(jnp.concatenate([t0, t1], axis=3), w['up'])
        scale = float(cfg.block8_2.scale if final else cfg.block8_1.scale)
        act = cfg.block8_2.activation if final else cfg.block8_1.activation
        x = x + jnp.asarray(scale, dtype) * up
        if act:
            x = jax.nn.relu(x)

    # head: avg pool 3x3/3 VALID -> flatten -> folded dense+BN
    x = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        (1, 3, 3, 1), (1, 3, 3, 1), 'VALID') / jnp.asarray(9.0, x.dtype)
    x = x.reshape((x.shape[0], -1))
    w = params['Bottleneck']
    x = (jnp.dot(x, w['k'], preferred_element_type=jnp.float32) +
         w['b'].astype(jnp.float32))

    if normalize:
        norm = jnp.sqrt(jnp.maximum(
            jnp.sum(jnp.square(x), axis=1, keepdims=True), 1e-10))
        x = x / norm
    return x


class FastEmbedder:
    """Jitted fused forward bound to one trained parameter set."""

    def __init__(self, variables, config=None, image_size=160,
                 normalization=0, dtype=jnp.bfloat16, normalize=True,
                 quantize=None, calib_images=None, stem='xla'):
        self.params, self.cfg = build_fast_params(variables, config, dtype)
        self.image_size = int(image_size)
        self.normalization = int(normalization)
        self.normalize = bool(normalize)
        self.stem = stem
        if quantize:
            if quantize != 'int8':
                raise ValueError(f'unknown quantize mode {quantize!r}')
            if calib_images is None:
                raise ValueError('quantize="int8" needs calib_images '
                                 '(a representative uint8 batch)')
            from facenet_tpu.models.quantize import quantize_fast_params
            kw = {} if stem == 'xla' else {'skip': STEM_SKIP}
            self.params = quantize_fast_params(
                self.params, self.cfg, calib_images, self.image_size,
                self.normalization, **kw)
        cfg = self.cfg

        def fwd(params, images):
            return fast_forward(params, cfg, images, self.image_size,
                                self.normalization, dtype,
                                normalize=self.normalize, stem=self.stem)
        self._fwd = jax.jit(fwd)

    def __call__(self, images):
        return self._fwd(self.params, images)
