"""Block-space stem experiment for the IRv1 serving path (VERDICT r2 #7).

profile_embed.py attributes 1.74 of 3.42 ms/chunk (51%, chunk=128) to
preprocessing + stem: the 3/12/32/64-channel stem tensors are tiled
feature-minor to 128 lanes, so every stem op pays a 2-42x HBM
amplification (same pathology as the P-Net record in pallas_pnet.py).

The rewrite keeps the three low-channel convs in a 4x4-BLOCK layout
where the channel dim is (block position x feature):

  raw u8 [B,164,164,3] -> s2d4 [B,41,41,48]
  conv1  : 2x2 block conv 48 -> 128  ((2x2 out-pos) x 32)   [B,40,40,128]
  conv2a : 2x2 block conv 128 -> 128 ((2x2 out-pos) x 32)   [B,39,39,128]
  conv2b : 2x2 block conv 128 -> 256 ((2x2 out-pos) x 64)   [B,38,38,256]
  pool   : 3x3/s2 maxpool as 9 shifted block-slice maxes -> [B,37,37,64]

All three conv channel dims are exact multiples of 128 -> no lane
padding anywhere in the hot stem. Out-of-footprint taps carry
structural ZERO weights, so garbage rows from the 164-pad only ever
flow to garbage positions (sliced away by construction). The per-image
normalization (min/max mode 0 / standardization mode 1) is an affine
x*s - t, so conv1 runs on the RAW uint8 cast and the epilogue applies
s*conv - t*K (K = per-channel kernel sum): the normalized image is
never materialized.

Usage: python tools/try_block_stem.py [cpu|tpu] [chunk]
  cpu: exact f32 equivalence vs the reference stem
  tpu: chained timing vs the current stem prefix
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

MODE = (sys.argv[1] if len(sys.argv) > 1 and __name__ == '__main__'
        else 'cpu')
if MODE == 'cpu' and __name__ == '__main__':
    import jax
    jax.config.update('jax_platforms', 'cpu')
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# block kernel construction (numpy, done once at param-build time)
# ---------------------------------------------------------------------------

def block_kernel_s2(w):
    """[3,3,3,oc] stride-2 conv kernel -> [2,2,48,4*oc] 4x4-block kernel.

    Output channel (p, q, oc) at block (By, Bx) is original output
    (2*By+p, 2*Bx+q); tap (ky, kx, ch) reads input (4*By+2p+ky, ...).
    """
    kh, kw, ic, oc = w.shape
    out = np.zeros((2, 2, 4 * 4 * ic, 4 * oc), w.dtype)
    for p in range(2):
        for q in range(2):
            for ky in range(kh):
                for kx in range(kw):
                    ry, rx = 2 * p + ky, 2 * q + kx
                    P, r = divmod(ry, 4)
                    Q, c = divmod(rx, 4)
                    out[P, Q, (r * 4 + c) * ic:(r * 4 + c + 1) * ic,
                        (p * 2 + q) * oc:(p * 2 + q + 1) * oc] = w[ky, kx]
    return out


def block_kernel_s1(w):
    """[3,3,ic,oc] stride-1 conv kernel -> [2,2,4*ic,4*oc] 2x2-block kernel.

    Blocks group 2x2 original pixels; channels are (p, q, feature).
    """
    kh, kw, ic, oc = w.shape
    out = np.zeros((2, 2, 4 * ic, 4 * oc), w.dtype)
    for p in range(2):
        for q in range(2):
            for ky in range(kh):
                for kx in range(kw):
                    P, r = divmod(p + ky, 2)
                    Q, c = divmod(q + kx, 2)
                    out[P, Q, (r * 2 + c) * ic:(r * 2 + c + 1) * ic,
                        (p * 2 + q) * oc:(p * 2 + q + 1) * oc] = w[ky, kx]
    return out


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def _conv(x, w, stride=1, padding='VALID'):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def ref_stem(x_norm, w1, b1, w2a, b2a, w2b, b2b):
    """The current serving stem (irv1_fast.py): s2d conv1 + 2a + 2b + pool."""
    b, h, w, c = x_norm.shape
    xs = x_norm.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    # s2d form of the 3x3/s2 kernel (build_fast_params does this fold)
    kh, kw, ic, oc = w1.shape
    w1s = np.zeros((2, 2, 4 * ic, oc), w1.dtype)
    for ky in range(kh):
        for kx in range(kw):
            P, r = divmod(ky, 2)
            Q, c2 = divmod(kx, 2)
            w1s[P, Q, (r * 2 + c2) * ic:(r * 2 + c2 + 1) * ic] = w1[ky, kx]
    x = jax.nn.relu(_conv(xs, jnp.asarray(w1s)) + b1)
    x = jax.nn.relu(_conv(x, jnp.asarray(w2a)) + b2a)
    x = jax.nn.relu(_conv(x, jnp.asarray(w2b)) + b2b)
    x = jax.lax.reduce_window(
        x, -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')
    return x


def block_stem(x_raw, scale, shift, wb1, b1, ksum1, wb2a, b2a, wb2b, b2b,
               dtype=jnp.float32):
    """Block-space stem on the RAW (unnormalized) image.

    x_raw: [B, H, W, 3] float (cast of uint8), H and W divisible by 4
           after the pad below. scale/shift: per-image [B,1,1,1] affine of
           the normalization (x_norm = x*scale - shift).
    """
    b, h, w, _ = x_raw.shape
    x = jnp.pad(x_raw, ((0, 0), (0, 4), (0, 4), (0, 0)))
    hb, wb = (h + 4) // 4, (w + 4) // 4
    xs = x.reshape(b, hb, 4, wb, 4, 3)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hb, wb, 48).astype(dtype)

    y = _conv(xs, jnp.asarray(wb1))                       # [B,40,40,128]
    # normalization epilogue: conv(x*s - t) = s*conv(x) - t*Ksum
    y = jax.nn.relu(y * scale.astype(y.dtype)
                    - shift.astype(y.dtype) * jnp.asarray(ksum1, y.dtype)
                    + jnp.asarray(b1, y.dtype))
    y = jax.nn.relu(_conv(y, jnp.asarray(wb2a)) + jnp.asarray(b2a, y.dtype))
    y = jax.nn.relu(_conv(y, jnp.asarray(wb2b)) + jnp.asarray(b2b, y.dtype))

    # 3x3/s2 maxpool over original pixels = 9 shifted block-slice maxes.
    # y: [B, 38, 38, (p, q, 64)]; pool output row o4 takes rows
    # {2o4, 2o4+1, 2o4+2} = blocks (o4, p=0), (o4, p=1), (o4+1, p=0).
    nb = y.shape[1]
    yb = y.reshape(b, nb, nb, 2, 2, 64)
    n4 = (nb - 1)                                          # 37
    rows = [yb[:, :n4, :, 0], yb[:, :n4, :, 1], yb[:, 1:, :, 0]]
    out = None
    for r in rows:
        for csel in (r[:, :, :n4, 0], r[:, :, :n4, 1], r[:, :, 1:, 0]):
            out = csel if out is None else jnp.maximum(out, csel)
    return out                                             # [B,37,37,64]


def make_params(rng, dtype=np.float32):
    w1 = rng.normal(0, 0.1, (3, 3, 3, 32)).astype(dtype)
    b1 = rng.normal(0, 0.1, (32,)).astype(dtype)
    w2a = rng.normal(0, 0.1, (3, 3, 32, 32)).astype(dtype)
    b2a = rng.normal(0, 0.1, (32,)).astype(dtype)
    w2b = rng.normal(0, 0.1, (3, 3, 32, 64)).astype(dtype)
    b2b = rng.normal(0, 0.1, (64,)).astype(dtype)
    blk = {
        'wb1': block_kernel_s2(w1),
        'b1': np.tile(b1, 4),
        'ksum1': np.tile(w1.sum(axis=(0, 1, 2)), 4),
        'wb2a': block_kernel_s1(w2a),
        'b2a': np.tile(b2a, 4),
        'wb2b': block_kernel_s1(w2b),
        'b2b': np.tile(b2b, 4),
    }
    return (w1, b1, w2a, b2a, w2b, b2b), blk


def run_cpu():
    rng = np.random.RandomState(0)
    refp, blk = make_params(rng)
    imgs = rng.randint(0, 256, (2, 160, 160, 3)).astype(np.float32)

    # mode-0 normalization stats
    mn = imgs.min(axis=(1, 2, 3), keepdims=True)
    mx = imgs.max(axis=(1, 2, 3), keepdims=True)
    rangev = np.maximum(mx - mn, 1e-3)
    scale = (2.0 / rangev).astype(np.float32)
    shift = ((mn + mx) / rangev).astype(np.float32)
    x_norm = imgs * scale - shift

    ref = np.asarray(ref_stem(jnp.asarray(x_norm), *refp))
    got_blk = np.asarray(block_stem(
        jnp.asarray(imgs), jnp.asarray(scale), jnp.asarray(shift), **blk))

    # unblock: [B,37,37,64] is already unblocked by the pool
    print('ref stem out:', ref.shape, 'block stem out:', got_blk.shape)
    assert ref.shape == got_blk.shape, (ref.shape, got_blk.shape)
    err = np.abs(ref - got_blk).max() / max(np.abs(ref).max(), 1e-6)
    print(f'max rel err: {err:.2e}')
    assert err < 1e-5, 'block stem does not match reference stem'
    print('EXACT MATCH (f32, tol 1e-5)')


def run_tpu():
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    k = 16
    rng = np.random.RandomState(0)
    refp, blk = make_params(rng)
    imgs = rng.randint(0, 256, (k, chunk, 160, 160, 3), dtype=np.uint8)
    dtype = jnp.bfloat16

    w1, b1, w2a, b2a, w2b, b2b = refp

    def pre(x):
        mn = jnp.min(x.reshape(x.shape[0], -1), axis=1)[:, None, None, None]
        mx = jnp.max(x.reshape(x.shape[0], -1), axis=1)[:, None, None, None]
        rangev = jnp.maximum((mx - mn).astype(jnp.float32), 1e-3)
        return 2.0 / rangev, (mn + mx).astype(jnp.float32) / rangev

    def ref_one(x):
        s, t = pre(x)
        xn = (x.astype(jnp.float32) * s - t).astype(dtype)
        return ref_stem(xn, *refp)

    def blk_one(x):
        s, t = pre(x)
        return block_stem(x.astype(dtype), s, t, dtype=dtype, **blk)

    def chained(fn):
        def run(images, prev):
            def body(carry, chk):
                out = fn(chk)
                flat = out.reshape(out.shape[0], -1)
                return carry + flat[0, 0].astype(jnp.float32) * 0, \
                    flat[0, :8].astype(jnp.float32)
            acc, probe = jax.lax.scan(body, jnp.float32(0), images)
            return probe, images + (acc * 0).astype(jnp.uint8)
        return jax.jit(run)

    dev = jax.devices()[0]
    imgs_d = jax.device_put(imgs, dev)

    for name, fn in [('ref ', ref_one), ('blk ', blk_one)]:
        f = chained(fn)
        out = jnp.zeros((k, 8), jnp.float32)
        cur = imgs_d
        for _ in range(2):
            out, cur = f(cur, out)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            out, cur = f(cur, out)
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / (iters * k)
        print(f'{name} pre+stem: {dt * 1e3:7.3f} ms/chunk '
              f'({dt / chunk * 1e6:5.2f} us/img)', flush=True)


if __name__ == '__main__':
    if MODE == 'cpu':
        run_cpu()
    else:
        run_tpu()
