"""End-to-end serving A/B of the stem backends at bench geometry.

Times the full fused IRv1 serving forward (lax.scan over K chunks of
B=128, chained through outputs — bench.py's measurement design) for four
variants:

  bf16 / xla stem      (round-2 serving path)
  bf16 / pallas stem   (ops/pallas_stem.py flat-lane kernel)
  int8 / xla stem      (round-3 headline: full PTQ incl. stem)
  int8 / pallas stem   (PTQ with STEM_SKIP: stem bf16 in the kernel)

The winner decides FastEmbedder's serving default and bench.py's
headline path. Kernel-level timing lives in tools/try_stem_flat.py;
this tool answers the only question that matters: does the fused kernel
beat XLA's *int8* stem inside the real dispatch.

Usage: python tools/time_stem_serving.py [K] [iters]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CHUNK = 128


def main():
    k_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    import jax
    import jax.numpy as jnp

    from facenet_tpu.models.inception_resnet_v1 import create_model
    from facenet_tpu.models import irv1_fast as F
    from facenet_tpu.models.quantize import quantize_fast_params

    model = create_model()
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (k_chunks, CHUNK, 160, 160, 3),
                         dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), images[0, :1], train=False)
    params, cfg = F.build_fast_params(variables)

    def make_fwd(stem):
        def forward_chained(p, imgs):
            def body(carry, chunk):
                emb = F.fast_forward(p, cfg, chunk, stem=stem)
                return carry + emb[0, 0] * 0, emb[:, 0]
            acc, probe = jax.lax.scan(body, jnp.float32(0), imgs)
            return probe, imgs + (acc * 0).astype(jnp.uint8)
        return jax.jit(forward_chained)

    device = jax.devices()[0]
    feed0 = jax.device_put(images, device)

    def measure(p, stem):
        fwd = make_fwd(stem)
        p = jax.device_put(p, device)
        cur = feed0
        out = None
        for _ in range(2):
            out, cur = fwd(p, cur)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out, cur = fwd(p, cur)
        np.asarray(out[0, 0])
        return k_chunks * CHUNK * iters / (time.perf_counter() - t0)

    results = {}
    qfull = quantize_fast_params(params, cfg, images[0, :32])
    qskip = quantize_fast_params(params, cfg, images[0, :32],
                                 skip=F.STEM_SKIP)
    for name, (p, stem) in {
        'bf16_xla': (params, 'xla'),
        'bf16_pallas': (params, 'pallas'),
        'int8_xla': (qfull, 'xla'),
        'int8_pallas': (qskip, 'pallas'),
    }.items():
        r = measure(p, stem)
        results[name] = round(r, 1)
        print(f'{name:13s}: {r:10,.0f} img/s '
              f'({1e6 / r:6.2f} us/img)', flush=True)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
