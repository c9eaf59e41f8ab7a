"""Where does the train step's time go? (VERDICT r3 weak #1)

Serving proves the IRv1 forward costs ~0.025 ms/img bf16; the full train
step measured 432 ms / 256 img = 1.69 ms/img compute — a 15-20x gap over
a generous 3-4x backward+Adam multiplier. This tool localizes the gap
with an ablation ladder: each rung is a jitted, CHAINED variant of the
train step (inputs on device, each call's input depends on the previous
call's output — the only reliable timing pattern through the axon
tunnel, see CLAUDE.md), so the deltas between rungs attribute time to
one mechanism each:

  fwd_eval      forward only, BN running stats (serving-mode math)
  fwd_train     forward only, train-mode BN (batch stats) + dropout
  bwd_ce        + backward of CE loss only
  bwd_full      + center loss + L2 regularization terms
  full          + Adam update (= the production train_step)
  full_remat    production step with jax.checkpoint on the forward

Per rung it also prints the compiled cost_analysis (XLA's flop/byte
estimate) and scans the optimized HLO for f32 convolutions (a bf16
model should have none on the MXU path) and total convolution count.

Run on the real chip:  python tools/profile_train.py [rung ...]
(defaults to all rungs; each rung compiles in ~1-3 min on first run).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BATCH = 256
NROF_CLASSES = 8631
ITERS = 6
WARMUP = 2


def main():
    from bench import _init_backend_with_watchdog
    jax = _init_backend_with_watchdog()
    import jax.numpy as jnp

    from facenet_tpu.config import Config
    from facenet_tpu.train.softmax import SoftmaxTrainer, make_train_step

    cfg = Config({
        'batch_size': BATCH,
        'image': {'size': 160, 'normalization': 0,
                  'random_crop': False, 'random_flip': False},
        'train': {'adam_epsilon': 0.1,
                  'epoch': {'size': 10, 'max_nrof_epochs': 1},
                  'learning_rate': {'schedule': [[100, 0.05]]}},
        'loss': {'center_alfa': 0.95, 'center_factor': 0.5},
    })
    trainer = SoftmaxTrainer(cfg, nrof_classes=NROF_CLASSES)
    state = trainer.init_state(seed=0)
    model, tx = trainer.model, trainer.tx

    rng = np.random.RandomState(0)
    device = jax.devices()[0]
    images = jax.device_put(
        rng.randint(0, 256, (BATCH, 160, 160, 3), np.uint8), device)
    labels = jax.device_put(
        rng.randint(0, NROF_CLASSES, BATCH).astype(np.int32), device)

    from facenet_tpu.ops import losses as losses_mod
    from facenet_tpu.models.inception_resnet_v1 import (
        WEIGHT_DECAY, l2_regularization)

    def chain_rng(state, probe):
        """Fold a probe scalar into state.rng so successive calls serialize."""
        bump = (probe * 0).astype(jnp.uint32)
        return state.replace(rng=state.rng + bump)

    # ---- rung definitions: state -> (state, probe_scalar) -----------------
    def fwd_eval(state):
        emb = model.backbone.apply(
            {'params': state.params['backbone'],
             'batch_stats': state.batch_stats['backbone']},
            images, train=False)
        return chain_rng(state, emb[0, 0]), emb[0, 0]

    def _loss(params, batch_stats, centers, rng, with_extras):
        (logits, prelogits), mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            images, train=True, mutable=['batch_stats'],
            rngs={'dropout': rng})
        ce = losses_mod.softmax_cross_entropy_with_logits(logits, labels)
        total = ce
        if with_extras:
            total = total + l2_regularization(params, WEIGHT_DECAY)
            c_loss, centers = losses_mod.center_loss(
                prelogits, labels, centers, 0.95)
            total = total + 0.5 * c_loss
        return total, (mutated['batch_stats'], centers)

    def fwd_train(state):
        total, _ = _loss(state.params, state.batch_stats, state.centers,
                         state.rng, with_extras=False)
        return chain_rng(state, total), total

    def _bwd(state, with_extras):
        grads, (bs, centers) = jax.grad(
            _loss, has_aux=True)(state.params, state.batch_stats,
                                 state.centers, state.rng, with_extras)
        probe = grads['backbone']['Bottleneck']['kernel'][0, 0]
        return chain_rng(state.replace(batch_stats=bs, centers=centers),
                         probe), probe

    def bwd_ce(state):
        return _bwd(state, with_extras=False)

    def bwd_full(state):
        return _bwd(state, with_extras=True)

    def make_full(remat, frozen_bn=False):
        step = make_train_step(model, tx, cfg.loss, augment_cfg=cfg.image,
                               image_size=160, remat=remat,
                               frozen_bn=frozen_bn)

        def full(state):
            state, metrics = step(state, images, labels)
            return state, metrics['loss']
        return full

    rungs = {
        'fwd_eval': fwd_eval,
        'fwd_train': fwd_train,
        'bwd_ce': bwd_ce,
        'bwd_full': bwd_full,
        'full': make_full(False),
        'full_remat': make_full(True),
        # late-phase frozen-BN schedule (VERDICT r4 next #5): running-BN
        # forward in the production step — measures how much of the
        # +17.6 ms train-BN floor the schedule claws back
        'full_frozen_bn': make_full(False, frozen_bn=True),
    }
    selected = sys.argv[1:] or list(rungs)

    def hlo_conv_stats(compiled):
        txt = compiled.as_text()
        convs = [ln for ln in txt.splitlines() if ' convolution(' in ln
                 or ln.lstrip().startswith('convolution')]
        f32 = [ln for ln in convs if ln.lstrip().startswith('f32')
               and 'bf16' not in ln.split('convolution')[0]]
        return len(convs), len(f32)

    results = {}
    for name in selected:
        fn = jax.jit(rungs[name], donate_argnums=(0,))
        t0 = time.perf_counter()
        lowered = fn.lower(state)
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0

        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = cost.get('flops', float('nan'))
        except Exception:
            flops = float('nan')
        try:
            nconv, nf32 = hlo_conv_stats(compiled)
        except Exception:
            nconv = nf32 = -1

        cur = state
        probe = None
        for _ in range(WARMUP):
            cur, probe = fn(cur)
        float(np.asarray(probe))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            cur, probe = fn(cur)
        float(np.asarray(probe))
        dt = (time.perf_counter() - t0) / ITERS
        # keep the (donated) chain alive for the next rung
        state = cur

        results[name] = dt
        tflops = flops / dt / 1e12 if flops == flops else float('nan')
        print(f'{name:12s} {dt*1e3:8.1f} ms/step  '
              f'{BATCH/dt:8.0f} img/s  '
              f'flops={flops/1e9:8.1f}G  eff={tflops:6.1f} TFLOP/s  '
              f'convs={nconv} (f32: {nf32})  compile={compile_s:.0f}s',
              flush=True)

    if 'fwd_train' in results and 'fwd_eval' in results:
        print(f'train-BN overhead: '
              f'{(results["fwd_train"] - results["fwd_eval"])*1e3:.1f} ms')
    if 'bwd_ce' in results and 'fwd_train' in results:
        print(f'backward (CE): '
              f'{(results["bwd_ce"] - results["fwd_train"])*1e3:.1f} ms')
    if 'bwd_full' in results and 'bwd_ce' in results:
        print(f'center+L2 terms: '
              f'{(results["bwd_full"] - results["bwd_ce"])*1e3:.1f} ms')
    if 'full' in results and 'bwd_full' in results:
        print(f'Adam update: '
              f'{(results["full"] - results["bwd_full"])*1e3:.1f} ms')
    if 'full_frozen_bn' in results and 'full' in results:
        print(f'frozen-BN saves: '
              f'{(results["full"] - results["full_frozen_bn"])*1e3:.1f} ms '
              f'({results["full"]/results["full_frozen_bn"]:.2f}x step '
              'speedup)')


if __name__ == '__main__':
    main()
