"""Decompose the online (one-shot) train-step cost on the real TPU.

BENCHMARKS.md records 9.3 ms/step fp32 vs 8.8 ms bf16 at 480p batch 1 —
a suspiciously dtype-independent step time for a conv net whose forward is
~2.2 ms fp32. This tool times the step's stages separately so the
non-matmul bottleneck (BN stats? optimizer? scan structure?) is visible:

  fwd        model.apply(train=True, mutable=batch_stats)
  grad       jax.value_and_grad of the online loss (fwd + bwd)
  step       grad + optax.MultiSteps(Adam) update
  scan20     20-step lax.scan of the full step incl. on-device flip
             (the production path) / 20

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_online_step.py [--dtype fp32|bf16|both] [--scale 1.0]
"""
import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

from fosvos_tpu.data import transforms
from fosvos_tpu.models import make_resnet
from fosvos_tpu.train import optimizers
from fosvos_tpu.train.losses import online_loss
from fosvos_tpu.runtime.timing import time_pipelined


def build(dtype, scale):
    model = make_resnet(18, dtype=dtype)
    variables = make_resnet(18).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False)
    h, w = int(480 * scale), int(854 * scale)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 40.0)
    gt = np.zeros((1, h, w, 1), np.float32)
    gt[:, h // 4:h // 2, w // 4:w // 2] = 1.0
    gt = jnp.asarray(gt)
    return model, jax.device_put(variables), img, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='both', choices=['fp32', 'bf16', 'both'])
    ap.add_argument('--scale', type=float, default=1.0)
    ap.add_argument('--n-runs', type=int, default=30)
    args = ap.parse_args()

    dtypes = {'fp32': [None], 'bf16': [jnp.bfloat16],
              'both': [None, jnp.bfloat16]}[args.dtype]

    for dtype in dtypes:
        name = 'bf16' if dtype == jnp.bfloat16 else 'fp32'
        model, variables, img, gt = build(dtype, args.scale)
        params, batch_stats = variables['params'], variables['batch_stats']

        base_opt = optimizers.make_optimizer(optimizers.online_variant(11),
                                             params)
        optimizer = optax.MultiSteps(base_opt, every_k_schedule=5)
        opt_state = optimizer.init(params)

        @jax.jit
        def fwd(p, bs, x):
            outs, mut = model.apply({'params': p, 'batch_stats': bs}, x,
                                    train=True, mutable=['batch_stats'])
            return outs[-1].astype(jnp.float32).sum(), mut['batch_stats']

        def loss_fn(p, bs, x, g):
            outs, mut = model.apply({'params': p, 'batch_stats': bs}, x,
                                    train=True, mutable=['batch_stats'])
            return online_loss(outs, g), mut['batch_stats']

        @jax.jit
        def grad(p, bs, x, g):
            return jax.value_and_grad(loss_fn, has_aux=True)(p, bs, x, g)

        @jax.jit
        def step(p, bs, os_, x, g):
            (loss, nbs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bs, x, g)
            updates, os_ = optimizer.update(grads, os_, p)
            return optax.apply_updates(p, updates), nbs, os_, loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan20(carry, x, g):
            def body(c, _):
                p, bs, os_, key = c
                key, kf = jax.random.split(key)
                flip = jax.random.bernoulli(kf).astype(jnp.int32)
                xi, gi = transforms.device_flip(x, g, flip)
                (loss, nbs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, bs, xi, gi)
                updates, os_ = optimizer.update(grads, os_, p)
                return (optax.apply_updates(p, updates), nbs, os_, key), loss
            return jax.lax.scan(body, carry, None, length=20)

        rows = []
        t0 = time.perf_counter()
        dt = time_pipelined(fwd, params, batch_stats, img,
                            n_runs=args.n_runs)
        rows.append(('fwd(train)', dt, time.perf_counter() - t0))
        t0 = time.perf_counter()
        dt = time_pipelined(grad, params, batch_stats, img, gt,
                            n_runs=args.n_runs)
        rows.append(('grad', dt, time.perf_counter() - t0))
        t0 = time.perf_counter()
        dt = time_pipelined(step, params, batch_stats, opt_state, img, gt,
                            n_runs=args.n_runs)
        rows.append(('step', dt, time.perf_counter() - t0))

        t0 = time.perf_counter()
        carry = (params, batch_stats, opt_state, jax.random.PRNGKey(0))
        carry, _ = scan20(carry, img, gt)             # compile (donates)
        np.asarray(carry[3])
        t1 = time.perf_counter()
        n = 5
        for _ in range(n):
            carry, losses = scan20(carry, img, gt)
        np.asarray(carry[3])
        rows.append(('scan20/20', (time.perf_counter() - t1) / (n * 20),
                     t1 - t0))

        print(f'\n=== {name} scale={args.scale} '
              f'({int(480*args.scale)}x{int(854*args.scale)}) ===')
        for label, dt, wall in rows:
            print(f'  {label:12s} {dt*1e3:8.2f} ms   '
                  f'(+{wall:.0f}s compile/wall)')


if __name__ == '__main__':
    main()
