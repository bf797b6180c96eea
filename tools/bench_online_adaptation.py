"""Wall-clock the signature workload: a full-budget one-shot adaptation.

Runs the production :class:`OnlineFinetuner` (reference budget: 10,000 steps,
batch 1, flip + {0.5,0.8,1.0} scale augmentation, Adam variant 11, optimizer
step every 5 — ``train_online.py:147-152``) on a synthetic 480p frame, on the
real TPU chip, and reports steady-state wall-clock (second run; the first
pays the per-scale scan compiles).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_online_adaptation.py \
           [--n-epochs 10000] [--sequential] [--dtype fp32|bf16]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

from fosvos_tpu.models import OSVOSVGG, make_resnet
from fosvos_tpu.train import online, optimizers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--network', default='resnet18',
                    choices=['resnet18', 'vgg16'])
    ap.add_argument('--n-epochs', type=int, default=10000)
    ap.add_argument('--sequential', action='store_true')
    ap.add_argument('--dtype', default='fp32', choices=['fp32', 'bf16'])
    ap.add_argument('--repeats', type=int, default=2)
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == 'bf16' else None
    if args.network == 'vgg16':
        model = OSVOSVGG(dtype=dtype)
        init_model = OSVOSVGG()
        preset = optimizers.vgg_online_preset()
    else:
        model = make_resnet(18, dtype=dtype)
        init_model = make_resnet(18)
        preset = optimizers.online_variant(11)
    variables = init_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False)
    variables = jax.device_put(variables)

    rng = np.random.RandomState(0)
    img = (rng.randn(480, 854, 3) * 40.0).astype(np.float32)
    gt = np.zeros((480, 854), np.float32)
    gt[100:300, 200:500] = 1.0

    tuner = online.OnlineFinetuner(model, preset, avg_grad_every_n=5,
                                   window_batch=not args.sequential)
    mode = 'sequential' if args.sequential else 'window-batched'
    for i in range(args.repeats):
        t0 = time.perf_counter()
        res = tuner.finetune(variables, img, gt, n_epochs=args.n_epochs,
                             seed=i)
        wall = time.perf_counter() - t0
        tag = 'first (incl. compiles)' if i == 0 else 'steady state'
        print(f'{mode} {args.dtype} {args.n_epochs} steps, {tag}: '
              f'{res.wall_time_s:.1f} s device ({wall:.1f} s total), '
              f'{res.wall_time_s / args.n_epochs * 1e3:.2f} ms/step, '
              f'final loss {res.losses[-1]:.4g}')


if __name__ == '__main__':
    main()
