"""VOSService end-to-end benchmark: join (one-shot adaptation) -> serve.

Measures the production loop round 3 added on top of the adaptation and
fleet numbers in BENCHMARKS.md: wall-clock for a stream to JOIN the
service (compiled one-shot adaptation from the parent + slot install +
first serving dispatch) and the steady-state serve rate afterwards —
i.e. "a new camera is live in X seconds, the fleet keeps serving at Y
fps". The reference's equivalent chain is train_online.py (minutes of
GPU time) + checkpoint copy + a new run_webcam.py process.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_service.py \
           [--streams 4] [--n-epochs 10000] [--steps 20] [--bf16] \
           [--qat-int8] [--size 480x854] [--tiny]
"""
import argparse
import time

import numpy as np

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from fosvos_tpu.evaluation.service import VOSService
from fosvos_tpu.models import make_resnet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--streams', type=int, default=4)
    ap.add_argument('--n-epochs', type=int, default=10000)
    ap.add_argument('--steps', type=int, default=20,
                    help='steady-state serve steps to time')
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 serving + bf16-activation adaptation')
    ap.add_argument('--qat-int8', action='store_true')
    ap.add_argument('--size', default='480x854')
    ap.add_argument('--tiny', action='store_true',
                    help='32x48 sde=4 smoke mode (CPU-runnable)')
    args = ap.parse_args()
    if args.tiny:
        h, w, sde = 32, 48, 4
        args.n_epochs = min(args.n_epochs, 8)
    else:
        h, w = (int(v) for v in args.size.split('x'))
        sde = 0

    model = make_resnet(18, scale_down_exponent=sde)
    parent = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 96, 3), jnp.float32), train=False)
    parent = jax.tree.map(jnp.asarray, parent)

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(args.streams, h, w, 3),
                         dtype=np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[h // 4: h // 2, w // 4: w // 2] = 255

    svc = VOSService(model, parent, capacity=args.streams,
                     n_epochs=args.n_epochs, bf16=args.bf16,
                     adapt_bf16=args.bf16, qat_int8=args.qat_int8)

    # join latency per stream: first join pays the adaptation compiles
    # (amortized by the persistent XLA cache across processes), later
    # joins reuse every program
    join_s = []
    for k in range(args.streams):
        t0 = time.perf_counter()
        svc.join(frames[k], mask, seed=k)
        svc.segment(frames[:k + 1])          # served-from-next-dispatch
        join_s.append(time.perf_counter() - t0)
        print(f'join {k}: {join_s[-1]:.2f}s '
              f'({args.n_epochs} steps + install + first dispatch)')

    # steady-state serve rate (fenced by the returned masks)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = svc.segment(frames)
    dt = time.perf_counter() - t0
    assert out.shape == (args.streams, h, w)
    agg = args.streams * args.steps / dt
    print(f'serve steady state: {dt / args.steps * 1e3:.1f} ms/step, '
          f'{agg:.1f} frames/s aggregate over {args.streams} streams')
    print(f'join steady state (post-compile): {join_s[-1]:.2f}s; '
          f'first join (compiles): {join_s[0]:.2f}s')


if __name__ == '__main__':
    main()
