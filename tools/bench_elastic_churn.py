"""Elastic-fleet churn benchmark: what does membership change cost?

Measures, on the real chip at 480p:
  1. steady-state serve step at each bucket occupancy (padding overhead);
  2. join cost: one-slot donated scatter + single-stream weight upload
     (vs the naive alternative: re-stacking and re-uploading the fleet);
  3. leave + next-step cost (bucket shrink reuses a cached program).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_elastic_churn.py \
           [--capacity 8] [--steps 10] [--dtype bf16] [--size 480x854]
"""
import argparse
import time

import numpy as np

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from fosvos_tpu.evaluation import elastic
from fosvos_tpu.models import make_resnet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--capacity', type=int, default=8)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--dtype', default='bf16', choices=['fp32', 'bf16'])
    ap.add_argument('--size', default='480x854')
    args = ap.parse_args()

    h, w = map(int, args.size.split('x'))
    model = make_resnet(18)
    x0 = jnp.zeros((1, 64, 96, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x0, train=False)
                for k in range(args.capacity)]
    rng = np.random.RandomState(0)

    ef = elastic.ElasticFleet(model, capacity=args.capacity,
                              bf16=args.dtype == 'bf16')

    def serve_best(n):
        frames = rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            r = None
            for _ in range(args.steps):
                r = ef.segment(frames)
            np.asarray(r[0, :8])
            best = min(best, (time.perf_counter() - t0) / args.steps)
        return best

    # joins: time each (slot scatter + upload + first-serve compile is
    # reported separately from steady state)
    for k, v in enumerate(var_list):
        t0 = time.perf_counter()
        ef.add(v)
        dt = time.perf_counter() - t0
        n = len(ef.active_slots)
        t0 = time.perf_counter()
        ef.segment(rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8))
        first = time.perf_counter() - t0
        steady = serve_best(n)
        print(f'join -> {n}/{args.capacity} streams: add {dt * 1e3:.0f} ms, '
              f'first serve {first:.1f} s (compile/cached), steady '
              f'{steady * 1e3:.1f} ms/step '
              f'({n / steady:.1f} frames/s aggregate)', flush=True)

    # leaves: shrink back down, reusing cached bucket programs
    while len(ef.active_slots) > 1:
        ef.remove(ef.active_slots[0])
        n = len(ef.active_slots)
        t0 = time.perf_counter()
        ef.segment(rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8))
        first = time.perf_counter() - t0
        print(f'leave -> {n} streams: next serve {first * 1e3:.0f} ms '
              '(cached bucket)', flush=True)


if __name__ == '__main__':
    main()
