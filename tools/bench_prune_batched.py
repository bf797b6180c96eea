"""Measure the resident prune pipeline's inner-loop epoch costs, b1 vs bN.

``prune_iteratively(resident_batch_size=...)`` batches the rank and
fine-tune epochs like the parent trainer's ``--batch-size`` (round 5;
same backward-bound step, BENCHMARKS.md "What binds the batched resident
step"). This tool runs ONE 10% prune sweep at 480p on a synthetic split
for each batch size and reports the back-to-back epoch costs, derived
from the reference's own scalar-tag stream (``train_pruning/loss`` /
``finetune/loss``, 2 epochs per loop so the within-pair gap is a clean
epoch): with ``--batches 1,64`` this is the emitter for the
``prune_rank_epoch_fps_b*`` / ``prune_finetune_epoch_fps_b*`` BENCHMARKS
rows (one standard JSON line each).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_prune_batched.py
"""
import argparse
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from fosvos_tpu.compress import prune as prune_lib
from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.models import make_resnet


class TagTimes:
    def __init__(self):
        self.t = {}

    def add_scalar(self, tag, v, s):
        self.t.setdefault(tag, []).append(time.perf_counter())

    def close(self):
        pass

    def epoch_cost(self, tag):
        """Within-pair gap median: 2 epochs per loop, so every
        even-indexed gap is a clean back-to-back epoch; odd-indexed gaps
        span an iteration boundary (plan/materialize/host work)."""
        gaps = np.diff(self.t.get(tag, []))[0::2]
        return float(np.median(gaps)) if len(gaps) else float('nan')


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--batches', default='1,64')
    ap.add_argument('--n-seqs', type=int, default=24)
    args = ap.parse_args(argv)

    root = tempfile.mkdtemp(prefix='bench_prune_batched_')
    synthetic.generate(root,
                       sequences=[f's{i}' for i in range(args.n_seqs)],
                       val_sequences=['v0'], n_frames=8, size=(480, 854))
    ds = davis.DAVIS2016(mode='train', db_root_dir=root)
    model = make_resnet(18)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))

    for b in (int(x) for x in args.batches.split(',')):
        w = TagTimes()
        t0 = time.perf_counter()
        prune_lib.prune_iteratively(
            model, model.arch, variables, None, is_offline=True,
            prune_per_iter=64, n_epochs_select=2, n_epochs_finetune=2,
            percentage_max=10, summary_writer=w,
            resident_dataset=ds, resident_batch_size=b)
        wall = time.perf_counter() - t0
        n = len(ds)
        rc = w.epoch_cost('train_pruning/loss')
        fc = w.epoch_cost('finetune/loss')
        print(f'# prune b{b}: sweep wall {wall:.0f}s (incl. compiles), '
              f'rank-epoch {rc:.3f}s, ft-epoch {fc:.3f}s',
              file=sys.stderr)
        print(json.dumps({'metric': f'prune_rank_epoch_fps_b{b}',
                          'value': round(n / rc, 1),
                          'unit': 'frames/s/chip', 'vs_baseline': None}),
              flush=True)
        print(json.dumps({'metric': f'prune_finetune_epoch_fps_b{b}',
                          'value': round(n / fc, 1),
                          'unit': 'frames/s/chip', 'vs_baseline': None}),
              flush=True)


if __name__ == '__main__':
    main()
