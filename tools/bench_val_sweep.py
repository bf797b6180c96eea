"""Wall-clock a DAVIS-val-style 20-sequence online sweep on one chip.

The reference's full-eval story is 20 independent one-shot adaptations
(10,000 steps each) plus mask writing, manually sharded across processes
(``train_online.py:183-189``). Here the whole sweep runs in one process on
one chip: the finetuner's compiled per-scale scans are built once and reused
for all 20 sequences, and the inference engine's 480p forward compiles once.

Generates a synthetic 480p DAVIS tree with 20 val sequences, then runs
adaptation + mask writing per sequence, reporting per-sequence and total
wall-clock.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_val_sweep.py \
           [--n-epochs 10000] [--n-seqs 20] [--no-masks]
"""
import argparse
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.evaluation import experiment
from fosvos_tpu.models import make_resnet
from fosvos_tpu.train import online, optimizers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-epochs', type=int, default=10000)
    ap.add_argument('--n-seqs', type=int, default=20)
    ap.add_argument('--no-masks', action='store_true')
    ap.add_argument('--evaluate', action='store_true',
                    help='score the written masks with the in-repo J&F '
                         'evaluator and print dataset means')
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix='sweep_davis_')
    val = [f'synth-val{k:02d}' for k in range(args.n_seqs)]
    synthetic.generate(root, sequences=['synth-bear'], val_sequences=val,
                       n_frames=4, size=(480, 854))

    model = make_resnet(18)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))

    tuner = online.OnlineFinetuner(model, optimizers.online_variant(11),
                                   avg_grad_every_n=5)
    engine = None if args.no_masks else experiment.InferenceEngine(model, 1)

    t_sweep = time.perf_counter()
    train_s = masks_s = 0.0
    for i, seq in enumerate(val):
        ds = davis.DAVIS2016(mode='train', db_root_dir=root, seq_name=seq)
        img, gt = ds.make_img_gt_pair(0)
        res = tuner.finetune(variables, img, gt, n_epochs=args.n_epochs,
                             seed=i)
        train_s += res.wall_time_s
        line = f'{seq}: adapt {res.wall_time_s:6.1f}s'
        if engine is not None:
            t0 = time.perf_counter()
            ds_test = davis.DAVIS2016(mode='test', db_root_dir=root,
                                      seq_name=seq)
            experiment.test(model, res.state.variables, ds_test,
                            f'{root}/results', seq_name=seq, batch_size=1,
                            engine=engine)
            masks_s += time.perf_counter() - t0
            line += f'  masks {time.perf_counter() - t0:5.1f}s'
        print(line, flush=True)

    total = time.perf_counter() - t_sweep
    print(f'\n{args.n_seqs}-sequence sweep ({args.n_epochs} steps each): '
          f'{total:.0f} s total = {total / 60:.1f} min '
          f'({train_s:.0f} s adapting, {masks_s:.0f} s writing masks, '
          f'{total - train_s - masks_s:.0f} s host-side)')

    if args.evaluate and engine is not None:
        from fosvos_tpu.cli.evaluate import evaluate_results
        ev = evaluate_results(f'{root}/results', root)
        d = ev.summary()
        per_seq = [s.j.mean for s in ev.per_sequence.values()]
        print(f"J_mean {d['J_mean']:.4f} (min {min(per_seq):.4f} over "
              f"{len(per_seq)} seqs), J_recall {d['J_recall']:.4f}, "
              f"F_mean {d['F_mean']:.4f}")


if __name__ == '__main__':
    main()
