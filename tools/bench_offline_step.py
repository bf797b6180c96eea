"""Measure offline (parent) training throughput end-to-end on the chip.

Runs the real ``train_offline`` loop (uint8 device-preprocess default) on a
synthetic 480p DAVIS tree and reports per-epoch wall-clock and frames/s.
The loop keeps the loss log on device with one readback per epoch, so the
host decodes/augments batch k+1 while the device trains on batch k.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_offline_step.py \
           [--batch-size 1] [--n-frames 32] [--epochs 3]
"""
import argparse
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.models import make_resnet
from fosvos_tpu.train import offline, optimizers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch-size', type=int, default=1)
    ap.add_argument('--n-frames', type=int, default=32)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--no-augment', action='store_true')
    ap.add_argument('--no-prefetch', action='store_true',
                    help='A/B: disable the double-buffered H2D prefetch')
    ap.add_argument('--resident', action='store_true',
                    help='device-resident dataset mode (train/resident.py): '
                         'one upload, on-device augmentation, chunked scans')
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix='offline_davis_')
    # parent-training split: all frames of every train sequence (one-shot
    # filtering only applies when a seq_name is given)
    n_seqs = max(1, args.n_frames // 4)
    synthetic.generate(root,
                       sequences=[f'synth-tr{i:02d}' for i in range(n_seqs)],
                       val_sequences=['synth-swan'],
                       n_frames=4, size=(480, 854))
    ds = davis.DAVIS2016(mode='train', db_root_dir=root)
    assert len(ds) == n_seqs * 4, len(ds)
    args.n_frames = len(ds)

    model = make_resnet(18)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))

    stats = []
    if args.resident:
        from fosvos_tpu.train import resident
        resident.train_offline_resident(
            model, variables, ds, preset=optimizers.offline_variant(11),
            n_epochs=args.epochs, batch_size=args.batch_size,
            avg_grad_every_n=10, augment=not args.no_augment,
            seed=0, snapshot_every_n=10 ** 9, log_fn=stats.append)
    else:
        offline.train_offline(model, variables, ds,
                              preset=optimizers.offline_variant(11),
                              n_epochs=args.epochs,
                              batch_size=args.batch_size,
                              avg_grad_every_n=10,
                              augment=not args.no_augment,
                              seed=0, snapshot_every_n=10 ** 9,
                              log_fn=stats.append,
                              prefetch=not args.no_prefetch)
    # iterate_raw_batches yields only full batches (trailing partial is
    # dropped), so steps/frames use floor
    n_steps = args.n_frames // args.batch_size
    n_trained = n_steps * args.batch_size
    for s in stats:
        tag = ' (incl. compiles)' if s.epoch == 0 else ''
        print(f'epoch {s.epoch}: {s.wall_time_s:6.2f} s '
              f'= {s.wall_time_s / n_steps * 1e3:6.1f} ms/step, '
              f'{n_trained / s.wall_time_s:5.1f} frames/s{tag}')


if __name__ == '__main__':
    main()
