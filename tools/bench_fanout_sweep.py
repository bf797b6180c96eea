"""The 20-sequence sweep through the FAN-OUT path (parallel/fanout.py).

On an n-chip 'seq' mesh the 20 adaptations run concurrently; on ONE chip the
same code serializes them on-device inside each chunk dispatch (lax.map), so
the whole sweep is ~200 dispatches total with no host round trip per
sequence — this validates the fan-out path on real hardware and measures the
single-chip version of the sweep that tools/bench_val_sweep.py drives
sequence-by-sequence from the host.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_fanout_sweep.py \
           [--n-epochs 10000] [--n-seqs 20]
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
from fosvos_tpu.models import make_resnet
from fosvos_tpu.parallel import fanout, make_mesh
from fosvos_tpu.train import optimizers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-epochs', type=int, default=10000)
    ap.add_argument('--n-seqs', type=int, default=20)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix='fanout_davis_')
    val = [f'synth-val{k:02d}' for k in range(args.n_seqs)]
    synthetic.generate(root, sequences=['synth-bear'], val_sequences=val,
                       n_frames=4, size=(480, 854))

    model = make_resnet(18)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))

    imgs, gts = [], []
    mean = None
    for seq in val:
        ds = davis.DAVIS2016(mode='train', db_root_dir=root, seq_name=seq)
        img, gt = ds.make_raw_pair(0)
        imgs.append(img)
        gts.append(gt)
        mean = ds.meanval

    mesh = make_mesh(('seq',))
    fo = fanout.SequenceFanout(model, mesh, optimizers.online_variant(11),
                               avg_grad_every_n=5, mean=mean)
    t0 = time.perf_counter()
    res = fo.finetune_all(variables, np.stack(imgs), np.stack(gts),
                          n_epochs=args.n_epochs, seed=0)
    total = time.perf_counter() - t0
    assert np.isfinite(res.losses).all()
    print(f'{args.n_seqs}-sequence fan-out sweep ({args.n_epochs} steps '
          f'each) on a {mesh.size}-device mesh: {res.wall_time_s:.0f} s '
          f'device ({total:.0f} s total incl. compiles) — '
          f'{res.wall_time_s / args.n_seqs:.1f} s/sequence; '
          f'final losses min {res.losses[-1].min():.3g} '
          f'max {res.losses[-1].max():.3g}')


if __name__ == '__main__':
    main()
