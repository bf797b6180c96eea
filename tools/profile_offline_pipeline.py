"""Decompose the offline train-step pipeline: where do the ~36 ms/step go?

Times each stage of the batch-1 uint8 path separately on the real device:
  decode     — DAVIS2016.make_raw_pair (JPEG via the native loader path)
  augment    — flip + random scale resize on uint8 (host, cv2)
  device_put — shipping the uint8 batch over the host->device link
  step       — the compiled train step with resident inputs (device compute)
  e2e        — the real loop (prefetch on and off)

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/profile_offline_pipeline.py [--n 16]
"""
import argparse
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

from fosvos_tpu.data import davis, synthetic, transforms
from fosvos_tpu.models import make_resnet
from fosvos_tpu.train import offline, optimizers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=16)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix='profile_davis_')
    synthetic.generate(root, sequences=[f's{i}' for i in range(args.n // 4)],
                       val_sequences=['v0'], n_frames=4, size=(480, 854))
    ds = davis.DAVIS2016(mode='train', db_root_dir=root)

    rng = np.random.RandomState(0)

    # decode
    t0 = time.perf_counter()
    pairs = [ds.make_raw_pair(i % len(ds)) for i in range(args.n)]
    t_decode = (time.perf_counter() - t0) / args.n * 1e3

    # augment (flip + scale draw, uint8)
    t0 = time.perf_counter()
    batches = []
    for img, gt in pairs:
        s = transforms.random_horizontal_flip({'image': img, 'gt': gt}, rng)
        scale = transforms.TRAIN_SCALES[rng.randint(3)]
        s = transforms.resize(s, scale)
        batches.append({'image': s['image'][None],
                        'gt': s['gt'][None, ..., None]})
    t_augment = (time.perf_counter() - t0) / args.n * 1e3

    # device_put (fenced by a scalar readback of the LAST transfer —
    # block_until_ready does not reliably block on the tunneled backend,
    # CLAUDE.md; a readback of the final in-order result does)
    t0 = time.perf_counter()
    put = []
    for b in batches:
        d = jax.device_put(b)
        put.append(d)
    np.asarray(put[-1]['gt'][0, 0, 0])
    t_put = (time.perf_counter() - t0) / args.n * 1e3

    # compiled step with resident inputs (group per shape)
    model = make_resnet(18)
    variables = jax.device_put(model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))
    trainer = offline.OfflineTrainer(model, optimizers.offline_variant(11),
                                     avg_grad_every_n=10,
                                     device_preprocess=True)
    state = trainer.init_state(variables)
    for b in put:   # warm every shape
        state, loss = trainer.train_step(state, b['image'], b['gt'], 0.0)
    np.asarray(loss)
    t0 = time.perf_counter()
    for b in put:
        state, loss = trainer.train_step(state, b['image'], b['gt'], 0.0)
    np.asarray(loss)
    t_step = (time.perf_counter() - t0) / args.n * 1e3

    print(f'decode      {t_decode:7.1f} ms/sample')
    print(f'augment     {t_augment:7.1f} ms/sample')
    print(f'device_put  {t_put:7.1f} ms/sample (fenced once at end)')
    print(f'step        {t_step:7.1f} ms/step (resident inputs)')


if __name__ == '__main__':
    main()
