"""Device-resident offline training: the dataset lives in HBM.

Motivation (BENCHMARKS.md round-3 decomposition): behind a bandwidth-bound
host->device link the offline step is dominated by re-shipping frames every
epoch (`device_put` 18.8 ms vs 10.3 ms device compute at b1 480p). DAVIS-2016
train is ~3.4 GB as uint8 — it fits in HBM **once**, and every subsequent
epoch re-reads it for free. This trainer:

* uploads the full train split as two resident uint8 arrays (frames NHWC,
  masks NHW1) — one transfer for the whole run;
* runs each epoch as a handful of compiled chunk dispatches: a
  ``lax.scan`` over train steps that gathers the step's frames by index
  from the resident arrays, augments ON DEVICE (horizontal flip +
  multi-scale resize — the reference pipeline, ``io_helper.py:62-70``),
  normalizes (mean subtract / gt max, ``davis_2016.py:127-132``), and
  applies the same deep-supervision + MultiSteps update as
  :class:`~fosvos_tpu.train.offline.OfflineTrainer`;
* per-epoch host traffic is a permutation + flip bits (a few KB) out and
  one stacked loss readback in.

The three augmentation scales {0.5, 0.8, 1} become three compiled chunk
programs (static shapes), interleaved by ``transforms.scale_schedule``
exactly like the online adaptation path.

Documented deviation from the host pipeline: scale resize runs on device in
float32 (``jax.image.resize`` cubic for frames / nearest for masks) instead
of cv2 on uint8, so resized pixels are not bit-identical to the cv2 path
(no uint8 rounding; boundary handling differs). At scale 1.0 (and with
``augment=False``) there is no resize and the step sequence matches
``OfflineTrainer`` to float-reassociation tolerance (measured ~4e-7 after
an epoch; the scan body and the standalone step are different XLA
programs) — tested. The reference's own transform stack is a torch
CPU pipeline, so neither host nor device tier is bit-tied to it.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fosvos_tpu.data import transforms
from fosvos_tpu.data.davis import DAVIS2016, DAVIS_MEAN_BGR
from fosvos_tpu.train import optimizers
from fosvos_tpu.train.losses import deep_supervision_loss
from fosvos_tpu.train.offline import EpochStats
from fosvos_tpu.train.state import TrainState, create_state


def _resize_batch(imgs, gts, out_h: int, out_w: int):
    """Device-tier multi-scale resize: cubic frames, nearest masks
    (reference ``custom_transforms.py:63-92`` semantics, float32)."""
    b = imgs.shape[0]
    imgs = jax.image.resize(imgs, (b, out_h, out_w, imgs.shape[3]), 'cubic')
    gts = jax.image.resize(gts, (b, out_h, out_w, gts.shape[3]), 'nearest')
    return imgs, gts


class ResidentOfflineTrainer:
    """Offline training over an HBM-resident dataset (see module docstring)."""

    def __init__(self, model, preset: Optional[optimizers.Preset] = None,
                 avg_grad_every_n: int = 10, meanval=None,
                 chunk_steps: int = 50):
        self.model = model
        self.preset = preset or optimizers.Preset()
        self.avg_grad_every_n = avg_grad_every_n
        self.meanval = jnp.asarray(meanval if meanval is not None
                                   else DAVIS_MEAN_BGR, jnp.float32)
        self.chunk_steps = chunk_steps
        self._optimizer = None
        self._chunk_fns = {}    # (scale, T, B) are shape-keyed by jit itself

    def init_state(self, variables) -> TrainState:
        if self._optimizer is None:
            base = optimizers.make_optimizer(self.preset,
                                             variables['params'])
            self._optimizer = optax.MultiSteps(
                base, every_k_schedule=self.avg_grad_every_n)
        return create_state(variables, self._optimizer)

    def upload(self, dataset: DAVIS2016):
        """Stack the split as uint8 and ship it to HBM once."""
        imgs, gts = [], []
        for i in range(len(dataset)):
            img, gt = dataset.make_raw_pair(i)
            imgs.append(img)
            gts.append(gt[..., None])
        return (jax.device_put(np.stack(imgs)),
                jax.device_put(np.stack(gts)))

    def _chunk_fn(self, scale: float, native_hw):
        """Compiled scan over chunk steps at one augmentation scale."""
        key = (scale, native_hw)
        if key in self._chunk_fns:
            return self._chunk_fns[key]

        model = self.model
        mean = self.meanval
        optimizer = self._optimizer
        h, w = native_hw
        if scale == 1.0:
            out_h, out_w = h, w
        else:
            # cv2.resize(fx=s) output size convention: round(dim * s)
            out_h, out_w = int(round(h * scale)), int(round(w * scale))

        @jax.jit
        def run_chunk(state: TrainState, imgs_u8, gts_u8, idxs, flips,
                      epoch_frac):
            def body(state, xf):
                idx, flip = xf
                imgs = jnp.take(imgs_u8, idx, axis=0).astype(jnp.float32)
                gts = jnp.take(gts_u8, idx, axis=0).astype(jnp.float32)
                if scale != 1.0:
                    imgs, gts = _resize_batch(imgs, gts, out_h, out_w)
                imgs, gts = transforms.device_flip(imgs, gts, flip)
                # davis_2016.py:127-132 normalization, on device
                imgs = imgs - mean
                gmax = jnp.maximum(
                    jnp.max(gts, axis=(1, 2, 3), keepdims=True), 1e-8)
                gts = gts / gmax

                def loss_fn(p):
                    outs, mut = model.apply(
                        {'params': p, 'batch_stats': state.batch_stats},
                        imgs, train=True, mutable=['batch_stats'])
                    total, losses = deep_supervision_loss(outs, gts,
                                                          epoch_frac)
                    return total, (mut['batch_stats'], losses)

                (_, (new_stats, losses)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                return TrainState(params=params, batch_stats=new_stats,
                                  opt_state=opt_state,
                                  step=state.step + 1), jnp.stack(losses)

            state, losses = jax.lax.scan(body, state, (idxs, flips))
            return state, losses

        self._chunk_fns[key] = run_chunk
        return run_chunk


def train_offline_resident(
        model, variables, dataset: DAVIS2016,
        preset: Optional[optimizers.Preset] = None,
        n_epochs: int = 240, start_epoch: int = 0,
        batch_size: int = 1, avg_grad_every_n: int = 10,
        augment: bool = True, seed: int = 0,
        snapshot_every_n: int = 40,
        snapshot_fn: Optional[Callable[[int, TrainState], None]] = None,
        log_fn: Optional[Callable[[EpochStats], None]] = None,
        chunk_steps: int = 50) -> TrainState:
    """Drop-in for :func:`~fosvos_tpu.train.offline.train_offline` with the
    dataset resident in HBM (identical reference semantics and cadences;
    matches the standard path to float tolerance when ``augment=False`` —
    tested)."""
    trainer = ResidentOfflineTrainer(model, preset, avg_grad_every_n,
                                     meanval=dataset.meanval,
                                     chunk_steps=chunk_steps)
    state = trainer.init_state(variables)
    d_imgs, d_gts = trainer.upload(dataset)
    native_hw = tuple(d_imgs.shape[1:3])
    rng = np.random.RandomState(seed)
    n_steps = len(dataset) // batch_size

    for epoch in range(start_epoch, n_epochs):
        t0 = time.perf_counter()
        order = rng.permutation(len(dataset))[:n_steps * batch_size]
        idxs = order.reshape(n_steps, batch_size).astype(np.int32)
        if augment:
            flips = (rng.rand(n_steps, batch_size) < 0.5)
            schedule = transforms.scale_schedule(n_steps, rng,
                                                 chunk_steps=chunk_steps)
        else:
            flips = np.zeros((n_steps, batch_size), bool)
            schedule = [(1.0, n_steps)]

        epoch_losses = []
        pos = 0
        for scale, n in schedule:
            fn = trainer._chunk_fn(scale, native_hw)
            state, losses = fn(state, d_imgs, d_gts,
                               jnp.asarray(idxs[pos:pos + n]),
                               jnp.asarray(flips[pos:pos + n]),
                               jnp.asarray(epoch / n_epochs, jnp.float32))
            epoch_losses.append(losses)   # (n, 5) device-resident
            pos += n
        assert pos == n_steps

        # ONE readback per epoch (also fences the epoch for honest timing)
        mean_losses = (np.asarray(jnp.concatenate(epoch_losses)).mean(axis=0)
                       if epoch_losses else np.zeros(5))
        stats = EpochStats(epoch=epoch, mean_losses=mean_losses,
                           wall_time_s=time.perf_counter() - t0)
        if log_fn is not None:
            log_fn(stats)
        if snapshot_fn is not None and epoch % snapshot_every_n == \
                snapshot_every_n - 1 and epoch != 0:
            snapshot_fn(epoch, state)

    return state
