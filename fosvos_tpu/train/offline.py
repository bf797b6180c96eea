"""Offline (parent) training on the DAVIS-2016 train split.

Reference: ``train_offline.py:58-138`` — 240 epochs over ~2079 frames,
batch 1, deep supervision with annealed side losses, optimizer step every 10
(grad accumulation), snapshot every 40 epochs.

TPU-native shape handling: the multi-scale augmentation {0.5, 0.8, 1} yields
three static shapes; the jitted train step is compiled once per shape and
reused (XLA jit cache). Batches larger than 1 are supported by sampling one
scale per batch (at the reference's batch_size=1 this is identical to
per-sample scales).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fosvos_tpu.data import transforms
from fosvos_tpu.data.davis import DAVIS2016
from fosvos_tpu.train import optimizers
from fosvos_tpu.train.losses import deep_supervision_loss
from fosvos_tpu.train.state import TrainState, create_state


class OfflineTrainer:
    """Compiled offline train/eval steps for a model + optimizer preset.

    With ``device_preprocess=True`` the step accepts raw **uint8** batches
    (BGR frame + mask) and performs the reference's normalization
    (mean subtraction davis_2016.py:127-128, gt/max davis_2016.py:131-132)
    on device — 4x less host->device traffic, which dominates step time on
    bandwidth-limited links.
    """

    def __init__(self, model, preset: Optional[optimizers.Preset] = None,
                 avg_grad_every_n: int = 10,
                 device_preprocess: bool = False,
                 meanval=None):
        from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
        self.model = model
        self.preset = preset or optimizers.Preset()
        self.avg_grad_every_n = avg_grad_every_n
        self.device_preprocess = device_preprocess
        self.meanval = jnp.asarray(meanval if meanval is not None
                                   else DAVIS_MEAN_BGR, jnp.float32)
        self._optimizer = None
        self._train_step = None
        self._eval_step = None

    def init_state(self, variables) -> TrainState:
        if self._optimizer is None:
            self._build(variables['params'])
        return create_state(variables, self._optimizer)

    def _build(self, params):
        base_opt = optimizers.make_optimizer(self.preset, params)
        optimizer = optax.MultiSteps(base_opt,
                                     every_k_schedule=self.avg_grad_every_n)
        model = self.model
        mean = self.meanval
        device_preprocess = self.device_preprocess

        @jax.jit
        def train_step(state: TrainState, images, gts, epoch_frac):
            if device_preprocess:
                # davis_2016.py:127-132 normalization, on device
                images = images.astype(jnp.float32) - mean
                gts = gts.astype(jnp.float32)
                gmax = jnp.maximum(
                    jnp.max(gts, axis=(1, 2, 3), keepdims=True), 1e-8)
                gts = gts / gmax

            def loss_fn(p):
                outs, mut = model.apply(
                    {'params': p, 'batch_stats': state.batch_stats}, images,
                    train=True, mutable=['batch_stats'])
                total, losses = deep_supervision_loss(outs, gts,
                                                      epoch_frac)
                return total, (mut['batch_stats'], losses)

            (_, (new_stats, losses)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=params, batch_stats=new_stats,
                                   opt_state=opt_state, step=state.step + 1)
            return new_state, jnp.stack(losses)

        @jax.jit
        def eval_step(params, batch_stats, images, gts):
            outs = model.apply({'params': params, 'batch_stats': batch_stats},
                               images, train=False)
            _, losses = deep_supervision_loss(outs, gts, jnp.asarray(0.0))
            return jnp.stack(losses)

        self._optimizer = optimizer
        self._train_step = train_step
        self._eval_step = eval_step

    def train_step(self, state, images, gts, epoch_frac):
        return self._train_step(state, jnp.asarray(images), jnp.asarray(gts),
                                jnp.asarray(epoch_frac, jnp.float32))

    def eval_step(self, state, images, gts):
        return self._eval_step(state.params, state.batch_stats,
                               jnp.asarray(images), jnp.asarray(gts))


def iterate_raw_batches(dataset: DAVIS2016, batch_size: int,
                        rng: np.random.RandomState, augment: bool = True,
                        scales: Sequence[float] = transforms.TRAIN_SCALES
                        ) -> Iterator[Dict[str, np.ndarray]]:
    """uint8 batches (BGR frame, mask) for device-side preprocessing
    (pair with ``OfflineTrainer(device_preprocess=True)``). Decode runs on
    the native C++ prefetch threads in raw mode; augmentation (flip + scale)
    operates on uint8 directly."""
    from fosvos_tpu.data import loader as data_loader
    order = list(rng.permutation(len(dataset)))
    pending_imgs, pending_gts = [], []
    for _, img, gt in data_loader.iterate_samples(dataset, order, raw=True):
        s = {'image': img, 'gt': gt}
        if augment:
            s = transforms.random_horizontal_flip(s, rng)
        pending_imgs.append(s['image'])
        pending_gts.append(s['gt'])
        if len(pending_imgs) == batch_size:
            scale = scales[rng.randint(len(scales))] if augment else 1.0
            imgs, gts = [], []
            for im, g in zip(pending_imgs, pending_gts):
                b = transforms.resize({'image': im, 'gt': g}, scale) \
                    if augment else {'image': im, 'gt': g}
                imgs.append(b['image'])
                gts.append(b['gt'][..., None])
            yield {'image': np.stack(imgs), 'gt': np.stack(gts)}
            pending_imgs, pending_gts = [], []


def iterate_batches(dataset: DAVIS2016, batch_size: int,
                    rng: np.random.RandomState, augment: bool = True,
                    scales: Sequence[float] = transforms.TRAIN_SCALES,
                    use_native: bool = True
                    ) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled, augmented batches with one scale per batch.

    Matches the reference pipeline (shuffle=True, Compose[Flip, Resize],
    ``io_helper.py:62-70``) at batch 1; scale is drawn per batch so shapes
    stay static within a batch. Decoding runs on the native C++ prefetch
    threads when available (``fosvos_tpu.data.loader``); samples are grouped
    into batches in completion order, which only re-permutes an
    already-shuffled epoch.
    """
    from fosvos_tpu.data import loader as data_loader
    order = list(rng.permutation(len(dataset)))
    pending_imgs, pending_gts = [], []
    for _, img, gt in data_loader.iterate_samples(dataset, order,
                                                  use_native=use_native):
        s = {'image': img, 'gt': gt}
        if augment:
            s = transforms.random_horizontal_flip(s, rng)
        pending_imgs.append(s['image'])
        pending_gts.append(s['gt'])
        if len(pending_imgs) == batch_size:
            scale = scales[rng.randint(len(scales))] if augment else 1.0
            imgs, gts = [], []
            for im, g in zip(pending_imgs, pending_gts):
                b = transforms.resize({'image': im, 'gt': g}, scale) \
                    if augment else {'image': im, 'gt': g}
                imgs.append(b['image'])
                gts.append(b['gt'][..., None])
            yield {'image': np.stack(imgs), 'gt': np.stack(gts)}
            pending_imgs, pending_gts = [], []


def prefetch_to_device(batches, put_fn=None, depth: int = 2):
    """Overlap H2D transfer with device compute (double buffering).

    A daemon thread walks ``batches`` and enqueues each batch onto the
    device (``jax.device_put``, or ``put_fn`` for sharded placement) up to
    ``depth`` batches ahead of the consumer — while step k executes, batch
    k+1 crosses the host->device link instead of serializing with the step
    dispatch (the pattern proven in the webcam serve path,
    ``cli/run_webcam.py``). Bit-equivalent to the serial loop: only *when*
    the transfer happens changes, not what is transferred.

    Host-side augmentation/decoding inside the ``batches`` generator also
    moves off the consumer thread (cv2/np release the GIL for the heavy
    parts, as does the device_put transfer wait).
    """
    import queue
    import threading

    put = put_fn if put_fn is not None else jax.device_put
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    done = object()
    stop = threading.Event()

    def enqueue(item) -> bool:
        # bounded put polling the stop flag: if the consumer is gone
        # (exception / early break closed the generator), the worker drops
        # its device buffers and exits instead of blocking forever
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not enqueue(put(b)):
                    return
        except BaseException as e:   # propagate into the consumer
            enqueue(e)
            return
        enqueue(done)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


@dataclasses.dataclass
class EpochStats:
    epoch: int
    mean_losses: np.ndarray     # (5,) per-output mean CB-BCE over the epoch
    wall_time_s: float


def mean_epoch_losses(epoch_losses) -> np.ndarray:
    """Mean per-output losses from a list of device-resident (5,) loss
    vectors: ONE stacked readback (which also fences the epoch — no
    per-step D2H round trips behind a high-latency link)."""
    import jax.numpy as jnp
    if not epoch_losses:
        return np.zeros(5)
    return np.asarray(jnp.stack(epoch_losses)).mean(axis=0)


def train_offline(model, variables, dataset: DAVIS2016,
                  preset: Optional[optimizers.Preset] = None,
                  n_epochs: int = 240, start_epoch: int = 0,
                  batch_size: int = 1, avg_grad_every_n: int = 10,
                  augment: bool = True, seed: int = 0,
                  snapshot_every_n: int = 40,
                  snapshot_fn: Optional[Callable[[int, TrainState], None]] = None,
                  log_fn: Optional[Callable[[EpochStats], None]] = None,
                  device_preprocess: bool = True,
                  test_dataset: Optional[DAVIS2016] = None,
                  test_every_n: int = 5,
                  test_log_fn: Optional[Callable[[EpochStats], None]] = None,
                  prefetch: bool = True
                  ) -> TrainState:
    """Full offline training loop (reference defaults: 240 epochs, batch 1,
    step every 10, snapshot every 40 — ``train_offline.py:153-157``).

    ``device_preprocess`` (default) ships uint8 batches and normalizes on
    device — bit-equal to the host path and ~3x faster per step when the
    host->device link is the bottleneck. ``prefetch`` (default) additionally
    double-buffers the H2D transfer behind the running step
    (:func:`prefetch_to_device`)."""
    trainer = OfflineTrainer(model, preset, avg_grad_every_n,
                             device_preprocess=device_preprocess,
                             meanval=dataset.meanval)
    state = trainer.init_state(variables)
    rng = np.random.RandomState(seed)
    batches_fn = iterate_raw_batches if device_preprocess else iterate_batches

    for epoch in range(start_epoch, n_epochs):
        t0 = time.perf_counter()
        epoch_losses = []
        batch_iter = batches_fn(dataset, batch_size, rng, augment)
        if prefetch:
            batch_iter = prefetch_to_device(batch_iter)
        for batch in batch_iter:
            state, losses = trainer.train_step(
                state, batch['image'], batch['gt'], epoch / n_epochs)
            epoch_losses.append(losses)
        stats = EpochStats(epoch=epoch,
                           mean_losses=mean_epoch_losses(epoch_losses),
                           wall_time_s=time.perf_counter() - t0)
        if log_fn is not None:
            log_fn(stats)
        # reference cadence: (epoch % n) == n-1 and epoch != 0
        if snapshot_fn is not None and epoch % snapshot_every_n == \
                snapshot_every_n - 1 and epoch != 0:
            snapshot_fn(epoch, state)

        # test-while-training loss pass (reference train_offline.py:115-136)
        if test_dataset is not None and \
                epoch % test_every_n == test_every_n - 1:
            t1 = time.perf_counter()
            tlosses = [trainer.eval_step(state, img[None], gt[None, ..., None])
                       for img, gt in (test_dataset.make_img_gt_pair(i)
                                       for i in range(len(test_dataset)))]
            tstats = EpochStats(epoch=epoch,
                                mean_losses=mean_epoch_losses(tlosses),
                                wall_time_s=time.perf_counter() - t1)
            if test_log_fn is not None:
                test_log_fn(tstats)

    return state
