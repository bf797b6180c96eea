"""Online (one-shot) fine-tuning as compiled TPU scans — the signature
workload.

The reference (``train_online.py:58-119``) runs 10,000 Python epochs over the
single annotated first frame: per epoch a host->GPU copy, forward, backward,
and an optimizer step every 5. Here the frame lives in HBM for the whole
adaptation and the entire 10,000-step loop is a handful of ``lax.scan`` calls:

* augmentation (flip p=0.5 + scale from {0.5, 0.8, 1}, the reference's
  train pipeline ``io_helper.py:62-70``): the step budget is chunked into
  fixed-length per-scale scan segments, shuffled so scales interleave every
  ~50 steps like the reference's uniform per-step draw (XLA needs static
  shapes; each scale's scan compiles once — see
  ``transforms.scale_schedule``)
* the flip is drawn (jax PRNG in the scan carry) and applied
  (``transforms.device_flip``) on device, so a chunk dispatch moves zero
  bytes over the host link
* gradient accumulation (step every ``avg_grad_every_n=5``,
  ``train_online.py:92-101``) is ``optax.MultiSteps``, whose averaged-gradient
  window is numerically the reference's summed ``loss/5`` backwards
* loss: CB-BCE on the fused output only (``train_online.py:81``)
* BatchNorm runs in train mode with batch=1 — running stats update every
  step, exactly like the implicit ``net.train()`` of the reference

The :class:`OnlineFinetuner` is constructed once per (model, preset) and
reused across sequences, so the DAVIS-val 20-sequence sweep pays compilation
once per scale shape, not per sequence.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fosvos_tpu.data import transforms
from fosvos_tpu.train import optimizers
from fosvos_tpu.train.losses import online_loss
from fosvos_tpu.train.state import TrainState, create_state


@dataclasses.dataclass
class OnlineResult:
    state: TrainState
    losses: np.ndarray          # per-step loss, concatenated over buckets
    wall_time_s: float
    n_steps: int


class OnlineFinetuner:
    """Reusable compiled one-shot adapter.

    Default preset = reference production variant 11 (Adam 1e-4, wd 2e-4 —
    ``network_provider.py:480-481``, path stems in ``train_online.py:136``).
    """

    def __init__(self, model, preset: Optional[optimizers.Preset] = None,
                 avg_grad_every_n: int = 5,
                 example_params: Optional[Any] = None):
        self.model = model
        self.preset = preset or optimizers.online_variant(11)
        self.avg_grad_every_n = avg_grad_every_n
        self._example_params = example_params
        self._optimizer = None
        self._run_chunk = None

    def _build(self, params):
        base_opt = optimizers.make_optimizer(self.preset, params)
        optimizer = optax.MultiSteps(base_opt,
                                     every_k_schedule=self.avg_grad_every_n)
        model = self.model

        def step(carry, images, gts):
            p, batch_stats, opt_state, key = carry
            key, k_flip = jax.random.split(key)
            flip = jax.random.bernoulli(k_flip).astype(jnp.int32)
            imgs, g = transforms.device_flip(images, gts, flip)

            def loss_fn(pp):
                outs, mut = model.apply(
                    {'params': pp, 'batch_stats': batch_stats}, imgs,
                    train=True, mutable=['batch_stats'])
                return online_loss(outs, g), mut['batch_stats']

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, opt_state = optimizer.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, new_stats, opt_state, key), loss

        @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def run_chunk(carry, images, gts, n_steps):
            return jax.lax.scan(
                lambda c, _: step(c, images, gts), carry, None,
                length=n_steps)

        self._optimizer = optimizer
        self._run_chunk = run_chunk

    @property
    def optimizer(self):
        return self._optimizer

    def finetune(self, variables, image: np.ndarray, gt: np.ndarray,
                 n_epochs: int = 10000,
                 scales: Sequence[float] = transforms.TRAIN_SCALES,
                 augment: bool = True,
                 seed: int = 0,
                 schedule: Optional[Sequence] = None) -> OnlineResult:
        """One-shot adaptation of ``variables`` to a single annotated frame.

        Args:
          image: (H, W, 3) float32, already mean-subtracted.
          gt:    (H, W) float32 in [0, 1].
          schedule: optional explicit list of (scale, n_steps) chunks
            overriding the default interleaved ``transforms.scale_schedule``
            (A/B experiments).
        """
        if self._run_chunk is None:
            self._build(variables['params'])

        rng = np.random.RandomState(seed)
        if schedule is not None:
            schedule = list(schedule)
            n_epochs = sum(n for _, n in schedule)
        elif augment:
            schedule = transforms.scale_schedule(n_epochs, rng, scales)
        else:
            schedule = [(1.0, n_epochs)]
        pairs = _scaled_pairs(image, gt, sorted({s for s, _ in schedule}))

        # run_chunk donates its carry for in-place updates on TPU; copy the
        # caller's variables so they survive repeated finetune() calls.
        state = create_state(jax.tree.map(jnp.copy, variables),
                             self._optimizer)
        carry = (state.params, state.batch_stats, state.opt_state,
                 jax.random.PRNGKey(seed))

        t0 = time.perf_counter()
        all_losses: List[np.ndarray] = []
        for scale, n in schedule:
            images, gts = pairs[scale]
            carry, losses = self._run_chunk(carry, images, gts, n)
            all_losses.append(losses)
        jax.block_until_ready(carry)
        wall = time.perf_counter() - t0

        params, batch_stats, opt_state, _ = carry
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=jnp.asarray(n_epochs, jnp.int32))
        return OnlineResult(state=state,
                            losses=np.concatenate(
                                [np.asarray(l) for l in all_losses]),
                            wall_time_s=wall, n_steps=n_epochs)


def _scaled_pairs(image: np.ndarray, gt: np.ndarray,
                  scales: Sequence[float]):
    """Host-side: the frame at each train scale (cubic img / nearest mask,
    custom_transforms.py:72-92)."""
    out = {}
    for s in scales:
        samp = transforms.resize({'image': image, 'gt': gt}, s)
        img = samp['image'][None]                       # (1,H,W,3)
        g = samp['gt'][None, ..., None]                 # (1,H,W,1)
        out[s] = (jnp.asarray(img), jnp.asarray(g))
    return out


def finetune(model, variables, image, gt,
             preset: Optional[optimizers.Preset] = None,
             n_epochs: int = 10000, avg_grad_every_n: int = 5,
             scales: Sequence[float] = transforms.TRAIN_SCALES,
             augment: bool = True, seed: int = 0) -> OnlineResult:
    """One-off convenience wrapper around :class:`OnlineFinetuner`."""
    tuner = OnlineFinetuner(model, preset, avg_grad_every_n)
    return tuner.finetune(variables, image, gt, n_epochs=n_epochs,
                          scales=scales, augment=augment, seed=seed)
