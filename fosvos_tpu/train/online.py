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
  ``train_online.py:92-101``): by default the whole accumulation window is
  computed as ONE batched forward/backward (``window_batch=True``, below);
  ``window_batch=False`` falls back to sequential ``optax.MultiSteps``
  micro-steps, whose averaged-gradient window is numerically the reference's
  summed ``loss/5`` backwards
* loss: CB-BCE on the fused output only (``train_online.py:81``)
* BatchNorm runs in train mode with batch=1 — running stats update every
  step, exactly like the implicit ``net.train()`` of the reference

**The accumulation window is a batch** (the TPU-first schedule). Inside a
fixed-scale chunk the only stochastic augmentation is the horizontal flip —
two outcomes — and within a window the params never change (MultiSteps only
applies the update at the window end). So the window's mean gradient is

    (k/n) * grad(loss(flipped)) + ((n-k)/n) * grad(loss(orig)),

with ``k ~ Binomial(n, 1/2)`` the number of flipped micro-steps: ONE
``vmap``-ed {orig, flipped} forward/backward replaces n sequential batch-1
ones. This is numerically equivalent (not an approximation; tested against
hand-rolled sequential MultiSteps micro-steps with the same flip draws):

* gradients are linear, so the weighted 2-sample gradient IS the window mean;
* the pair is ``vmap``-ed (not batch-2-pooled), so each sample computes its
  own batch-1 BN statistics — exactly each micro-step's normalization —
  while XLA still batches the convolutions across the pair;
* the window's n sequential running-stat EMA updates select between just two
  per-sample stats values, so they are replayed exactly in flip order from
  the vmapped one-update results;
* the per-micro-step loss log is reconstructed exactly: within a window the
  sequential losses are ``loss(flip_i)`` — a 2-way select.

Measured on the TPU chip: 2.8 ms/micro-step vs 9.7 sequential at 480p (3.4x);
a trailing ``n_steps % n`` partial window runs forward-only (stats + losses),
matching MultiSteps' never-applied trailing accumulation.

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


def window_step_fns(model, optimizer, n_acc: int,
                    bn_momentum: Optional[float] = None,
                    apply_fn=None):
    """Build the batched-accumulation-window step (and its trailing-partial
    variant) shared by :class:`OnlineFinetuner` and the sequence fan-out.

    The {orig, flipped} pair is ``vmap``-ed over the model, so each sample
    computes its OWN batch-1 BN statistics — exactly the micro-step
    semantics (pooled batch-2 stats would differ: a conv of the flipped
    input is not a permutation of the original's features). XLA still
    batches the convolutions across the pair. The math is identical to the
    sequential loop; only float reduction order differs (parity-tested at
    rtol ~1e-4 on params; running stats ~2e-3 because the EMA replay
    reconstructs batch stats as ``old + (new-old)/momentum`` — a 10x
    amplification of one update's rounding).

    Both returned functions map
    ``carry=(params, batch_stats, opt_state, key), x2 (2,H,W,3), g2 (2,H,W,1)``
    to ``(carry, per_micro_step_losses)``; ``partial_step`` additionally takes
    the static remainder length r and applies no optimizer update (MultiSteps
    semantics for trailing micro-steps).

    ``bn_momentum`` must match the model's BatchNorm momentum (the EMA
    replay divides by it); defaults to the zoo-wide
    :data:`fosvos_tpu.models.common.BN_MOMENTUM`.

    ``apply_fn``: optional ``model.apply`` drop-in (same signature) — e.g.
    the fake-quantized forward from ``compress.qat.make_apply`` so the
    adaptation trains through the int8 serving numerics.
    """
    if bn_momentum is None:
        from fosvos_tpu.models.common import BN_MOMENTUM
        bn_momentum = BN_MOMENTUM
    apply = apply_fn if apply_fn is not None else model.apply

    def window_loss(pp, batch_stats, x2, g2, wts):
        def single(x1, g1):
            outs, mut = apply(
                {'params': pp, 'batch_stats': batch_stats}, x1,
                train=True, mutable=['batch_stats'])
            return online_loss(outs, g1), mut['batch_stats']

        losses, stats2 = jax.vmap(single)(x2[:, None], g2[:, None])
        return jnp.sum(losses * wts), (stats2, losses)

    def ordered_ema(old, stats2, flips):
        # Recover each sample's batch stats m from its one-update result
        # (new = old + a*(m-old)), then replay the window's running-stat
        # EMA in flip order — exactly the sequential updates.
        a = bn_momentum

        def leaf(o, n2):
            m = o + (n2 - o) / a          # (2, ...) per-sample stats
            ra = o
            for i in range(flips.shape[0]):
                mi = jnp.where(flips[i], m[1], m[0])
                ra = (1.0 - a) * ra + a * mi
            return ra

        return jax.tree.map(leaf, old, stats2)

    def window_step(carry, x2, g2):
        p, batch_stats, opt_state, key = carry
        key, k_flip = jax.random.split(key)
        flips = jax.random.bernoulli(k_flip, shape=(n_acc,))
        k = jnp.sum(flips.astype(jnp.float32))
        wts = jnp.stack([(n_acc - k) / n_acc, k / n_acc])
        (_, (stats2, pair)), grads = jax.value_and_grad(
            window_loss, has_aux=True)(p, batch_stats, x2, g2, wts)
        new_stats = ordered_ema(batch_stats, stats2, flips)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        step_losses = jnp.where(flips, pair[1], pair[0])  # (n_acc,)
        return (p, new_stats, opt_state, key), step_losses

    def partial_step(carry, x2, g2, r):
        # trailing partial window: its accumulated gradients never reach
        # an optimizer step (MultiSteps semantics), but BN stats and the
        # loss log still advance r micro-steps
        p, batch_stats, opt_state, key = carry
        key, k_flip = jax.random.split(key)
        flips = jax.random.bernoulli(k_flip, shape=(r,))
        _, (stats2, pair) = window_loss(
            p, batch_stats, x2, g2, jnp.zeros((2,)))
        new_stats = ordered_ema(batch_stats, stats2, flips)
        losses = jnp.where(flips, pair[1], pair[0])
        return (p, new_stats, opt_state, key), losses

    return window_step, partial_step


class OnlineFinetuner:
    """Reusable compiled one-shot adapter.

    Default preset = reference production variant 11 (Adam 1e-4, wd 2e-4 —
    ``network_provider.py:480-481``, path stems in ``train_online.py:136``).
    """

    def __init__(self, model, preset: Optional[optimizers.Preset] = None,
                 avg_grad_every_n: int = 5,
                 example_params: Optional[Any] = None,
                 window_batch: bool = True,
                 mesh=None,
                 apply_fn=None):
        """``apply_fn``: optional ``model.apply`` drop-in the train steps
        call instead (e.g. ``compress.qat.make_apply`` — adapt through the
        int8 serving numerics). Must accept
        ``(variables, x, train=, mutable=)``.

        ``mesh``: optional ``jax.sharding.Mesh`` to cut ONE sequence's
        adaptation latency across chips (the fan-out scales *throughput*
        over sequences; this shards a single adaptation): the window's
        {orig, flipped} pair over a ``data`` axis and/or the frame height
        over a ``spatial`` axis — params replicated, GSPMD inserts the
        gradient all-reduce and conv halo exchanges. Batched-window mode
        only; a ``data`` axis size must divide 2."""
        self.model = model
        self.preset = preset or optimizers.online_variant(11)
        self.avg_grad_every_n = avg_grad_every_n
        self.window_batch = window_batch and avg_grad_every_n > 1
        self.mesh = mesh
        self.apply_fn = apply_fn
        if mesh is not None and not self.window_batch:
            raise ValueError('mesh sharding requires window_batch mode')
        if mesh is not None and 'data' in mesh.axis_names \
                and 2 % mesh.shape['data']:
            raise ValueError("the window pair has 2 samples; 'data' axis "
                             'size must divide 2')
        self._example_params = example_params
        self._optimizer = None
        self._run_chunk = None
        self._run_windows = None
        self._run_partial = None

    def _build_sequential(self, params):
        base_opt = optimizers.make_optimizer(self.preset, params)
        optimizer = optax.MultiSteps(base_opt,
                                     every_k_schedule=self.avg_grad_every_n)
        model = self.model
        apply = self.apply_fn if self.apply_fn is not None else model.apply

        def step(carry, images, gts):
            p, batch_stats, opt_state, key = carry
            key, k_flip = jax.random.split(key)
            flip = jax.random.bernoulli(k_flip).astype(jnp.int32)
            imgs, g = transforms.device_flip(images, gts, flip)

            def loss_fn(pp):
                outs, mut = apply(
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

    def _build_batched(self, params):
        """Batched-accumulation-window step (see :func:`window_step_fns`)."""
        optimizer = optimizers.make_optimizer(self.preset, params)
        window_step, partial_step = window_step_fns(
            self.model, optimizer, self.avg_grad_every_n,
            apply_fn=self.apply_fn)

        jit_kwargs = dict(static_argnums=(3,), donate_argnums=(0,))
        self._pair_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from fosvos_tpu.parallel.mesh import pin_correct_partitioner
            pin_correct_partitioner()  # Shardy grad bug — see mesh.py
            data_ax = 'data' if 'data' in self.mesh.axis_names else None
            spatial_ax = ('spatial' if 'spatial' in self.mesh.axis_names
                          else None)
            self._pair_sharding = NamedSharding(self.mesh,
                                                P(data_ax, spatial_ax))
            replicated = NamedSharding(self.mesh, P())
            # carry (params/stats/opt_state/key) replicated; the pair and
            # the per-window losses sharded
            jit_kwargs.update(
                in_shardings=(replicated, self._pair_sharding,
                              self._pair_sharding),
                out_shardings=(replicated, replicated))

        @functools.partial(jax.jit, **jit_kwargs)
        def run_windows(carry, x2, g2, n_windows):
            carry, losses = jax.lax.scan(
                lambda c, _: window_step(c, x2, g2), carry, None,
                length=n_windows)
            return carry, losses.reshape(-1)

        @functools.partial(jax.jit, **jit_kwargs)
        def run_partial(carry, x2, g2, r):
            return partial_step(carry, x2, g2, r)

        self._optimizer = optimizer
        self._run_windows = run_windows
        self._run_partial = run_partial

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
            (A/B experiments). In ``window_batch`` mode each chunk is split
            into full accumulation windows plus a forward-only remainder, so
            pass window-aligned chunk lengths for exact MultiSteps parity.
        """
        if self._run_chunk is None and self._run_windows is None:
            if self.window_batch:
                self._build_batched(variables['params'])
            else:
                self._build_sequential(variables['params'])

        rng = np.random.RandomState(seed)
        align = self.avg_grad_every_n if self.window_batch else 1
        if schedule is not None:
            schedule = list(schedule)
            n_epochs = sum(n for _, n in schedule)
        elif augment:
            schedule = transforms.scale_schedule(n_epochs, rng, scales,
                                                 align=align)
        else:
            schedule = [(1.0, n_epochs)]
        pairs = _scaled_pairs(image, gt, sorted({s for s, _ in schedule}),
                              batched=self.window_batch)
        if getattr(self, '_pair_sharding', None) is not None:
            pairs = {s: (jax.device_put(x, self._pair_sharding),
                         jax.device_put(g, self._pair_sharding))
                     for s, (x, g) in pairs.items()}

        # run_chunk donates its carry for in-place updates on TPU; copy the
        # caller's variables so they survive repeated finetune() calls.
        state = create_state(jax.tree.map(jnp.copy, variables),
                             self._optimizer)
        carry = (state.params, state.batch_stats, state.opt_state,
                 jax.random.PRNGKey(seed))

        t0 = time.perf_counter()
        all_losses: List[jax.Array] = []
        for scale, n in schedule:
            images, gts = pairs[scale]
            if self.window_batch:
                n_w, r = divmod(n, self.avg_grad_every_n)
                if n_w:
                    carry, losses = self._run_windows(carry, images, gts, n_w)
                    all_losses.append(losses)
                if r:
                    carry, losses = self._run_partial(carry, images, gts, r)
                    all_losses.append(losses)
            else:
                carry, losses = self._run_chunk(carry, images, gts, n)
                all_losses.append(losses)
        # one device-side concat + ONE host readback: per-chunk np.asarray
        # would be ~200 small D2H round trips (~9 s behind the tunnel), and
        # the readback doubles as the completion fence (block_until_ready
        # does not reliably block on the tunneled backend — the readback of
        # the last program's output does, since programs execute in order)
        losses_np = np.asarray(jnp.concatenate(all_losses))
        wall = time.perf_counter() - t0

        params, batch_stats, opt_state, _ = carry
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state,
                           step=jnp.asarray(n_epochs, jnp.int32))
        return OnlineResult(state=state, losses=losses_np,
                            wall_time_s=wall, n_steps=n_epochs)


def _scaled_pairs(image: np.ndarray, gt: np.ndarray,
                  scales: Sequence[float], batched: bool = False):
    """Host-side: the frame at each train scale (cubic img / nearest mask,
    custom_transforms.py:72-92). With ``batched``, each entry is the
    {orig, flipped} pair stacked on the batch axis for the window step."""
    out = {}
    for s in scales:
        samp = transforms.resize({'image': image, 'gt': gt}, s)
        img = samp['image'][None]                       # (1,H,W,3)
        g = samp['gt'][None, ..., None]                 # (1,H,W,1)
        if batched:
            img = np.concatenate([img, img[:, :, ::-1]])
            g = np.concatenate([g, g[:, :, ::-1]])
        out[s] = (jnp.asarray(img), jnp.asarray(g))
    return out


def finetune(model, variables, image, gt,
             preset: Optional[optimizers.Preset] = None,
             n_epochs: int = 10000, avg_grad_every_n: int = 5,
             scales: Sequence[float] = transforms.TRAIN_SCALES,
             augment: bool = True, seed: int = 0,
             window_batch: bool = True) -> OnlineResult:
    """One-off convenience wrapper around :class:`OnlineFinetuner`."""
    tuner = OnlineFinetuner(model, preset, avg_grad_every_n,
                            window_batch=window_batch)
    return tuner.finetune(variables, image, gt, n_epochs=n_epochs,
                          scales=scales, augment=augment, seed=seed)
