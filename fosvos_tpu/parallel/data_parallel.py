"""Data-parallel (and optionally spatially-partitioned) offline training.

The reference has no distributed training (SURVEY.md §2); its offline loop is
one GPU, batch 1. Here the same jitted train step runs over a
``jax.sharding.Mesh``: the batch axis (and optionally the image H axis) is
sharded, params/optimizer state are replicated, and XLA/GSPMD inserts the
gradient all-reduce over ICI — no hand-written collectives.

BatchNorm note: batch statistics are computed by ``jnp.mean`` over the global
(sharded) batch, so under the mesh this is synchronized cross-replica BN —
strictly better-behaved than per-replica stats, and identical to single-device
semantics.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fosvos_tpu.train import optimizers
from fosvos_tpu.train.losses import deep_supervision_loss
from fosvos_tpu.train.state import TrainState, create_state


class ShardedOfflineTrainer:
    """Offline train step compiled over a mesh.

    ``mesh`` must have a ``data`` axis; if it also has a ``spatial`` axis the
    image H dimension is partitioned across it (GSPMD spatial convolution).
    """

    def __init__(self, model, mesh: Mesh,
                 preset: Optional[optimizers.Preset] = None,
                 avg_grad_every_n: int = 10,
                 shard_spatial: bool = False,
                 device_preprocess: bool = False,
                 meanval=None):
        from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
        self.model = model
        self.mesh = mesh
        self.preset = preset or optimizers.Preset()
        self.avg_grad_every_n = avg_grad_every_n
        self.shard_spatial = shard_spatial and 'spatial' in mesh.axis_names
        # uint8 transfer format: normalization (davis_2016.py:127-132) runs
        # on device, sharded like the batch — same contract as the
        # single-device OfflineTrainer(device_preprocess=True)
        self.device_preprocess = device_preprocess
        self.meanval = jnp.asarray(meanval if meanval is not None
                                   else DAVIS_MEAN_BGR, jnp.float32)
        self._optimizer = None
        self._train_step = None
        self._eval_step = None

    @property
    def batch_sharding(self) -> NamedSharding:
        if self.shard_spatial:
            return NamedSharding(self.mesh, P('data', 'spatial'))
        return NamedSharding(self.mesh, P('data'))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def init_state(self, variables) -> TrainState:
        if self._optimizer is None:
            self._build(variables['params'])
        state = create_state(variables, self._optimizer)
        return jax.device_put(state, self.replicated)

    def _build(self, params):
        base_opt = optimizers.make_optimizer(self.preset, params)
        optimizer = optax.MultiSteps(base_opt,
                                     every_k_schedule=self.avg_grad_every_n)
        model = self.model
        repl, bsh = self.replicated, self.batch_sharding
        mean = self.meanval
        device_preprocess = self.device_preprocess

        def _normalize(images, gts):
            if device_preprocess:
                images = images.astype(jnp.float32) - mean
                gts = gts.astype(jnp.float32)
                gmax = jnp.maximum(
                    jnp.max(gts, axis=(1, 2, 3), keepdims=True), 1e-8)
                gts = gts / gmax
            return images, gts

        def step(state: TrainState, images, gts, epoch_frac):
            images, gts = _normalize(images, gts)

            def loss_fn(p):
                outs, mut = model.apply(
                    {'params': p, 'batch_stats': state.batch_stats}, images,
                    train=True, mutable=['batch_stats'])
                total, losses = deep_supervision_loss(outs, gts, epoch_frac)
                return total, (mut['batch_stats'], losses)

            (_, (new_stats, losses)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params2 = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=params2, batch_stats=new_stats,
                                   opt_state=opt_state, step=state.step + 1)
            return new_state, jnp.stack(losses)

        def eval_step(params, batch_stats, images, gts):
            images, gts = _normalize(images, gts)
            outs = model.apply({'params': params, 'batch_stats': batch_stats},
                               images, train=False)
            _, losses = deep_supervision_loss(outs, gts, jnp.asarray(0.0))
            return jnp.stack(losses)

        self._optimizer = optimizer
        self._train_step = jax.jit(
            step,
            in_shardings=(repl, bsh, bsh, None),
            out_shardings=(repl, repl),
        )
        self._eval_step = jax.jit(
            eval_step,
            in_shardings=(repl, repl, bsh, bsh),
            out_shardings=repl,
        )

    def train_step(self, state, images, gts, epoch_frac):
        images = jax.device_put(jnp.asarray(images), self.batch_sharding)
        gts = jax.device_put(jnp.asarray(gts), self.batch_sharding)
        return self._train_step(state, images, gts,
                                jnp.asarray(epoch_frac, jnp.float32))

    def eval_step(self, state, images, gts):
        """Sharded test-while-training loss pass (train_offline.py:115-136)."""
        images = jax.device_put(jnp.asarray(images), self.batch_sharding)
        gts = jax.device_put(jnp.asarray(gts), self.batch_sharding)
        return self._eval_step(state.params, state.batch_stats, images, gts)
