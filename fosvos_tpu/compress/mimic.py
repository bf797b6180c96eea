"""Mimic / knowledge distillation of slimmed OSVOS students.

Rebuild of ``src/mimic.py``: a width-scaled student
(``OSVOS_RESNET(scale_down_exponent=k)``, widths /2^k — ``mimic.py:70``)
learns from a trained teacher's five output maps (or from ground truth):

* loss per output: MSE (sum) | L1 (sum) | CB-BCE (``mimic.py:76-85``);
  teacher outputs are detached (``mimic.py:211`` → ``stop_gradient``).
  NB: with CBCEL-from-teacher, the reference thresholds the *teacher logits*
  at 0.5 (CB-BCE's label binarization) — reproduced as-is.
* epoch-annealed deep supervision exactly like offline training
  (``mimic.py:217``): total = (1 - epoch/n_epochs)·Σ(side) + fuse.
* Adam lr 1e-3, wd 2e-4, grad step every 5 (``mimic.py:74,159``).
* teacher runs in train mode during training (``mimic.py:67,148-149``):
  batch statistics, running stats discarded.

TPU-native: teacher+student forward, loss, and update are one jitted step;
the teacher's params are donated to device once.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fosvos_tpu.core.ops import class_balanced_cross_entropy_loss
from fosvos_tpu.train import optimizers
from fosvos_tpu.train.state import TrainState, create_state

CRITERIA = ('MSE', 'L1', 'CBCEL')


def _criterion_fn(name: str):
    if name == 'MSE':
        return lambda o, t: jnp.sum(jnp.square(o - t))
    if name == 'L1':
        return lambda o, t: jnp.sum(jnp.abs(o - t))
    if name == 'CBCEL':
        return lambda o, t: class_balanced_cross_entropy_loss(o, t)
    raise ValueError('Unknown loss function')


class MimicTrainer:
    """Distills ``student_model`` from ``teacher_model`` (or ground truth)."""

    def __init__(self, student_model, teacher_model=None,
                 criterion: str = 'CBCEL', learn_from: str = 'teacher',
                 learning_rate: float = 1e-3, avg_grad_every_n: int = 5,
                 student_apply_fn=None):
        """``student_apply_fn``: optional ``student_model.apply`` drop-in
        for the student's forward (e.g. ``compress.qat.make_apply`` —
        distill INTO the int8 serving numerics); the teacher stays float."""
        if learn_from not in ('teacher', 'ground_truth'):
            raise ValueError(learn_from)
        if learn_from == 'teacher' and teacher_model is None:
            raise ValueError('teacher_model required for learn_from=teacher')
        self.student_model = student_model
        self.student_apply_fn = student_apply_fn
        self.teacher_model = teacher_model
        self.learn_from = learn_from
        self.criterion = criterion
        self.avg_grad_every_n = avg_grad_every_n
        self.preset = optimizers.Preset(family='adam', lr=learning_rate,
                                        weight_decay=2e-4, grouped=False)
        self._optimizer = None
        self._train_step = None
        self._eval_step = None

    def init_state(self, student_variables) -> TrainState:
        if self._optimizer is None:
            self._build(student_variables['params'])
        return create_state(student_variables, self._optimizer)

    def _targets(self, teacher_variables, images, gts):
        if self.learn_from == 'teacher':
            outs, _ = self.teacher_model.apply(
                teacher_variables, images, train=True,
                mutable=['batch_stats'])
            return [jax.lax.stop_gradient(o) for o in outs]
        return [gts] * 5

    def _build(self, params):
        base_opt = optimizers.make_optimizer(self.preset, params)
        optimizer = optax.MultiSteps(base_opt,
                                     every_k_schedule=self.avg_grad_every_n)
        student = self.student_model
        crit = _criterion_fn(self.criterion)
        targets = self._targets

        # single source for the distillation step — shared with the
        # resident engine (same signature: state, teacher_vars, batch, frac)
        train_step = jax.jit(_mimic_step_fn(
            self.student_model, self.teacher_model, optimizer,
            self.criterion, self.learn_from,
            student_apply_fn=self.student_apply_fn))
        sapply = (self.student_apply_fn if self.student_apply_fn is not None
                  else student.apply)

        @jax.jit
        def eval_step(state: TrainState, teacher_variables, images, gts,
                      epoch_frac):
            ts = targets(teacher_variables, images, gts)
            outs = sapply(
                {'params': state.params, 'batch_stats': state.batch_stats},
                images, train=False)
            losses = [crit(o, t) for o, t in zip(outs, ts)]
            return (1.0 - epoch_frac) * sum(losses[:-1]) + losses[-1]

        self._optimizer = optimizer
        self._train_step = train_step
        self._eval_step = eval_step

    def train_step(self, state, teacher_variables, images, gts, epoch_frac):
        return self._train_step(state, teacher_variables,
                                jnp.asarray(images), jnp.asarray(gts),
                                jnp.asarray(epoch_frac, jnp.float32))

    def eval_loss(self, state, teacher_variables, images, gts, epoch_frac=0.0):
        return self._eval_step(state, teacher_variables, jnp.asarray(images),
                               jnp.asarray(gts),
                               jnp.asarray(epoch_frac, jnp.float32))


@dataclasses.dataclass
class MimicResult:
    state: TrainState
    train_losses: List[float]
    val_losses: List[float]


def _mimic_step_fn(student_model, teacher_model, optimizer, criterion: str,
                   learn_from: str, student_apply_fn=None):
    """The distillation train step as a ChunkEngine step function
    (ctx = teacher variables; aux = scalar loss).

    ``student_apply_fn``: optional student forward override (QAT)."""
    crit = _criterion_fn(criterion)
    sapply = (student_apply_fn if student_apply_fn is not None
              else student_model.apply)

    def step(state: TrainState, teacher_variables, imgs, gts, epoch_frac):
        if learn_from == 'teacher':
            outs_t, _ = teacher_model.apply(teacher_variables, imgs,
                                            train=True,
                                            mutable=['batch_stats'])
            ts = [jax.lax.stop_gradient(o) for o in outs_t]
        else:
            ts = [gts] * 5

        def loss_fn(p):
            outs, mut = sapply(
                {'params': p, 'batch_stats': state.batch_stats}, imgs,
                train=True, mutable=['batch_stats'])
            losses = [crit(o, t) for o, t in zip(outs, ts)]
            total = (1.0 - epoch_frac) * sum(losses[:-1]) + losses[-1]
            return total, mut['batch_stats']

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1), loss

    return step


def train_mimic_resident(student_model, student_variables,
                         teacher_model, teacher_variables, dataset,
                         val_batches_fn=None,
                         n_epochs: int = 200,
                         criterion: str = 'CBCEL',
                         learn_from: str = 'teacher',
                         learning_rate: float = 1e-3,
                         avg_grad_every_n: int = 5,
                         validate_every_n: int = 10,
                         snapshot_every_n: int = 50,
                         snapshot_fn=None, summary_writer=None,
                         seed: int = 0, chunk_steps: int = 50,
                         student_apply_fn=None,
                         batch_size: int = 1
                         ) -> MimicResult:
    """:func:`train_mimic` with the train split resident in HBM
    (``train/resident.py`` engine): teacher+student steps run as compiled
    chunk scans over device-gathered, device-augmented frames — for the
    offline distillation sweep this removes the per-step H2D transfer the
    same way it does for parent training (BENCHMARKS.md). Same reference
    semantics, scalar tags, and cadences as :func:`train_mimic`.

    ``batch_size > 1`` batches the distillation step exactly like the
    parent trainer's ``--batch-size`` (the same backward-bound step gains
    MXU efficiency up to the b128 knee, BENCHMARKS.md "What binds the
    batched resident step"). Documented deviation, mirroring the parent
    trainer's: both the student's BN batch statistics AND the teacher's
    train-mode forward (the reference runs the teacher in train mode,
    ``mimic.py:48``) see batch moments over ``batch_size`` frames instead
    of 1, so distillation targets are not bit-identical to the b1 sweep.
    The reference's own setting is batch 1."""
    from fosvos_tpu.train import resident

    # single optimizer source: MimicTrainer owns the distillation preset
    # (adam lr/wd, reference mimic.py:74,231); duplicating it here would let
    # the two sweeps silently diverge
    trainer = MimicTrainer(student_model, teacher_model, criterion,
                           learn_from, learning_rate, avg_grad_every_n,
                           student_apply_fn=student_apply_fn)
    base = optimizers.make_optimizer(trainer.preset,
                                     student_variables['params'])
    optimizer = optax.MultiSteps(base, every_k_schedule=avg_grad_every_n)
    state = create_state(student_variables, optimizer)

    engine = resident.ChunkEngine(
        _mimic_step_fn(student_model, teacher_model, optimizer, criterion,
                       learn_from, student_apply_fn=student_apply_fn),
        meanval=dataset.meanval)
    d_imgs, d_gts = resident.upload(dataset)
    rng = np.random.RandomState(seed)

    # validation reuses the per-batch eval step (small + infrequent)
    eval_trainer = None
    if val_batches_fn is not None:
        eval_trainer = trainer
        eval_trainer._build(student_variables['params'])

    train_losses: List[float] = []
    val_losses: List[float] = []
    for epoch in range(1, n_epochs + 1):
        epoch_frac = epoch / n_epochs
        idxs, flips, schedule = resident.epoch_plan(
            len(dataset), batch_size, rng, augment=True,
            chunk_steps=chunk_steps)
        state, auxes = engine.run_epoch(state, teacher_variables,
                                        d_imgs, d_gts, idxs, flips,
                                        schedule, epoch_frac)
        arr = np.concatenate([np.asarray(a).reshape(-1) for a in auxes]) \
            if auxes else np.zeros(0)
        n = len(arr)
        mean = float(arr.mean()) if n else 0.0
        train_losses.append(mean)
        if summary_writer is not None:
            for i in range(avg_grad_every_n - 1, n, avg_grad_every_n):
                summary_writer.add_scalar('total_loss_iter', float(arr[i]),
                                          i + n * epoch)
            summary_writer.add_scalar('total_loss_epoch', mean, epoch)
            summary_writer.add_scalar('train/loss', mean, epoch)

        if eval_trainer is not None and epoch % validate_every_n == 0:
            st = TrainState(params=state.params,
                            batch_stats=state.batch_stats,
                            opt_state=None, step=state.step)
            vlosses = [eval_trainer.eval_loss(st, teacher_variables,
                                              images, gts, epoch_frac)
                       for images, gts in val_batches_fn()]
            vmean = (float(np.asarray(jnp.stack(vlosses)).mean())
                     if vlosses else 0.0)
            val_losses.append(vmean)
            if summary_writer is not None:
                summary_writer.add_scalar('val/loss', vmean, epoch)

        if snapshot_fn is not None and epoch % snapshot_every_n == 0:
            snapshot_fn(epoch, state)

    return MimicResult(state=state, train_losses=train_losses,
                       val_losses=val_losses)


def train_mimic(student_model, student_variables,
                teacher_model, teacher_variables,
                train_batches_fn: Callable[[], Any],
                val_batches_fn: Optional[Callable[[], Any]] = None,
                n_epochs: int = 200,
                criterion: str = 'CBCEL', learn_from: str = 'teacher',
                learning_rate: float = 1e-3,
                validate_every_n: int = 10,
                snapshot_every_n: int = 50,
                snapshot_fn: Optional[Callable[[int, TrainState], None]] = None,
                summary_writer=None,
                student_apply_fn=None
                ) -> MimicResult:
    """Reference mimic loop (mimic.py:91-109): train epochs with annealed
    deep supervision, validate every 10, snapshot every 50.

    ``summary_writer`` (optional, tensorboardX-like) receives the
    reference's scalar tags (``mimic.py:169,182,188``): ``total_loss_epoch``
    and ``train/loss`` per epoch, ``total_loss_iter`` at every optimizer
    step, ``val/loss`` per validation pass. Per-step losses stay
    device-resident and are read back ONCE per epoch (stacked), then the
    per-step scalars are emitted from the host array — no per-step D2H
    round trips behind a high-latency link."""
    trainer = MimicTrainer(student_model, teacher_model, criterion,
                           learn_from, learning_rate,
                           student_apply_fn=student_apply_fn)
    state = trainer.init_state(student_variables)
    every_n = trainer.avg_grad_every_n

    train_losses: List[float] = []
    val_losses: List[float] = []
    for epoch in range(1, n_epochs + 1):
        epoch_frac = epoch / n_epochs
        step_losses = []
        for images, gts in train_batches_fn():
            state, loss = trainer.train_step(state, teacher_variables,
                                             images, gts, epoch_frac)
            step_losses.append(loss)
        arr = (np.asarray(jnp.stack(step_losses)) if step_losses
               else np.zeros(0))
        n = len(arr)
        mean = float(arr.mean()) if n else 0.0
        train_losses.append(mean)
        if summary_writer is not None:
            # reference mimic.py:182: one scalar per optimizer step, global
            # index = minibatch index + n_samples * epoch
            for i in range(every_n - 1, n, every_n):
                summary_writer.add_scalar('total_loss_iter', float(arr[i]),
                                          i + n * epoch)
            summary_writer.add_scalar('total_loss_epoch', mean, epoch)
            summary_writer.add_scalar('train/loss', mean, epoch)

        if val_batches_fn is not None and epoch % validate_every_n == 0:
            vlosses = [trainer.eval_loss(state, teacher_variables,
                                         images, gts, epoch_frac)
                       for images, gts in val_batches_fn()]
            vmean = (float(np.asarray(jnp.stack(vlosses)).mean())
                     if vlosses else 0.0)
            val_losses.append(vmean)
            if summary_writer is not None:
                summary_writer.add_scalar('val/loss', vmean, epoch)

        if snapshot_fn is not None and epoch % snapshot_every_n == 0:
            snapshot_fn(epoch, state)

    return MimicResult(state=state, train_losses=train_losses,
                       val_losses=val_losses)
