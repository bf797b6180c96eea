"""Iterative Taylor-criterion channel pruning, TPU-native.

Rebuild of the reference pipeline (``src/prune.py``, Molchanov et al. —
"Pruning CNNs for Resource Efficient Inference"): iteratively (1) rank every
prunable channel by the Taylor criterion |Σ activation·gradient|, (2) remove
the globally lowest-ranked channels, (3) fine-tune (Adam 1e-4 wd 2e-4), and
snapshot + speed-test at each 10%-pruned checkpoint (``prune.py:552-640``).

TPU-first redesign (vs 185 lines of nn.Module surgery, ``prune.py:297-481``):

* **Ranking is a gradient.** The model multiplies optional per-site channel
  masks into the forward pass (post-BN / post-residual-add); with masks == 1,
  ``d loss / d mask[site][c] = Σ_{b,h,w} act_c · grad_c`` — the Taylor
  numerator — so ranking = one ``jax.grad`` w.r.t. the masks. No hook
  machinery (``prune.py:83-178``). The reference's division by B·H·W is a
  per-layer constant and cancels in the per-layer L2 normalization
  (``prune.py:180-188``), so it is omitted.
* **Pruning = zeroing a mask bit.** All shapes stay static, so the whole
  rank→prune→fine-tune loop reuses ONE compiled step (the reference
  re-builds modules and reallocates every iteration).
* **Materialization is functional.** At each checkpoint the mask config is
  turned into a smaller :class:`~fosvos_tpu.models.arch.ResNetArch` plus a
  gathered param pytree. Where the surviving residual channel sets diverge,
  an identity-gather 1x1 downsample is synthesized (the reference inserts a
  *randomly initialized* downsample there, ``prune.py:369-374,484-487``,
  destroying function preservation; the gather version is exact).

Semantics notes vs the reference, documented deviations:
* masks sit post-BN (conv1/conv2 sites) or post-residual-add (block output),
  i.e. they measure the effect of removing the channel *as it would actually
  be removed*; the reference hooks raw conv outputs pre-BN.
* the reference's ``prune_batchnorm`` drops BN bias and running stats on every
  prune (``prune.py:517-528``, a bug — fine-tune re-learns them); here all BN
  state is gathered.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fosvos_tpu.core.ops import class_balanced_cross_entropy_loss
from fosvos_tpu.models.arch import BlockWidths, ResNetArch
from fosvos_tpu.train import optimizers
from fosvos_tpu.train.state import TrainState, create_state

# reference prune.py:30
N_MIN_CHANNELS = 4

Masks = Dict[str, jax.Array]


def _n_convs(arch: ResNetArch) -> int:
    return {'basic': 2, 'bottleneck': 3}[arch.block]


def mask_sites(arch: ResNetArch) -> Dict[str, int]:
    """Prunable sites -> width. Matches the reference's prunable set
    (layer_base conv + every block conv, ``prune.py:46-56,94-145``); block
    output sites prune the residual stream like the reference's conv2 case."""
    sites = {'base': arch.base_out}
    for i, stage in enumerate(arch.stages):
        for j, bw in enumerate(stage):
            prefix = f'stage{i}_block{j}'
            for c in range(len(bw.convs) - 1):
                sites[f'{prefix}/conv{c + 1}'] = bw.convs[c]
            sites[f'{prefix}/out'] = bw.out
    return sites


def init_masks(arch: ResNetArch) -> Masks:
    return {k: jnp.ones((w,), jnp.float32)
            for k, w in mask_sites(arch).items()}


def total_filters(masks: Masks) -> int:
    return int(sum(m.size for m in masks.values()))


def remaining_filters(masks: Masks) -> int:
    return int(sum(float(m.sum()) for m in masks.values()))


# ---------------------------------------------------------------------------
# Ranking
# ---------------------------------------------------------------------------

class TaylorRanker:
    """Accumulates Taylor scores as gradients w.r.t. the channel masks."""

    def __init__(self, model, is_offline: bool):
        self.model = model
        self.is_offline = is_offline

        def loss_of_masks(masks, params, batch_stats, images, gts):
            outs, _ = model.apply(
                {'params': params, 'batch_stats': batch_stats}, images,
                train=True, mutable=['batch_stats'], channel_masks=masks)
            if is_offline:
                # prune.py:240-243: plain sum of all five CB-BCE losses
                losses = [class_balanced_cross_entropy_loss(
                    o, gts, size_average=False) for o in outs]
                return sum(losses)
            return class_balanced_cross_entropy_loss(outs[-1], gts,
                                                     size_average=False)

        self._grad_fn = jax.jit(jax.value_and_grad(loss_of_masks))
        self._loss_of_masks = loss_of_masks
        self._scan_fn = None
        # device-resident loss of the last rank() pass (for the reference's
        # train_pruning/loss scalar, prune.py:251) and its batch count
        self.last_loss_sum = None
        self.last_n_batches = 0

    def rank(self, variables, masks: Masks, batches) -> Masks:
        """Signed Taylor scores accumulated over batches
        (``filter_ranks[i] += values``, prune.py:173-177).

        Batches are grouped by shape — the multi-scale augmented ranking
        distribution {0.5, 0.8, 1} x flip (the reference ranks over the full
        augmented loader, prune.py:226-251) yields three static shapes —
        and each group's accumulation runs as ONE compiled ``lax.scan`` on
        device: one dispatch per scale bucket per ranking pass, one compile
        per scale for the whole prune run (mask gradients are summed across
        groups, which is order-independent)."""
        batches = [(np.asarray(i), np.asarray(g)) for i, g in batches]
        groups: Dict[tuple, list] = {}
        for i, g in batches:
            groups.setdefault((i.shape, g.shape), []).append((i, g))

        if self._scan_fn is None:
            loss_of_masks = self._loss_of_masks

            @jax.jit
            def rank_scan(masks, params, stats, imgs_k, gts_k):
                def body(acc, xy):
                    img, gt = xy
                    acc_g, acc_l = acc
                    l, g = jax.value_and_grad(loss_of_masks)(
                        masks, params, stats, img, gt)
                    return (jax.tree.map(jnp.add, acc_g, g), acc_l + l), None

                acc0 = (jax.tree.map(jnp.zeros_like, masks),
                        jnp.zeros((), jnp.float32))
                (acc, loss_sum), _ = jax.lax.scan(body, acc0,
                                                  (imgs_k, gts_k))
                return acc, loss_sum

            self._scan_fn = rank_scan

        ranks = {k: jnp.zeros_like(m) for k, m in masks.items()}
        loss_sum = jnp.zeros((), jnp.float32)
        for group in groups.values():
            if len(group) > 1:
                imgs = jnp.asarray(np.stack([i for i, _ in group]))
                gts = jnp.asarray(np.stack([g for _, g in group]))
                r, l = self._scan_fn(masks, variables['params'],
                                     variables['batch_stats'], imgs, gts)
            else:
                l, r = self._grad_fn(masks, variables['params'],
                                     variables['batch_stats'],
                                     jnp.asarray(group[0][0]),
                                     jnp.asarray(group[0][1]))
            ranks = {k: ranks[k] + r[k] for k in ranks}
            loss_sum = loss_sum + l
        self.last_loss_sum = loss_sum
        self.last_n_batches = len(batches)
        return ranks


def normalize_ranks(ranks: Masks) -> Dict[str, np.ndarray]:
    """Per-layer |v| / ||v||_2 (reference prune.py:180-188)."""
    out = {}
    for k, v in ranks.items():
        v = np.abs(np.asarray(v, np.float64))
        div = np.sqrt((v * v).sum())
        out[k] = v / div if div >= 1e-5 else v
    return out


def pruning_plan(ranks: Dict[str, np.ndarray], masks: Masks,
                 n_to_prune: int) -> List[Tuple[str, int]]:
    """Globally lowest-ranked *live* channels; sites at or below
    N_MIN_CHANNELS live channels are skipped (prune.py:100-101,190-200)."""
    candidates = []
    for site in sorted(ranks):
        live = np.asarray(masks[site]) > 0
        if live.sum() <= N_MIN_CHANNELS:
            continue
        for c in np.nonzero(live)[0]:
            candidates.append((ranks[site][c], site, int(c)))
    candidates.sort(key=lambda t: t[0])

    plan: List[Tuple[str, int]] = []
    budget: Dict[str, int] = {}
    for _, site, c in candidates:
        live_now = int(np.asarray(masks[site]).sum()) - budget.get(site, 0)
        if live_now <= N_MIN_CHANNELS:
            continue
        plan.append((site, c))
        budget[site] = budget.get(site, 0) + 1
        if len(plan) == n_to_prune:
            break
    return plan


def apply_plan(masks: Masks, plan: Sequence[Tuple[str, int]]) -> Masks:
    masks = dict(masks)
    for site, c in plan:
        masks[site] = masks[site].at[c].set(0.0)
    return masks


# ---------------------------------------------------------------------------
# Masked fine-tuning
# ---------------------------------------------------------------------------

class MaskedFineTuner:
    """Adam(1e-4, wd 2e-4) fine-tune with masks applied (prune.py:254-261)."""

    def __init__(self, model, is_offline: bool, lr: float = 1e-4,
                 weight_decay: float = 2e-4):
        self.model = model
        preset = optimizers.Preset(family='adam', lr=lr,
                                   weight_decay=weight_decay, grouped=False)
        self._preset = preset
        self._optimizer = None
        self._step = None
        self.is_offline = is_offline

    def init_state(self, variables) -> TrainState:
        if self._optimizer is None:
            self._build(variables['params'])
        return create_state(variables, self._optimizer)

    def _build(self, params):
        optimizer = optimizers.make_optimizer(self._preset, params)
        # single source for the masked fine-tune step — shared with the
        # resident engine (epoch_frac is unused by this loss)
        step_fn = _finetune_step_fn(self.model, optimizer, self.is_offline)

        @jax.jit
        def step(state: TrainState, masks, images, gts):
            return step_fn(state, masks, images, gts, 0.0)

        self._optimizer = optimizer
        self._step = step

    def step(self, state, masks, images, gts):
        return self._step(state, masks, jnp.asarray(images), jnp.asarray(gts))


# ---------------------------------------------------------------------------
# Materialization
# ---------------------------------------------------------------------------

def _keep(mask) -> np.ndarray:
    return np.nonzero(np.asarray(mask) > 0)[0]


def _gather_conv(p, keep_in, keep_out):
    out = {'kernel': np.asarray(p['kernel'])[:, :, keep_in][..., keep_out]}
    if 'bias' in p:
        out['bias'] = np.asarray(p['bias'])[keep_out]
    return out


def _gather_bn(p, s, keep):
    return ({'scale': np.asarray(p['scale'])[keep],
             'bias': np.asarray(p['bias'])[keep]},
            {'mean': np.asarray(s['mean'])[keep],
             'var': np.asarray(s['var'])[keep]})


def _identity_downsample(keep_in: np.ndarray, keep_out: np.ndarray,
                         eps: float = 1e-5):
    """1x1 conv + BN that exactly gathers surviving residual channels.

    The BN scale is sqrt(1+eps) so conv->BN is the exact identity on the
    gathered channels (function-preserving, unlike the reference's random
    re-init at prune.py:484-487)."""
    w = np.zeros((1, 1, len(keep_in), len(keep_out)), np.float32)
    pos_of = {int(c): a for a, c in enumerate(keep_in)}
    for b, c in enumerate(keep_out):
        a = pos_of.get(int(c))
        if a is not None:
            w[0, 0, a, b] = 1.0
    params = {'downsample_conv': {'kernel': w},
              'downsample_bn': {'scale': np.full(len(keep_out),
                                                 np.sqrt(1.0 + eps),
                                                 np.float32),
                                'bias': np.zeros(len(keep_out), np.float32)}}
    stats = {'downsample_bn': {'mean': np.zeros(len(keep_out), np.float32),
                               'var': np.ones(len(keep_out), np.float32)}}
    return params, stats


def materialize(arch: ResNetArch, variables, masks: Masks
                ) -> Tuple[ResNetArch, Dict[str, Any]]:
    """Mask config -> smaller arch + gathered params (exact function match)."""
    params, stats = variables['params'], variables['batch_stats']
    new_p: Dict[str, Any] = dict(params)
    new_s: Dict[str, Any] = dict(stats)
    nc = _n_convs(arch)

    keep_base = _keep(masks['base'])
    new_p['base_conv'] = {'kernel':
                          np.asarray(params['base_conv']['kernel'])
                          [..., keep_base]}
    p, s = _gather_bn(params['base_bn'], stats['base_bn'], keep_base)
    new_p['base_bn'], new_s['base_bn'] = p, s

    stream_keep = keep_base
    new_stages: List[List[BlockWidths]] = []
    for i, stage in enumerate(arch.stages):
        new_stage: List[BlockWidths] = []
        for j, bw in enumerate(stage):
            prefix = f'stage{i}_block{j}'
            bp, bs = dict(params[prefix]), dict(stats[prefix])
            keep_in = stream_keep
            keeps = [
                _keep(masks[f'{prefix}/conv{c + 1}'])
                for c in range(nc - 1)
            ]
            keep_out = _keep(masks[f'{prefix}/out'])

            prev = keep_in
            for c in range(nc - 1):
                bp[f'conv{c + 1}'] = _gather_conv(params[prefix][f'conv{c + 1}'],
                                                  prev, keeps[c])
                p, s = _gather_bn(params[prefix][f'bn{c + 1}'],
                                  stats[prefix][f'bn{c + 1}'], keeps[c])
                bp[f'bn{c + 1}'], bs[f'bn{c + 1}'] = p, s
                prev = keeps[c]
            bp[f'conv{nc}'] = _gather_conv(params[prefix][f'conv{nc}'],
                                           prev, keep_out)
            p, s = _gather_bn(params[prefix][f'bn{nc}'],
                              stats[prefix][f'bn{nc}'], keep_out)
            bp[f'bn{nc}'], bs[f'bn{nc}'] = p, s

            force_ds = False
            if 'downsample_conv' in params[prefix]:
                bp['downsample_conv'] = _gather_conv(
                    params[prefix]['downsample_conv'], keep_in, keep_out)
                p, s = _gather_bn(params[prefix]['downsample_bn'],
                                  stats[prefix]['downsample_bn'], keep_out)
                bp['downsample_bn'], bs['downsample_bn'] = p, s
                # widths may now be equal; keep the downsample regardless
                force_ds = (len(keep_in) == len(keep_out))
            elif list(keep_in) != list(keep_out):
                ds_p, ds_s = _identity_downsample(keep_in, keep_out)
                bp.update(ds_p)
                bs.update(ds_s)
                force_ds = True

            new_p[prefix], new_s[prefix] = bp, bs
            new_stage.append(BlockWidths(
                convs=tuple(len(k) for k in keeps) + (len(keep_out),),
                force_downsample=force_ds))
            stream_keep = keep_out
        new_stages.append(new_stage)

        # side head consumes the stage output stream (prune.py:455-457)
        hp = dict(params[f'head{i}'])
        hp['side_prep'] = {
            'kernel': np.asarray(params[f'head{i}']['side_prep']['kernel'])
            [:, :, stream_keep, :],
            'bias': np.asarray(params[f'head{i}']['side_prep']['bias']),
        }
        new_p[f'head{i}'] = hp

    new_arch = dataclasses.replace(
        arch,
        base_out=len(keep_base),
        stages=tuple(tuple(st) for st in new_stages))
    return new_arch, {'params': new_p, 'batch_stats': new_s}


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PruneCheckpoint:
    percentage: int
    arch: ResNetArch
    variables: Dict[str, Any]
    masks: Masks


def _rank_step_fn(loss_of_masks):
    """Taylor ranking as a ChunkEngine step: carry = (rank acc, loss sum),
    ctx = (masks, params, batch_stats); aux = per-step loss."""
    def step(carry, ctx, imgs, gts, epoch_frac):
        acc, loss_sum = carry
        masks, params, stats = ctx
        l, g = jax.value_and_grad(loss_of_masks)(masks, params, stats,
                                                 imgs, gts)
        return (jax.tree.map(jnp.add, acc, g), loss_sum + l), l
    return step


def _finetune_step_fn(model, optimizer, is_offline: bool):
    """Masked fine-tune as a ChunkEngine step (ctx = channel masks)."""
    def step(state: TrainState, masks, imgs, gts, epoch_frac):
        def loss_fn(p):
            outs, mut = model.apply(
                {'params': p, 'batch_stats': state.batch_stats}, imgs,
                train=True, mutable=['batch_stats'], channel_masks=masks)
            if is_offline:
                losses = [class_balanced_cross_entropy_loss(
                    o, gts, size_average=False) for o in outs]
                total = sum(losses)
            else:
                total = class_balanced_cross_entropy_loss(
                    outs[-1], gts, size_average=False)
            return total, mut['batch_stats']

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1), loss
    return step


def prune_iteratively(model, arch: ResNetArch, variables,
                      batches_fn: Callable[[], Any],
                      is_offline: bool,
                      prune_per_iter: int = 64,
                      n_epochs_select: int = 20,
                      n_epochs_finetune: int = 20,
                      percentage_max: int = 90,
                      percentage_step: int = 10,
                      checkpoint_fn: Optional[
                          Callable[[PruneCheckpoint], None]] = None,
                      summary_writer=None,
                      resident_dataset=None, resident_seed: int = 0,
                      resident_chunk_steps: int = 50,
                      resident_batch_size: int = 1
                      ) -> List[PruneCheckpoint]:
    """The reference main loop (prune.py:552-640): for each 10% target,
    repeat [rank -> prune prune_per_iter filters -> fine-tune] until the
    target live-filter fraction is reached, then materialize + checkpoint.

    ``batches_fn()`` returns an iterable of (images NHWC, gts NHW1) — called
    fresh per epoch.

    ``summary_writer`` (optional, tensorboardX-like) receives the reference's
    scalar tags: ``train_pruning/loss`` per ranking epoch (``prune.py:251``)
    and ``finetune/loss`` per fine-tune epoch (``prune.py:278``), with the
    reference's running epoch index ``iteration * n_epochs + epoch``. Losses
    accumulate on device; ONE readback per epoch.

    ``resident_dataset`` (a DAVIS2016 split) switches both inner loops to
    the HBM-resident engine (``train/resident.py``): ranking and fine-tune
    epochs run as compiled chunk scans over device-gathered,
    device-augmented frames, with channel masks / (params, stats) threaded
    as traced context so mask updates never recompile. ``batches_fn`` is
    unused then and may be None.

    ``resident_batch_size > 1`` batches both resident inner loops like the
    parent trainer's ``--batch-size`` (same backward-bound step, same b128
    knee — BENCHMARKS.md). Documented deviation, reference setting 1: BN
    batch statistics (rank passes run train=True, ``prune.py:240-243``)
    and the Taylor scores' per-sample normalization context see batch
    moments over B frames.
    """
    ranker = TaylorRanker(model, is_offline)
    tuner = MaskedFineTuner(model, is_offline)

    masks = init_masks(arch)
    total = total_filters(masks)
    state = tuner.init_state(variables)
    checkpoints: List[PruneCheckpoint] = []
    iteration = 0

    rank_engine = ft_engine = d_imgs = d_gts = res_rng = None
    if resident_dataset is not None:
        from fosvos_tpu.train import resident as resident_mod
        d_imgs, d_gts = resident_mod.upload(resident_dataset)
        rank_engine = resident_mod.ChunkEngine(
            _rank_step_fn(ranker._loss_of_masks),
            meanval=resident_dataset.meanval)
        ft_engine = resident_mod.ChunkEngine(
            _finetune_step_fn(model, tuner._optimizer, is_offline),
            meanval=resident_dataset.meanval)
        res_rng = np.random.RandomState(resident_seed)

    for percentage in range(percentage_step, percentage_max + 1,
                            percentage_step):
        target_live = int(round(total * (1 - percentage / 100)))
        while remaining_filters(masks) > target_live:
            n = min(prune_per_iter, remaining_filters(masks) - target_live)
            # rank (n_epochs_select passes, prune.py:226-251)
            ranks = {k: jnp.zeros_like(m) for k, m in masks.items()}
            vars_now = {'params': state.params,
                        'batch_stats': state.batch_stats}
            for e in range(n_epochs_select):
                if resident_dataset is not None:
                    idxs, flips, schedule = resident_mod.epoch_plan(
                        len(resident_dataset), resident_batch_size,
                        res_rng, augment=True,
                        chunk_steps=resident_chunk_steps)
                    carry0 = (jax.tree.map(jnp.zeros_like, masks),
                              jnp.zeros((), jnp.float32))
                    (r, loss_sum), _ = rank_engine.run_epoch(
                        carry0, (masks, state.params, state.batch_stats),
                        d_imgs, d_gts, idxs, flips, schedule, 0.0)
                    rank_loss = float(loss_sum) / max(len(idxs), 1)
                else:
                    r = ranker.rank(vars_now, masks, batches_fn())
                    rank_loss = (float(ranker.last_loss_sum)
                                 / max(ranker.last_n_batches, 1))
                ranks = {k: ranks[k] + r[k] for k in ranks}
                if summary_writer is not None:
                    summary_writer.add_scalar(
                        'train_pruning/loss', rank_loss,
                        iteration * n_epochs_select + e + 1)
            plan = pruning_plan(normalize_ranks(ranks), masks, n)
            if not plan:
                break
            masks = apply_plan(masks, plan)
            # fine-tune (prune.py:254-261)
            for e in range(n_epochs_finetune):
                if resident_dataset is not None:
                    idxs, flips, schedule = resident_mod.epoch_plan(
                        len(resident_dataset), resident_batch_size,
                        res_rng, augment=True,
                        chunk_steps=resident_chunk_steps)
                    state, auxes = ft_engine.run_epoch(
                        state, masks, d_imgs, d_gts, idxs, flips,
                        schedule, 0.0)
                    mean_loss = (float(np.concatenate(
                        [np.asarray(a).reshape(-1) for a in auxes]).mean())
                        if auxes else 0.0)
                else:
                    epoch_losses = []
                    for images, gts in batches_fn():
                        state, loss = tuner.step(state, masks, images, gts)
                        epoch_losses.append(loss)
                    mean_loss = (float(np.asarray(
                        jnp.stack(epoch_losses)).mean())
                        if epoch_losses else 0.0)
                if summary_writer is not None:
                    summary_writer.add_scalar(
                        'finetune/loss', mean_loss,
                        iteration * n_epochs_finetune + e + 1)
            iteration += 1

        small_arch, small_vars = materialize(
            arch, {'params': state.params, 'batch_stats': state.batch_stats},
            masks)
        ckpt = PruneCheckpoint(percentage=percentage, arch=small_arch,
                               variables=small_vars, masks=dict(masks))
        checkpoints.append(ckpt)
        if checkpoint_fn is not None:
            checkpoint_fn(ckpt)

    return checkpoints
