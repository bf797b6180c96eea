"""Device-resident training: the dataset lives in HBM.

Motivation (BENCHMARKS.md round-3 decomposition): behind a bandwidth-bound
host->device link the offline step is dominated by re-shipping frames every
epoch (`device_put` 18.8 ms vs 10.3 ms device compute at b1 480p). DAVIS-2016
train is ~3.4 GB as uint8 — it fits in HBM **once**, and every subsequent
epoch re-reads it for free.

The machinery is a small engine shared by every epoch-over-the-train-split
loop in the framework (offline parent training, offline mimic distillation,
and the data-parallel variant):

* :func:`upload` ships the split as two resident uint8 arrays (frames NHWC,
  masks NHW1) — one transfer for the whole run;
* :class:`ChunkEngine` compiles, per augmentation scale, a ``lax.scan`` over
  train steps that gathers each step's frames by index from the resident
  arrays, augments ON DEVICE (horizontal flip + multi-scale resize — the
  reference pipeline, ``io_helper.py:62-70``), normalizes (mean subtract /
  gt max, ``davis_2016.py:127-132``), and applies a caller-provided step
  function;
* per-epoch host traffic is a permutation + flip bits (a few KB) out and one
  stacked aux readback in.

The three augmentation scales {0.5, 0.8, 1} become three compiled chunk
programs (static shapes), interleaved by ``transforms.scale_schedule``
exactly like the online adaptation path. With a ``mesh``, the resident
arrays are replicated, the per-step batch axis is sharded over 'data', and
GSPMD inserts the gradient all-reduce — the data-parallel trainer with zero
per-step host traffic.

Measured (BENCHMARKS.md): 7.2 ms/step / 138 frames/s sustained at b1 480p
with full augmentation — 4.6x over the standard loop, below the 10.3 ms
single-step device compute (the scan amortizes dispatch; the 0.5/0.8-scale
steps cost less than native). Batched, the same engine reaches **928
frames/s at b128 bf16** (the knee — b256 regresses; the step is
backward-bound, decomposed in ``tools/profile_resident_step.py``), making
the full reference budget ~9 min on one chip.

Documented deviation from the host pipeline: scale resize runs on device in
float32 (``jax.image.resize`` cubic for frames / nearest for masks) instead
of cv2 on uint8, so resized pixels are not bit-identical to the cv2 path
(no uint8 rounding; boundary handling differs). At scale 1.0 (and with
``augment=False``) there is no resize and the step sequence matches
``OfflineTrainer`` to float-reassociation tolerance (measured ~4e-7 after
an epoch; the scan body and the standalone step are different XLA
programs) — tested. The reference's own transform stack is a torch CPU
pipeline, so neither host nor device tier is bit-tied to it.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Optional, Tuple

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

# step_fn(state, ctx, imgs_f32, gts_f32, epoch_frac) -> (state, aux)
StepFn = Callable[[Any, Any, jax.Array, jax.Array, jax.Array],
                  Tuple[Any, jax.Array]]


def upload(dataset: DAVIS2016, mesh=None, shard_spatial: bool = False):
    """Stack the split as uint8 and ship it to HBM once.

    With ``mesh``: replicated by default; ``shard_spatial`` instead
    partitions the frame H axis over the mesh's 'spatial' axis — each
    device then holds only its H-slice of the dataset, the per-step gather
    is sharding-preserving, and the convolutions run spatially partitioned
    (GSPMD halo exchange), cutting per-device HBM footprint by the spatial
    factor."""
    # decode on the native C++ prefetch threads when available (completion
    # order; re-sorted by index)
    from fosvos_tpu.data import loader as data_loader
    pairs = [None] * len(dataset)
    for i, img, gt in data_loader.iterate_samples(
            dataset, list(range(len(dataset))), raw=True):
        pairs[i] = (img, gt)
    imgs = np.stack([p[0] for p in pairs])
    gts = np.stack([p[1][..., None] for p in pairs])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = (P(None, 'spatial') if shard_spatial
                and 'spatial' in mesh.axis_names else P())
        sh = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            # multi-host: every process decodes the (global) split; build
            # the global array from each host's local view — device_put
            # cannot target non-addressable devices
            return (jax.make_array_from_process_local_data(sh, imgs,
                                                           imgs.shape),
                    jax.make_array_from_process_local_data(sh, gts,
                                                           gts.shape))
        return jax.device_put(imgs, sh), jax.device_put(gts, sh)
    return jax.device_put(imgs), jax.device_put(gts)


def _resize_batch(imgs, gts, out_h: int, out_w: int):
    """Device-tier multi-scale resize: cubic frames, nearest masks
    (reference ``custom_transforms.py:63-92`` semantics, float32)."""
    b = imgs.shape[0]
    imgs = jax.image.resize(imgs, (b, out_h, out_w, imgs.shape[3]), 'cubic')
    gts = jax.image.resize(gts, (b, out_h, out_w, gts.shape[3]), 'nearest')
    return imgs, gts


class ChunkEngine:
    """Per-scale compiled chunk scans around a caller step function.

    ``step_fn(state, ctx, imgs, gts, epoch_frac)`` receives normalized
    float32 batches (mean-subtracted frames, max-normalized masks) and
    returns ``(new_state, aux)``; ``ctx`` is an arbitrary pytree threaded
    through unchanged (channel masks, teacher params, ...).

    With ``mesh``: state/ctx/resident data are replicated, the batch axis
    of each step is sharded over the 'data' axis (indices and flips are
    sharded host-side), aux comes back replicated.
    """

    def __init__(self, step_fn: StepFn, meanval=None, mesh=None):
        self.step_fn = step_fn
        self.meanval = jnp.asarray(meanval if meanval is not None
                                   else DAVIS_MEAN_BGR, jnp.float32)
        self.mesh = mesh
        self._fns = {}

    def _chunk_fn(self, scale: float, native_hw):
        key = (scale, native_hw)
        if key in self._fns:
            return self._fns[key]

        step_fn = self.step_fn
        mean = self.meanval
        h, w = native_hw
        if scale == 1.0:
            out_h, out_w = h, w
        else:
            # cv2.resize(fx=s) output size convention: round(dim * s)
            out_h, out_w = int(round(h * scale)), int(round(w * scale))

        def run_chunk(state, ctx, imgs_u8, gts_u8, idxs, flips, epoch_frac):
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
                return step_fn(state, ctx, imgs, gts, epoch_frac)

            return jax.lax.scan(body, state, (idxs, flips))

        if self.mesh is None:
            fn = jax.jit(run_chunk)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self.mesh, P())
            bsh = NamedSharding(self.mesh, P(None, 'data'))  # (T, B) on B
            # resident data args (positions 2-3) keep their own committed
            # sharding (replicated, or H-sharded over 'spatial' — see
            # upload(shard_spatial=True))
            fn = jax.jit(run_chunk,
                         in_shardings=(repl, repl, None, None, bsh, bsh,
                                       None),
                         out_shardings=(repl, repl))
        self._fns[key] = fn
        return fn

    def run_epoch(self, state, ctx, d_imgs, d_gts, idxs: np.ndarray,
                  flips: np.ndarray, schedule, epoch_frac: float):
        """Dispatch one epoch as per-scale chunk scans.

        ``idxs``/``flips`` are (n_steps, batch) host arrays; ``schedule`` is
        a list of (scale, n_chunk_steps) covering all n_steps rows in
        order. Returns (state, [aux_per_chunk]) with aux device-resident —
        the caller stacks and reads back once.
        """
        native_hw = tuple(d_imgs.shape[1:3])

        def place(a):
            a = np.ascontiguousarray(a)
            if self.mesh is not None and jax.process_count() > 1:
                # multi-host: numpy can't carry a non-trivial sharding into
                # jit; values are identical on every process (epoch_plan is
                # seed-driven), so the global array is each host's local view
                from jax.sharding import NamedSharding, PartitionSpec as P
                bsh = NamedSharding(self.mesh, P(None, 'data'))
                return jax.make_array_from_process_local_data(bsh, a,
                                                              a.shape)
            return a

        auxes = []
        pos = 0
        for scale, n in schedule:
            fn = self._chunk_fn(scale, native_hw)
            state, aux = fn(state, ctx, d_imgs, d_gts,
                            place(idxs[pos:pos + n]),
                            place(flips[pos:pos + n]),
                            np.float32(epoch_frac))
            auxes.append(aux)
            pos += n
        assert pos == len(idxs)
        return state, auxes


def epoch_plan(n_samples: int, batch_size: int, rng: np.random.RandomState,
               augment: bool, chunk_steps: int = 50):
    """Host-side epoch randomness: permuted sample indices (n_steps, B),
    per-step flips, and the interleaved per-scale chunk schedule."""
    n_steps = n_samples // batch_size
    order = rng.permutation(n_samples)[:n_steps * batch_size]
    idxs = order.reshape(n_steps, batch_size).astype(np.int32)
    if augment:
        flips = (rng.rand(n_steps, batch_size) < 0.5)
        schedule = transforms.scale_schedule(n_steps, rng,
                                             chunk_steps=chunk_steps)
    else:
        flips = np.zeros((n_steps, batch_size), bool)
        schedule = [(1.0, n_steps)]
    return idxs, flips, schedule


def _offline_step_fn(model, optimizer) -> StepFn:
    """The offline deep-supervision train step as a ChunkEngine step."""
    def step(state: TrainState, ctx, imgs, gts, epoch_frac):
        def loss_fn(p):
            outs, mut = model.apply(
                {'params': p, 'batch_stats': state.batch_stats},
                imgs, train=True, mutable=['batch_stats'])
            total, losses = deep_supervision_loss(outs, gts, epoch_frac)
            return total, (mut['batch_stats'], losses)

        (_, (new_stats, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, batch_stats=new_stats,
                          opt_state=opt_state,
                          step=state.step + 1), jnp.stack(losses)
    return step


def _offline_eval_step_fn(model) -> StepFn:
    """Loss-only eval pass (test-while-training, train_offline.py:115-136)
    as a ChunkEngine step: carry is untouched, ctx = (params, stats)."""
    def step(carry, ctx, imgs, gts, epoch_frac):
        params, stats = ctx
        outs = model.apply({'params': params, 'batch_stats': stats}, imgs,
                           train=False)
        _, losses = deep_supervision_loss(outs, gts, jnp.zeros(()))
        return carry, jnp.stack(losses)
    return step


def train_offline_resident(
        model, variables, dataset: DAVIS2016,
        preset: Optional[optimizers.Preset] = None,
        n_epochs: int = 240, start_epoch: int = 0,
        batch_size: int = 1, avg_grad_every_n: int = 10,
        augment: bool = True, seed: int = 0,
        snapshot_every_n: int = 40,
        snapshot_fn: Optional[Callable[[int, TrainState], None]] = None,
        log_fn: Optional[Callable[[EpochStats], None]] = None,
        chunk_steps: int = 50, mesh=None,
        shard_spatial: bool = False,
        test_dataset: Optional[DAVIS2016] = None,
        test_every_n: int = 5,
        test_log_fn: Optional[Callable[[EpochStats], None]] = None
        ) -> TrainState:
    """Drop-in for :func:`~fosvos_tpu.train.offline.train_offline` with the
    dataset resident in HBM (identical reference semantics and cadences;
    matches the standard path to float tolerance when ``augment=False`` —
    tested). With ``mesh``, the batch axis is sharded over its 'data' axis
    (pass ``batch_size`` as the GLOBAL batch, a multiple of the axis size)
    and GSPMD inserts the gradient all-reduce."""
    base = optimizers.make_optimizer(preset or optimizers.Preset(),
                                     variables['params'])
    optimizer = optax.MultiSteps(base, every_k_schedule=avg_grad_every_n)
    state = create_state(variables, optimizer)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        state = jax.device_put(state, NamedSharding(mesh, P()))
        if batch_size % mesh.shape['data'] != 0:
            raise ValueError(
                f'global batch {batch_size} must be a multiple of the '
                f"mesh data axis {mesh.shape['data']}")

    engine = ChunkEngine(_offline_step_fn(model, optimizer),
                         meanval=dataset.meanval, mesh=mesh)
    d_imgs, d_gts = upload(dataset, mesh=mesh, shard_spatial=shard_spatial)
    rng = np.random.RandomState(seed)

    eval_engine = d_timgs = d_tgts = None
    if test_dataset is not None:
        eval_engine = ChunkEngine(_offline_eval_step_fn(model),
                                  meanval=test_dataset.meanval, mesh=mesh)
        d_timgs, d_tgts = upload(test_dataset, mesh=mesh,
                                 shard_spatial=shard_spatial)

    for epoch in range(start_epoch, n_epochs):
        t0 = time.perf_counter()
        idxs, flips, schedule = epoch_plan(len(dataset), batch_size, rng,
                                           augment, chunk_steps)
        state, auxes = engine.run_epoch(state, None, d_imgs, d_gts, idxs,
                                        flips, schedule, epoch / n_epochs)
        # ONE readback per epoch (also fences the epoch for honest timing)
        mean_losses = (np.asarray(jnp.concatenate(auxes)).mean(axis=0)
                       if auxes else np.zeros(5))
        stats = EpochStats(epoch=epoch, mean_losses=mean_losses,
                           wall_time_s=time.perf_counter() - t0)
        if log_fn is not None:
            log_fn(stats)
        if snapshot_fn is not None and epoch % snapshot_every_n == \
                snapshot_every_n - 1 and epoch != 0:
            snapshot_fn(epoch, state)

        # test-while-training loss pass (reference train_offline.py:115-136),
        # also over resident data: no per-frame transfers
        if eval_engine is not None and \
                epoch % test_every_n == test_every_n - 1:
            t1 = time.perf_counter()
            # every test frame is evaluated: the trailing partial batch is
            # padded by repeating the last frame (a monitoring signal, not
            # a metric — same policy as the data-parallel eval pass)
            n_t = -(-len(test_dataset) // batch_size)
            flat = np.minimum(np.arange(n_t * batch_size),
                              len(test_dataset) - 1)
            tidx = flat.astype(np.int32).reshape(n_t, batch_size)
            tflips = np.zeros((n_t, batch_size), bool)
            # numpy carry: multi-host-safe (a locally-committed device
            # scalar cannot be resharded onto a cross-process mesh)
            _, tauxes = eval_engine.run_epoch(
                np.zeros((), np.float32), (state.params, state.batch_stats),
                d_timgs, d_tgts, tidx, tflips, [(1.0, n_t)], 0.0)
            tmean = (np.asarray(jnp.concatenate(tauxes)).mean(axis=0)
                     if tauxes else np.zeros(5))
            if test_log_fn is not None:
                test_log_fn(EpochStats(
                    epoch=epoch, mean_losses=tmean,
                    wall_time_s=time.perf_counter() - t1))

    return state
