"""One-shot VOS as a service: join -> adapt -> serve, one object.

The reference's production story is three manual steps per video: run
``train_online.py`` to adapt the parent to the first annotated frame
(``/root/reference/src/train_online.py:23-50``), pick up the checkpoint,
then serve it in its own ``run_webcam.py`` process. :class:`VOSService`
collapses that into the server itself:

* :meth:`join` takes a stream's first frame + first mask, runs the
  compiled one-shot adaptation (``train/online.OnlineFinetuner`` — the
  batched accumulation-window scan, seconds for the full 10k-step
  reference budget on-chip), and installs the adapted weights into an
  :class:`evaluation.elastic.ElasticFleet` slot — the stream starts being
  served on the next :meth:`segment` call, no recompiles;
* :meth:`join_many` adapts a whole cohort of joining streams at once —
  on a multi-device ``'seq'`` mesh the K adaptations run in parallel
  (``parallel/fanout``), cold-starting a K-camera fleet in roughly one
  adaptation's wall time instead of K;
* :meth:`segment` serves every live stream in one fleet dispatch;
* :meth:`leave` frees the slot; :meth:`readapt` re-runs adaptation for a
  live stream (e.g. on a drift-corrected annotation) and hot-swaps its
  weights in place.

The adaptation budget, optimizer preset (default: reference production
variant 11), augmentation, and serving precision (bf16/int8) are all
knobs; the adapter's compiled programs are shared across joins (same
shapes -> one compile for the life of the service).
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
from fosvos_tpu.evaluation.elastic import ElasticFleet
from fosvos_tpu.runtime.logging import get_logger
from fosvos_tpu.train import online, optimizers

log = get_logger(__name__)


class VOSService:
    """Adapt-and-serve server for one-shot video object segmentation.

    Args:
      model: the parent topology (every stream adapts/serves this model).
      parent_variables: offline-trained parent weights that each join
        adapts from (the reference's ``resnet18_11_epoch-239`` role).
      capacity: maximum concurrent streams (``ElasticFleet`` slot count).
      preset: optimizer preset for adaptation (default: online variant 11,
        the reference's production setting).
      n_epochs: default adaptation step budget per join (reference: 10000,
        ``train_online.py:147``).
      avg_grad_every_n: gradient-accumulation window (reference: 5).
      augment: adapt over the flip + multi-scale schedule (reference
        train loader semantics).
      bf16 / int8 / mesh: serving precision/sharding, forwarded to
        :class:`ElasticFleet`. int8 streams self-calibrate on their first
        frame at join time.
      adapt_bf16: run the adaptation steps with bfloat16 activations
        (params, optimizer state, BN running stats and the loss stay
        float32 — the ``train-online --bf16`` recipe; the adapted weights
        installed into the fleet remain fp32). Ignored with ``qat_int8``
        (the fake-quant forward defines its own numerics).
      qat_int8: quantization-aware joins — each adaptation runs through
        the fake-quant forward (``compress/qat.py``) and the slot serves
        int8 with the training-time scales (implies ``int8``). Scales are
        calibrated once, on the first join's frame against the parent, so
        the adaptation programs still compile once for the service's life.
      adapt_mesh: optional mesh to shard each adaptation itself (latency;
        see ``OnlineFinetuner``).
      fanout_mesh: optional ``'seq'``-axis mesh for :meth:`join_many`
        cohort adaptation; default: auto-built over all devices when more
        than one is visible.
      mean: BGR channel mean (uint8 frames are mean-subtracted on device
        for serving and on host for the adaptation pair).
    """

    def __init__(self, model, parent_variables, capacity: int,
                 preset: Optional[optimizers.Preset] = None,
                 n_epochs: int = 10000, avg_grad_every_n: int = 5,
                 augment: bool = True, bf16: bool = False,
                 int8: bool = False, mesh=None, adapt_mesh=None,
                 mean=DAVIS_MEAN_BGR, qat_int8: bool = False,
                 fanout_mesh=None, adapt_bf16: bool = False):
        self.model = model
        self.parent_variables = parent_variables
        self.n_epochs = n_epochs
        self.augment = augment
        self.mean = tuple(mean)
        self._int8 = int8 or qat_int8
        self._qat = qat_int8
        self._qat_scales = None
        self._fleet = ElasticFleet(model, capacity, bf16=bf16,
                                   int8=self._int8, mesh=mesh, mean=mean)
        self._tuner_kwargs = dict(
            preset=preset or optimizers.online_variant(11),
            avg_grad_every_n=avg_grad_every_n, mesh=adapt_mesh)
        self._adapt_model = model
        if adapt_bf16 and not qat_int8:
            import jax.numpy as jnp
            self._adapt_model = model.clone(dtype=jnp.bfloat16)
        # with QAT the tuner needs the (first-join-calibrated) scales, so
        # it is built lazily in _adapt
        self._tuner = None if qat_int8 else online.OnlineFinetuner(
            self._adapt_model, **self._tuner_kwargs)
        self._fanout_mesh = fanout_mesh
        self._fanout = None

    @property
    def active_slots(self) -> Tuple[int, ...]:
        """Slot ids in serving order (``segment`` frame/mask order)."""
        return self._fleet.active_slots

    def _preprocess_frame(self, frame: np.ndarray) -> np.ndarray:
        frame = np.asarray(frame)
        if frame.dtype == np.uint8:  # device_preprocess contract, on host
            frame = frame.astype(np.float32) - np.asarray(self.mean,
                                                          np.float32)
        return frame

    @staticmethod
    def _normalize_mask(mask: np.ndarray) -> np.ndarray:
        raw = np.asarray(mask)
        mask = raw.astype(np.float32)
        peak = mask.max()
        if peak > 0:                 # 0/255 uint8 or {0,1} -> [0,1]
            mask = mask / peak
            # warn only when the raw values look like an object-ID PNG
            # (integer-valued with >2 distinct levels, e.g. DAVIS-2017
            # multi-object annotations): after the reference's gt/max
            # contract (davis_2016.py:131-132) every value >= peak/2 trains
            # as foreground — almost never what a multi-object annotation
            # means. Soft/antialiased float masks in [0,1] are a documented
            # join() input and stay silent.
            if np.issubdtype(raw.dtype, np.integer):
                u = np.unique(raw)
                if u.size > 2:
                    log.warning(
                        'first mask looks like an object-ID map (%d distinct '
                        'integer values); values >= %.1f will train as '
                        'foreground — pass a single-object 0/255 mask if '
                        'that is not intended', u.size, peak / 2)
        return mask

    def _ensure_qat(self, frame: np.ndarray) -> None:
        """First QAT adaptation: calibrate the service's input scales on
        this frame against the parent and build the fake-quant tuner.
        Subsequent joins reuse the scales (one compile for the service's
        life)."""
        if not self._qat or self._qat_scales is not None:
            return
        from fosvos_tpu.compress import qat
        frame = self._preprocess_frame(frame)
        self._qat_scales = qat.calibrate_scales(
            self.model, self.parent_variables, [frame[None]], margin=1.25)
        self._tuner = online.OnlineFinetuner(
            self.model,
            apply_fn=qat.make_apply(self.model, self._qat_scales),
            **self._tuner_kwargs)

    def _adapt(self, frame: np.ndarray, mask: np.ndarray,
               n_epochs: Optional[int], seed: int):
        frame = self._preprocess_frame(frame)
        mask = self._normalize_mask(mask)
        if self._tuner is None:      # first QAT join: calibrate + build
            self._ensure_qat(frame)
        res = self._tuner.finetune(
            self.parent_variables, frame, mask,
            n_epochs=self.n_epochs if n_epochs is None else n_epochs,
            augment=self.augment, seed=seed)
        return ({'params': res.state.params,
                 'batch_stats': res.state.batch_stats}, res)

    def _slot_qparams(self, variables):
        if not self._qat:
            return None
        from fosvos_tpu.compress import qat
        return qat.finalize(variables, self._qat_scales)

    def join(self, first_frame: np.ndarray, first_mask: np.ndarray,
             n_epochs: Optional[int] = None, seed: int = 0
             ) -> Tuple[int, online.OnlineResult]:
        """Adapt the parent to (first_frame, first_mask) and start serving.

        Args:
          first_frame: (H, W, 3) uint8 BGR (or mean-subtracted float32).
          first_mask: (H, W) object mask (bool / 0-255 uint8 / [0,1]).
        Returns (slot id, adaptation result — losses + wall time).
        """
        if self._fleet.free_slots < 1:   # fail BEFORE the adaptation runs
            raise ValueError(
                f'service is at capacity ({self._fleet.capacity} streams)')
        variables, res = self._adapt(first_frame, first_mask, n_epochs,
                                     seed)
        qp = self._slot_qparams(variables)
        slot = self._fleet.add(
            variables, qparams=qp,
            calib_frame=(np.asarray(first_frame)
                         if self._int8 and qp is None else None))
        return slot, res

    def join_many(self, first_frames: np.ndarray, first_masks: np.ndarray,
                  n_epochs: Optional[int] = None, seed: int = 0, mesh=None
                  ) -> Tuple[List[int], Union[List[online.OnlineResult],
                                              'fanout.FanoutResult']]:
        """Adapt K joining streams as one cohort and start serving them.

        On a multi-device ``'seq'`` mesh the K one-shot adaptations run in
        parallel via ``parallel.fanout.SequenceFanout`` (the TPU inversion
        of the reference's process-per-sequence sharding,
        ``train_online.py:183-186``) — a K-camera fleet cold-starts in
        roughly one adaptation's wall time. On a single device it falls
        back to sequential :meth:`join` calls (the fan-out's HBM churn is
        a measured 2.2x penalty there; see BENCHMARKS.md).

        Cohort sizes are padded up to power-of-two multiples of the mesh's
        ``'seq'`` axis, so differently-sized cohorts reuse at most
        log2(capacity) compiled adaptation programs.

        Args:
          first_frames: (K, H, W, 3) uint8 BGR (or mean-subtracted
            float32) first annotated frames.
          first_masks: (K, H, W) object masks (bool / 0-255 / [0,1]).
          mesh: override the fan-out mesh for this call.
        Returns:
          (slot ids in join order, adaptation info — a
          ``parallel.fanout.FanoutResult`` on the fan-out path, else the
          list of per-stream ``OnlineResult``).
        """
        import jax

        frames = np.asarray(first_frames)
        masks = np.stack([self._normalize_mask(m) for m in first_masks])
        K = frames.shape[0]
        if K == 0:
            return [], []
        if K > self._fleet.free_slots:   # fail BEFORE the adaptations run
            raise ValueError(
                f'{K} joining streams but only {self._fleet.free_slots} '
                f'free slots (capacity {self._fleet.capacity})')
        mesh = mesh or self._fanout_mesh
        if mesh is None and jax.device_count() > 1:
            from fosvos_tpu.parallel import make_mesh
            # cache the auto-built mesh: a fresh Mesh object per call would
            # fail the `is` check below and rebuild (re-compile) the fan-out
            mesh = self._fanout_mesh = make_mesh(('seq',))
        if mesh is None or mesh.size == 1 or K == 1:
            slots, results = [], []
            for k in range(K):
                slot, res = self.join(frames[k], masks[k],
                                      n_epochs=n_epochs, seed=seed + k)
                slots.append(slot)
                results.append(res)
            return slots, results

        from fosvos_tpu.parallel import fanout as fanout_mod
        self._ensure_qat(frames[0])
        if self._fanout is None or self._fanout.mesh is not mesh:
            apply_fn = None
            if self._qat:
                from fosvos_tpu.compress import qat
                apply_fn = qat.make_apply(self.model, self._qat_scales)
            self._fanout = fanout_mod.SequenceFanout(
                self._adapt_model, mesh,
                preset=self._tuner_kwargs['preset'],
                avg_grad_every_n=self._tuner_kwargs['avg_grad_every_n'],
                mean=self.mean, apply_fn=apply_fn)

        n_seq = mesh.shape['seq']
        bucket = n_seq
        while bucket < K:
            bucket *= 2
        pad = bucket - K
        if pad:
            frames_p = np.concatenate([frames, frames[-1:].repeat(pad, 0)])
            masks_p = np.concatenate([masks, masks[-1:].repeat(pad, 0)])
        else:
            frames_p, masks_p = frames, masks
        res = self._fanout.finetune_all(
            self.parent_variables, frames_p, masks_p,
            n_epochs=self.n_epochs if n_epochs is None else n_epochs,
            augment=self.augment, seed=seed)

        slots = []
        for k in range(K):
            # slice on device: the fleet add() re-uploads host trees, so a
            # device_get here would round-trip every member's full weights
            # through the (high-latency) host link for nothing
            variables = jax.tree.map(
                lambda a: a[k], {'params': res.params,
                                 'batch_stats': res.batch_stats})
            qp = self._slot_qparams(variables)
            slots.append(self._fleet.add(
                variables, qparams=qp,
                calib_frame=(frames[k]
                             if self._int8 and qp is None else None)))
        return slots, res

    def readapt(self, slot: int, frame: np.ndarray, mask: np.ndarray,
                n_epochs: Optional[int] = None, seed: int = 0
                ) -> online.OnlineResult:
        """Re-adapt a live stream (fresh from the parent, like the
        reference's per-sequence protocol) and hot-swap its weights."""
        variables, res = self._adapt(frame, mask, n_epochs, seed)
        qp = self._slot_qparams(variables)
        self._fleet.swap_weights(
            slot, variables, qparams=qp,
            calib_frame=(np.asarray(frame)
                         if self._int8 and qp is None else None))
        return res

    def adopt(self, variables, calib_frame: Optional[np.ndarray] = None
              ) -> int:
        """Start serving an *already-adapted* model (e.g. a checkpoint the
        online sweep produced) without re-running adaptation. With int8
        serving, pass ``calib_frame`` unless a QAT join already calibrated
        the service scales. Returns the slot id."""
        qp = (self._slot_qparams(variables)
              if self._qat and self._qat_scales is not None else None)
        if self._int8 and qp is None and calib_frame is None:
            raise ValueError('int8 service: adopt() needs a calib_frame '
                             '(or a prior QAT join to provide scales)')
        return self._fleet.add(
            variables, qparams=qp,
            calib_frame=(np.asarray(calib_frame)
                         if self._int8 and qp is None else None))

    def export_slot(self, slot: int, models_dir, name: str,
                    sequence: Optional[str] = None,
                    epoch: Optional[int] = None,
                    variant_offline: int = 11, variant_online: int = 11
                    ) -> str:
        """Persist a live stream's adapted weights under the reference
        checkpoint naming contract (``network_provider.py:36-51``), so the
        manual CLIs (evaluate / run_webcam / fleet) can reload exactly what
        the service is serving. Returns the checkpoint stem."""
        from fosvos_tpu.runtime import checkpoint
        variables = self._fleet.get_weights(slot)
        stem = checkpoint.checkpoint_stem(
            name, (self.n_epochs - 1) if epoch is None else epoch,
            variant_offline, variant_online, sequence)
        arch_json = (self.model.arch.to_json()
                     if hasattr(self.model, 'arch') else None)
        checkpoint.save(str(models_dir), stem, variables, arch_json)
        return stem

    def leave(self, slot: int) -> None:
        """Stop serving a stream; its slot is recycled."""
        self._fleet.remove(slot)

    def segment(self, frames: np.ndarray) -> np.ndarray:
        """(n_active, H, W, 3) uint8 frames (order = :attr:`active_slots`)
        -> (n_active, H, W) uint8 sigmoid maps, one fleet dispatch."""
        return self._fleet.segment(frames)

    def segment_async(self, frames: np.ndarray):
        """:meth:`segment` without the readback fence: returns the masks
        as a device array so a streaming loop can overlap the next frames'
        decode and the previous masks' disk writes with the device step
        (``np.asarray`` on the result fences). Joins/leaves issued while
        the dispatch is in flight do not affect it — the fleet gather
        snapshotted the membership."""
        return self._fleet.segment_async(frames)
