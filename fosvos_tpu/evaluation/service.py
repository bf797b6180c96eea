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

from typing import Optional, Tuple

import numpy as np

from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
from fosvos_tpu.evaluation.elastic import ElasticFleet
from fosvos_tpu.train import online, optimizers


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
      qat_int8: quantization-aware joins — each adaptation runs through
        the fake-quant forward (``compress/qat.py``) and the slot serves
        int8 with the training-time scales (implies ``int8``). Scales are
        calibrated once, on the first join's frame against the parent, so
        the adaptation programs still compile once for the service's life.
      adapt_mesh: optional mesh to shard each adaptation itself (latency;
        see ``OnlineFinetuner``).
      mean: BGR channel mean (uint8 frames are mean-subtracted on device
        for serving and on host for the adaptation pair).
    """

    def __init__(self, model, parent_variables, capacity: int,
                 preset: Optional[optimizers.Preset] = None,
                 n_epochs: int = 10000, avg_grad_every_n: int = 5,
                 augment: bool = True, bf16: bool = False,
                 int8: bool = False, mesh=None, adapt_mesh=None,
                 mean=DAVIS_MEAN_BGR, qat_int8: bool = False):
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
        # with QAT the tuner needs the (first-join-calibrated) scales, so
        # it is built lazily in _adapt
        self._tuner = None if qat_int8 else online.OnlineFinetuner(
            model, **self._tuner_kwargs)

    @property
    def active_slots(self) -> Tuple[int, ...]:
        """Slot ids in serving order (``segment`` frame/mask order)."""
        return self._fleet.active_slots

    def _adapt(self, frame: np.ndarray, mask: np.ndarray,
               n_epochs: Optional[int], seed: int):
        frame = np.asarray(frame)
        if frame.dtype == np.uint8:  # device_preprocess contract, on host
            frame = frame.astype(np.float32) - np.asarray(self.mean,
                                                          np.float32)
        mask = np.asarray(mask, np.float32)
        if mask.max() > 0:           # 0/255 uint8 or {0,1} -> [0,1]
            mask = mask / mask.max()
        if self._tuner is None:      # first QAT join: calibrate + build
            from fosvos_tpu.compress import qat
            self._qat_scales = qat.calibrate_scales(
                self.model, self.parent_variables, [frame[None]],
                margin=1.25)
            self._tuner = online.OnlineFinetuner(
                self.model,
                apply_fn=qat.make_apply(self.model, self._qat_scales),
                **self._tuner_kwargs)
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
        variables, res = self._adapt(first_frame, first_mask, n_epochs,
                                     seed)
        qp = self._slot_qparams(variables)
        slot = self._fleet.add(
            variables, qparams=qp,
            calib_frame=(np.asarray(first_frame)
                         if self._int8 and qp is None else None))
        return slot, res

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
