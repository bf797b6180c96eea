"""Inference/eval driver: the reference's ``experiment_helper.test`` rebuilt.

Reference behavior (``experiment_helper.py:20-80``): per-frame forward,
numpy sigmoid, save probability masks to ``results/<model>/<seq>/<fname>.png``;
speed mode = 10 runs with synchronize-bracketed timing, first frame skipped.

TPU-native deltas:

* frames of a sequence are processed as **batches** from a dense (T,H,W,C)
  array — one device_put per sequence, one compiled forward per batch shape,
  sigmoid+quantization fused on device, single D2H of uint8 masks;
* ingest is **uint8**: raw BGR frames cross the host->device link (4x fewer
  bytes than float32 — the link is the bottleneck behind this tunnel) and
  mean subtraction (davis_2016.py:127-128) runs on device, where XLA fuses
  it into the first conv — bit-identical to host-side preprocessing since
  uint8->f32 is exact;
* the speed harness uses ``jax.block_until_ready`` with the same
  10-runs/skip-first methodology (``experiment_helper.py:42-53``), so numbers
  are comparable with the reference's measurement protocol.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fosvos_tpu.data.davis import DAVIS2016, DAVIS_MEAN_BGR


def write_mask_png(path: str, mask_u8: np.ndarray) -> None:
    import cv2
    cv2.imwrite(str(path), mask_u8)


def write_masks_batch(out_dir: Path, names, masks: np.ndarray) -> None:
    """Write a sequence's masks as ``<out_dir>/<name>.png``.

    Measured (100x480p realistic masks): cv2's PNG encoder is ~3x faster
    per image than stock libpng, so the serial cv2 loop wins on few-core
    hosts (0.10 s vs 0.29 s single-core); the native threaded writer
    (fastloader.cpp:fl_write_masks) overtakes it once >= 4 cores can
    encode in parallel. Both produce identical grayscale PNGs (tested),
    so the choice is purely a host-shape heuristic.
    """
    import os
    paths = [out_dir / f'{n}.png' for n in names]
    if (os.cpu_count() or 1) >= 4 and len(paths) > 1:
        try:
            from fosvos_tpu import native
            if native.write_masks(paths, masks) == len(paths):
                return
        except Exception:
            pass
    for p, m in zip(paths, masks):
        write_mask_png(str(p), m)


def device_preprocess(images: jax.Array,
                      mean=DAVIS_MEAN_BGR) -> jax.Array:
    """uint8 BGR frames -> float32 minus channel mean, on device.

    float32 input is passed through unchanged (already preprocessed on host).
    uint8->f32 casting is exact, so the two ingest paths produce bit-identical
    activations. Deliberately plain XLA: the cast+subtract fuses into the
    first conv's input read, which measured 33% faster end-to-end than a
    dedicated Pallas preprocess kernel whose output must round-trip HBM at
    float32 (BENCHMARKS.md "Pallas kernels: measured and retired")."""
    if images.dtype != jnp.uint8:
        return images
    return images.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)


class InferenceEngine:
    """Compiled batched forward producing uint8 probability masks.

    Accepts raw uint8 BGR frames (preferred: 4x less H2D traffic, mean
    subtraction fused on device) or host-preprocessed float32.

    ``bf16=True`` runs the trunk at the TPU serving precision (~3x
    throughput); the default fp32 keeps masks bit-comparable with the
    reference pipeline. Sigmoid/quantization always run in fp32.

    ``int8=True`` serves with post-training-quantized convs
    (``compress/quantize.py``: int8 x int8 -> int32 on the MXU, per-channel
    weight scales, calibrated per-tensor activation scales). Call
    :meth:`calibrate` with representative frames before the first forward —
    otherwise the first ``masks_for_sequence`` batch self-calibrates, and a
    shared engine re-calibrates automatically whenever it is handed a
    different variables object (e.g. per-sequence adapted weights in the
    online sweep).
    Composes with ``mesh`` (quantized state replicated, frames sharded)
    and with ``bf16`` (int8 MXU convs + bfloat16 non-conv stages — the
    lowest-HBM serving configuration).

    ``mesh``: optional ``jax.sharding.Mesh`` for multi-chip inference.
    The frame batch is sharded over a ``data`` axis and/or the image
    HEIGHT over a ``spatial`` axis (params replicated); GSPMD inserts the
    conv halo exchanges. Spatial partitioning is the per-frame *latency*
    lever — it splits each 480p frame's convolutions across chips, which
    batching cannot do — and produces masks identical to the single-chip
    path (tested on the virtual mesh). With a ``data`` axis,
    ``batch_size`` must divide by the axis size.
    """

    def __init__(self, model, batch_size: int = 4, mean=DAVIS_MEAN_BGR,
                 bf16: bool = False, mesh=None, int8: bool = False,
                 fold_bn: bool = False):
        self.model = model
        self.batch_size = batch_size
        self.mean = tuple(mean)
        self.bf16 = bf16
        self.mesh = mesh
        self.int8 = int8
        self.fold_bn = fold_bn
        self._qtree = None
        self._calibrated_weights = None
        self._fold_key = None
        self._fold_vars = None

        self._img_sharding = None
        self._replicated = None
        jit_kwargs = {}
        q_jit_kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from fosvos_tpu.parallel.mesh import pin_correct_partitioner
            pin_correct_partitioner()  # Shardy grad bug — see mesh.py
            data_ax = 'data' if 'data' in mesh.axis_names else None
            spatial_ax = 'spatial' if 'spatial' in mesh.axis_names else None
            if data_ax is None and spatial_ax is None:
                raise ValueError(
                    "inference mesh needs a 'data' and/or 'spatial' axis")
            if data_ax is not None and batch_size % mesh.shape[data_ax]:
                raise ValueError(
                    f'batch_size {batch_size} must divide by the data axis '
                    f"size {mesh.shape[data_ax]}")
            self._img_sharding = NamedSharding(mesh, P(data_ax, spatial_ax))
            replicated = NamedSharding(mesh, P())
            self._replicated = replicated
            jit_kwargs = dict(
                in_shardings=(replicated, self._img_sharding),
                out_shardings=self._img_sharding)
            q_jit_kwargs = dict(
                in_shardings=(replicated, replicated, self._img_sharding),
                out_shardings=self._img_sharding)

        def cast_in(variables, images):
            images = device_preprocess(images, self.mean)
            if bf16:
                images = images.astype(jnp.bfloat16)
                variables = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, variables)
            return variables, images

        def to_masks(outs):
            prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
            # reference saves the sigmoid map as PNG (experiment_helper.py:57,64)
            return jnp.round(prob * 255.0).astype(jnp.uint8)

        # folded_apply == model.apply when the variables carry no
        # 'bn_fold' collection, so one code path serves both modes (the
        # extra collection changes the jit pytree structure, keying a
        # separate compiled program automatically)
        @functools.partial(jax.jit, **jit_kwargs)
        def forward_masks(variables, images):
            from fosvos_tpu.compress import foldbn
            variables, images = cast_in(variables, images)
            return to_masks(foldbn.folded_apply(
                model, variables, images, train=False))

        @functools.partial(jax.jit, **jit_kwargs)
        def forward_logits(variables, images):
            from fosvos_tpu.compress import foldbn
            variables, images = cast_in(variables, images)
            return foldbn.folded_apply(
                model, variables, images,
                train=False)[-1].astype(jnp.float32)

        @functools.partial(jax.jit, **q_jit_kwargs)
        def forward_masks_q(variables, qtree, images):
            from fosvos_tpu.compress import foldbn, quantize
            variables, images = cast_in(variables, images)
            return to_masks(foldbn.folded_apply(
                model, variables, images, train=False,
                apply_fn=lambda v, x, **kw: quantize.quantized_apply(
                    model, v, qtree, x, **kw)))

        self._forward_masks_float = forward_masks
        self._forward_masks_q = forward_masks_q
        self._forward_logits = forward_logits

    @staticmethod
    def _weights_key(variables):
        """Identity snapshot of the served weights: the tuple of leaf
        buffers. Two trees serve the same weights iff every leaf is the
        same object — comparing leaves (not subtree dicts) is robust to
        mapping wrappers like flax ``FrozenDict``, whose ``__getitem__``
        rebuilds subtree objects on every access (a ``params``-subtree
        identity check would see a "new" tree per call and silently
        re-calibrate every serve step)."""
        return tuple(jax.tree_util.tree_leaves(variables))

    def _weights_stale(self, variables) -> bool:
        key = self._calibrated_weights
        if key is None:
            return True
        new = self._weights_key(variables)
        return len(key) != len(new) or any(
            a is not b for a, b in zip(key, new))

    def _folded(self, variables):
        """BN-folded serving tree for ``variables`` (compress/foldbn.py),
        cached by weights identity and pinned in HBM — numpy leaves would
        re-transfer per dispatch (see BENCHMARKS.md operational note)."""
        key = self._weights_key(variables)
        if self._fold_key is not None and len(key) == len(self._fold_key) \
                and all(a is b for a, b in zip(key, self._fold_key)):
            return self._fold_vars
        from fosvos_tpu.compress import foldbn
        folded = foldbn.fold(self.model, variables)
        self._fold_vars = jax.device_put(
            folded, self._replicated) if self._replicated is not None \
            else jax.device_put(folded)
        self._fold_key = key
        return self._fold_vars

    def calibrate(self, variables, frames: np.ndarray) -> None:
        """Build int8 scales/kernels from representative frames (uint8 raw
        or float32 preprocessed). Required before int8 serving; kernels are
        re-quantized per call, so re-calibrating after a weight update is
        one call. With ``fold_bn`` the quantization runs on the folded tree
        (whose identity BNs keep plain ``model.apply`` numerics correct),
        so scales match the kernels actually served."""
        from fosvos_tpu.compress import quantize
        if not self.int8:
            raise ValueError('engine was not built with int8=True')
        batch = np.asarray(frames)[:self.batch_size]
        qp = quantize.build_qparams(
            self.model, self._folded(variables) if self.fold_bn
            else variables, [batch],
            preprocess=lambda x: device_preprocess(x, self.mean))
        tree = qp.tree()
        if self._replicated is not None:
            tree = jax.device_put(tree, self._replicated)
        self._qtree = tree
        self._calibrated_weights = self._weights_key(variables)

    def set_qparams(self, variables, qparams) -> None:
        """Install pre-built quantized state for ``variables`` instead of
        self-calibrating — e.g. ``compress.qat.finalize``'s output, so
        serving uses the exact scales the QAT adaptation trained through.
        Pinned until the served weights change identity (then the engine
        falls back to self-calibration unless called again)."""
        if not self.int8:
            raise ValueError('engine was not built with int8=True')
        tree = qparams.tree() if hasattr(qparams, 'tree') else dict(qparams)
        if self.fold_bn:
            # external qparams were built against the UNFOLDED weights;
            # absorb the fold's per-channel g into the weight scales so
            # they dequantize correctly next to the folded tree
            from fosvos_tpu.compress import foldbn
            tree = foldbn.fold_qparams(self.model, variables, tree)
        if self._replicated is not None:
            tree = jax.device_put(tree, self._replicated)
        self._qtree = tree
        self._calibrated_weights = self._weights_key(variables)

    def _forward_masks(self, variables, images):
        if self.int8:
            # re-quantize when the weights change (a shared engine serves a
            # different adapted model per sequence in the online sweep) —
            # stale int8 kernels would silently serve the previous model.
            # Staleness/calibration key on the ORIGINAL tree; folding maps
            # it to the cached served tree afterwards.
            if self._qtree is None or self._weights_stale(variables):
                self.calibrate(variables, np.asarray(images))
            if self.fold_bn:
                variables = self._folded(variables)
            return self._forward_masks_q(variables, self._qtree, images)
        if self.fold_bn:
            variables = self._folded(variables)
        return self._forward_masks_float(variables, images)

    def _put(self, batch: np.ndarray) -> jax.Array:
        if self._img_sharding is not None:
            return jax.device_put(jnp.asarray(batch), self._img_sharding)
        return jnp.asarray(batch)

    def masks_for_sequence(self, variables, images: np.ndarray) -> np.ndarray:
        """uint8 (T,H,W) probability masks for a dense frame stack.

        All batches are dispatched before any result is read back, so
        transfers and compute pipeline — on a high-latency link this turns
        per-batch round trips into one."""
        t = images.shape[0]
        bs = self.batch_size
        pad = (-t) % bs
        if pad:
            images = np.concatenate([images, images[-1:].repeat(pad, 0)])
        futures = [self._forward_masks(variables, self._put(images[i:i + bs]))
                   for i in range(0, images.shape[0], bs)]
        chunks = [np.asarray(f) for f in futures]
        return np.concatenate(chunks)[:t]

    def benchmark(self, variables, images: np.ndarray, n_runs: int = 10
                  ) -> 'SpeedReport':
        """Reference timing methodology (experiment_helper.py:29-53) with a
        pipelined in-order fence: n_runs passes over the frames, the first
        pass (compilation/alloc) discarded, elapsed time fenced by a tiny
        readback of the final result. (Per-call ``block_until_ready`` is not
        reliable behind high-latency links — see runtime.timing.)"""
        bs = self.batch_size
        t = max(images.shape[0] - images.shape[0] % bs, bs)
        images = images[:t]
        if images.shape[0] < bs:
            images = np.concatenate([images] * bs)[:bs]
        batches = [self._put(images[i:i + bs])
                   for i in range(0, images.shape[0], bs)]
        r = None
        for b in batches:  # warmup pass, discarded like the reference
            r = self._forward_masks(variables, b)
        np.asarray(r[0, 0, :1])
        t0 = time.perf_counter()
        for _ in range(n_runs):
            for b in batches:
                r = self._forward_masks(variables, b)
        np.asarray(r[0, 0, :1])  # in-order fence
        n_frames = n_runs * len(batches) * bs
        elapsed = time.perf_counter() - t0
        return SpeedReport(
            n_frames=n_frames, batch_size=bs,
            mean_s_per_frame=elapsed / n_frames,
            fps=float(n_frames / elapsed))


@dataclasses.dataclass
class SpeedReport:
    n_frames: int
    batch_size: int
    mean_s_per_frame: float
    fps: float


def write_overlay_png(path: str, frame_bgr_u8: np.ndarray,
                      mask_u8: np.ndarray, threshold: float = 0.5) -> None:
    """Frame with the predicted mask blended in red + contour outline —
    the headless equivalent of the reference's live result window
    (``experiment_helper.py:83-104`` draws the overlaid prediction per
    frame with matplotlib)."""
    import cv2
    from fosvos_tpu.data.helpers import overlay_mask
    im = frame_bgr_u8.astype(np.float32) / 255.0
    ma = mask_u8.astype(np.float32) / 255.0 >= threshold
    # red in BGR channel order (the reference displays RGB via matplotlib)
    over = overlay_mask(im, ma, color=np.array([0, 0, 255]) / 255.0)
    cv2.imwrite(str(path), np.clip(over * 255.0, 0, 255).astype(np.uint8))


def test(model, variables, dataset: DAVIS2016, save_dir: str,
         seq_name: Optional[str] = None, eval_speeds: bool = False,
         batch_size: int = 4, engine: Optional[InferenceEngine] = None,
         is_visualizing_results: bool = False, bf16: bool = False,
         int8: bool = False, fold_bn: bool = False) -> Dict[str, object]:
    """Run inference over sequences and write masks (reference ``test()``).

    Output layout identical to the reference: ``<save_dir>/<seq>/<fname>.png``
    (experiment_helper.py:60-64). With ``is_visualizing_results``, overlay
    renders additionally go to ``<save_dir>/<seq>/overlays/``.
    """
    engine = engine or InferenceEngine(model, batch_size,
                                       mean=dataset.meanval, bf16=bf16,
                                       int8=int8, fold_bn=fold_bn)
    results: Dict[str, object] = {}
    seqs = [seq_name] if seq_name else dataset.sequence_names
    # uint8 ingest only when the engine's on-device mean matches the dataset
    # (a shared engine may have been built for a different mean)
    raw_ingest = tuple(engine.mean) == tuple(dataset.meanval)
    t_all = time.perf_counter()
    n_images = 0
    for seq in seqs:
        images, _, names = dataset.load_sequence(
            seq, raw=raw_ingest or is_visualizing_results)
        raw_images = images if images.dtype == np.uint8 else None
        if images.dtype == np.uint8 and not raw_ingest:
            # overlays wanted but the engine preprocesses with another mean:
            # fall back to host preprocessing for the forward
            images = (images.astype(np.float32)
                      - np.asarray(dataset.meanval, np.float32))
        n_images += len(names)
        if eval_speeds:
            results[seq] = engine.benchmark(variables, images)
        else:
            masks = engine.masks_for_sequence(variables, images)
            out_dir = Path(save_dir) / seq
            out_dir.mkdir(parents=True, exist_ok=True)
            write_masks_batch(out_dir, names, masks)
            if is_visualizing_results and raw_images is not None:
                ov_dir = out_dir / 'overlays'
                ov_dir.mkdir(exist_ok=True)
                for name, frame, m in zip(names, raw_images, masks):
                    write_overlay_png(str(ov_dir / f'{name}.png'), frame, m)
            results[seq] = masks
    results['total_time_s'] = time.perf_counter() - t_all
    results['n_images'] = n_images
    return results
