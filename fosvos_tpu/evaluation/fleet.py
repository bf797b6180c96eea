"""Fleet serving: one dispatch serves S per-sequence adapted models.

The reference serves ONE adapted model per process (``run_webcam.py``; the
per-sequence test loop, ``experiment_helper.py:20-64``) — production
one-shot VOS means many concurrent streams, each segmented by its *own*
adapted weights (the whole point of OSVOS is per-video adaptation).

The TPU-native shape, chosen by measurement (``tools/bench_fleet_serving.py``):
stack the adapted params over a leading stream axis and ``lax.scan`` the
forward over the (params_k, frame_k) pairs inside ONE compiled program.

* each scanned step runs the exact batch-1 forward — convolutions keep
  their single-model shapes and full MXU efficiency. (``vmap`` over params
  was measured first and rejected: it lowers convs to batched-kernel
  contractions that ran **3.8x slower** than per-stream dispatches at
  480p/S=8; scan keeps the math per-stream while still fusing the fleet
  into one program.)
* the whole fleet costs one host->device frame upload, one dispatch, and
  one device->host mask readback per step — S separate dispatches pay S
  transfer round trips, which behind a high-latency host link dominates
  end-to-end (measured 2.1x there).
* on a mesh, streams shard over ``'seq'`` via ``shard_map`` (each chip
  scans its local streams) with zero cross-chip communication, exactly
  like the adaptation fan-out (``parallel/fanout.py``).

Weights stay resident in HBM between frames (the ``InferenceEngine`` wire
format: uint8 frames in, uint8 sigmoid maps out,
``experiment.device_preprocess``).
"""
from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
from fosvos_tpu.evaluation.experiment import device_preprocess


def stack_variables(variables_list: Sequence[Any]) -> Any:
    """Stack per-stream model variables over a new leading stream axis
    (inverse of indexing a :class:`parallel.fanout.FanoutResult`)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *variables_list)


class FleetServer:
    """Segment S streams with S different adapted models in one dispatch.

    Args:
      model: the (shared) model topology; every stream's weights must fit it.
      bf16: serve in bfloat16 (params cast in-graph, same contract as the
        engine's ``bf16`` flag).
      int8: serve with post-training-quantized convs (``compress/quantize``:
        per-channel int8 weights, per-stream calibrated activation scales,
        int8 x int8 -> int32 MXU contractions). Each stream calibrates
        against its own frames — on the first :meth:`segment` step if
        :meth:`calibrate` was not called. Composes with ``bf16`` and
        ``mesh`` exactly like ``InferenceEngine``.
      mesh: optional ``jax.sharding.Mesh`` with a ``'seq'`` axis — streams
        shard across chips, communication-free; the stream count must
        divide the axis size evenly.
      mean: BGR channel mean subtracted on device from uint8 frames.
    """

    def __init__(self, model, bf16: bool = False, int8: bool = False,
                 mesh=None, mean=DAVIS_MEAN_BGR):
        self.model = model
        self.mean = tuple(mean)
        self.mesh = mesh
        self.int8 = int8
        self._qtree = None
        self._calibrated_weights = None
        self._stream_sharding = None
        jit_kwargs = {}

        def cast_in(variables, frame):
            frame = device_preprocess(frame[None], self.mean)
            if bf16:
                frame = frame.astype(jnp.bfloat16)
                variables = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, variables)
            return variables, frame

        def to_mask(outs):
            prob = jax.nn.sigmoid(outs[-1][0, ..., 0].astype(jnp.float32))
            return jnp.round(prob * 255.0).astype(jnp.uint8)

        def one_stream(variables, frame):
            variables, frame = cast_in(variables, frame)
            return to_mask(model.apply(variables, frame, train=False))

        def one_stream_q(variables, qtree, frame):
            from fosvos_tpu.compress import quantize
            variables, frame = cast_in(variables, frame)
            return to_mask(quantize.quantized_apply(
                model, variables, qtree, frame))

        def scan_streams(stacked_variables, frames):
            # fully unrolled: per-stream params indexing becomes static, so
            # XLA schedules S back-to-back b1 forwards with no dynamic-slice
            # copies of the weights (measured vs rolled scan below)
            _, masks = jax.lax.scan(
                lambda c, vx: (c, one_stream(*vx)), None,
                (stacked_variables, frames), unroll=True)
            return masks

        def scan_streams_q(stacked_variables, stacked_qtree, frames):
            _, masks = jax.lax.scan(
                lambda c, vx: (c, one_stream_q(*vx)), None,
                (stacked_variables, stacked_qtree, frames), unroll=True)
            return masks

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from fosvos_tpu.parallel.mesh import pin_correct_partitioner
            pin_correct_partitioner()  # Shardy grad bug — see mesh.py
            if 'seq' not in mesh.axis_names:
                raise ValueError("fleet mesh needs a 'seq' axis")
            self._stream_sharding = NamedSharding(mesh, P('seq'))
            jit_kwargs = dict(in_shardings=(self._stream_sharding,
                                            self._stream_sharding),
                              out_shardings=self._stream_sharding)
            q_jit_kwargs = dict(in_shardings=(self._stream_sharding,) * 3,
                                out_shardings=self._stream_sharding)
            spec = P('seq')

            @functools.partial(jax.jit, **jit_kwargs)
            def forward_fleet(stacked_variables, frames):
                # scan is sequential by construction, so GSPMD cannot
                # split it — shard_map gives each chip its own local scan
                return jax.shard_map(
                    scan_streams, mesh=mesh,
                    in_specs=(spec, spec), out_specs=spec,
                )(stacked_variables, frames)

            @functools.partial(jax.jit, **q_jit_kwargs)
            def forward_fleet_q(stacked_variables, stacked_qtree, frames):
                return jax.shard_map(
                    scan_streams_q, mesh=mesh,
                    in_specs=(spec, spec, spec), out_specs=spec,
                )(stacked_variables, stacked_qtree, frames)
        else:
            forward_fleet = jax.jit(scan_streams)
            forward_fleet_q = jax.jit(scan_streams_q)

        self._forward_fleet = forward_fleet
        self._forward_fleet_q = forward_fleet_q

    def put_weights(self, variables_list: Sequence[Any]) -> Any:
        """Stack per-stream variables and pin them in HBM (sharded over the
        mesh's 'seq' axis when one is configured). Call once per fleet; the
        returned stacked tree is what :meth:`segment` takes."""
        if self.mesh is not None \
                and len(variables_list) % self.mesh.shape['seq']:
            raise ValueError(
                f'{len(variables_list)} streams do not divide evenly over '
                f"the {self.mesh.shape['seq']}-device 'seq' axis")
        stacked = stack_variables(variables_list)
        if self._stream_sharding is not None:
            return jax.device_put(stacked, self._stream_sharding)
        return jax.device_put(stacked)

    @staticmethod
    def _weights_key(stacked_variables):
        """Identity snapshot of the served weights: the tuple of leaf
        buffers. Two trees serve the same weights iff every leaf is the
        same object — comparing leaves (not subtree dicts) is robust to
        mapping wrappers like flax ``FrozenDict``, whose ``__getitem__``
        rebuilds subtree objects on every access."""
        return tuple(jax.tree_util.tree_leaves(stacked_variables))

    def _weights_stale(self, stacked_variables) -> bool:
        key = self._calibrated_weights
        if key is None:
            return True
        new = self._weights_key(stacked_variables)
        return len(key) != len(new) or any(
            a is not b for a, b in zip(key, new))

    def stream_qparams(self, variables, frame: np.ndarray):
        """Calibrate ONE stream's int8 params against its own weights on
        one (H, W, 3) frame (shared by :meth:`calibrate` and the elastic
        fleet's per-slot installs)."""
        from fosvos_tpu.compress import quantize
        return quantize.build_qparams(
            self.model, variables, [np.asarray(frame)[None]],
            preprocess=lambda x: device_preprocess(x, self.mean))

    def calibrate(self, stacked_variables, frames: np.ndarray) -> None:
        """Build per-stream int8 scales/kernels: stream k calibrates on
        ``frames[k]`` against its own weights, then the S quantized trees
        stack over the stream axis like the float params."""
        if not self.int8:
            raise ValueError('fleet server was not built with int8=True')
        frames = np.asarray(frames)
        n = frames.shape[0]
        qtrees = []
        for k in range(n):
            vars_k = jax.tree.map(lambda a: a[k], stacked_variables)
            qtrees.append(self.stream_qparams(vars_k, frames[k]).tree())
        stacked_q = jax.tree.map(lambda *xs: jnp.stack(xs), *qtrees)
        if self._stream_sharding is not None:
            stacked_q = jax.device_put(stacked_q, self._stream_sharding)
        self._qtree = stacked_q
        self._calibrated_weights = self._weights_key(stacked_variables)

    def segment_async(self, stacked_variables, frames: np.ndarray):
        """Enqueue one fleet dispatch and return the (S, H, W) uint8 mask
        result as an *unfetched* device array — ``np.asarray`` on it fences.
        Streaming callers use this to overlap host work (frame decode, mask
        PNG writes) with the device step, the same double-buffer pattern as
        ``cli/run_webcam.py``."""
        if self.int8:
            # re-quantize when the served weights change — stale int8
            # kernels would silently serve the previous fleet
            if self._qtree is None or self._weights_stale(stacked_variables):
                self.calibrate(stacked_variables, np.asarray(frames))
            return self._forward_fleet_q(
                stacked_variables, self._qtree, jnp.asarray(frames))
        return self._forward_fleet(stacked_variables, jnp.asarray(frames))

    def segment(self, stacked_variables, frames: np.ndarray) -> np.ndarray:
        """(S, H, W, 3) uint8 BGR (or preprocessed float32) frames — one per
        stream — to (S, H, W) uint8 sigmoid maps, one dispatch."""
        return np.asarray(self.segment_async(stacked_variables, frames))
