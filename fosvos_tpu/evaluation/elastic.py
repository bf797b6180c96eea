"""Elastic fleet serving: streams join/leave without per-change recompiles.

:class:`fosvos_tpu.evaluation.fleet.FleetServer` compiles one program per
stream count S (the unrolled scan is specialized to S). A production fleet
is not static — cameras connect and disconnect — and naively re-stacking
the fleet at the new S pays a full 480p recompile (minutes on first sight)
plus a full re-upload of every stream's weights.

:class:`ElasticFleet` makes membership changes O(one stream) and keeps the
compiled-program set bounded, the XLA way — static shapes + bucketing:

* a **capacity-sized slot tree** stays resident in HBM; a joining stream
  writes its weights into one free slot (one-slot ``.at[k].set`` scatter —
  uploads only that stream's weights), a leaving stream just frees its
  slot index on the host;
* serving **gathers the active slots, on device, into a bucket-sized
  stacked tree** (buckets = powers of two up to capacity, or multiples of
  the mesh's ``'seq'`` axis when sharded) and runs the ``FleetServer``
  program for that bucket size. At most ``log2(capacity)`` fleet programs
  ever compile, each exactly once, and at most half the bucket's scanned
  forwards are padding;
* padding slots repeat the last active stream's index, so the padded
  program stays shape-identical while the wasted compute is a duplicate
  forward whose mask is dropped on the host.

The reference has no serving story beyond one process per stream
(``/root/reference/src/run_webcam.py``); elasticity there is "start or
kill a process". Here it is two host-side dicts and three tiny jitted
helpers around the measured fleet design.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
from fosvos_tpu.evaluation.fleet import FleetServer


def _bucket_sizes(capacity: int, quantum: int) -> Tuple[int, ...]:
    """Ascending serve sizes: the smallest power-of-two multiples of
    ``quantum`` covering 1..capacity (quantum = the mesh 'seq' axis size,
    1 off-mesh)."""
    sizes: List[int] = []
    b = quantum
    while b < capacity:
        sizes.append(b)
        b *= 2
    sizes.append(capacity)
    return tuple(sizes)


class ElasticFleet:
    """A :class:`FleetServer` whose stream set can change cheaply.

    Args:
      model: shared topology for every stream (same contract as
        ``FleetServer``).
      capacity: maximum concurrent streams; the slot tree is allocated at
        this size on the first :meth:`add`.
      bf16 / int8 / mesh / mean: forwarded to :class:`FleetServer`. With a
        mesh, ``capacity`` must be a multiple of the ``'seq'`` axis size
        and buckets are ``seq``-axis multiples instead of raw powers of
        two.
      serve_cache: keep the gathered bucket-sized weight tree (and int8
        qtree) resident in HBM between frames, re-gathering only when
        membership or a slot's weights change (default). **HBM cost:** the
        cache holds a second, bucket-sized copy of the active weights
        alongside the capacity slot tree — roughly doubling steady-state
        weight residency (e.g. a 16-slot resnet18 fleet: ~0.9 GB slots +
        up to ~0.9 GB cache in fp32). Memory-tight deployments can pass
        ``serve_cache=False`` to re-gather per frame instead (one extra
        on-device copy per dispatch, no retained duplicate).
    """

    def __init__(self, model, capacity: int, bf16: bool = False,
                 int8: bool = False, mesh=None, mean=DAVIS_MEAN_BGR,
                 serve_cache: bool = True):
        if capacity < 1:
            raise ValueError('capacity must be >= 1')
        quantum = 1
        if mesh is not None:
            quantum = mesh.shape['seq']
            if capacity % quantum:
                raise ValueError(
                    f'capacity {capacity} must be a multiple of the '
                    f"{quantum}-device 'seq' axis")
        self.capacity = capacity
        self._server = FleetServer(model, bf16=bf16, int8=int8, mesh=mesh,
                                   mean=mean)
        self._buckets = _bucket_sizes(capacity, quantum)
        self._slots = None            # capacity-stacked variables tree
        self._qslots = None           # capacity-stacked int8 qparam tree
        self._active: List[int] = []  # slot ids, serving order
        self._free: List[int] = []
        self._int8 = int8

        # the slot tree is donated: the one-slot scatter aliases the
        # resident buffers instead of copying the whole capacity tree
        @functools.partial(jax.jit, donate_argnums=0)
        def set_slot(stacked, k, variables):
            return jax.tree.map(lambda s, v: s.at[k].set(v), stacked,
                                variables)

        def gather(stacked, idx):
            return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), stacked)

        def tile(variables):
            # capacity-tree allocation from ONE device-resident copy: the
            # broadcast happens in HBM, so the first add() uploads one
            # stream's weights, not `capacity` host copies of them
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a[None],
                                           (capacity,) + a.shape), variables)

        self._set_slot = set_slot
        # the fleet program requires 'seq'-sharded inputs; pin the gathered
        # bucket tree's sharding (jnp.take would otherwise replicate it)
        sharding = self._server._stream_sharding
        shard_kw = ({'out_shardings': sharding} if sharding is not None
                    else {})
        self._gather = jax.jit(gather, **shard_kw)
        self._tile = jax.jit(tile, **shard_kw)
        # steady-state serve cache: the gathered bucket trees are reused
        # until membership (or a slot's weights) changes — without it every
        # frame re-copies the full active weight set inside HBM. Costs a
        # retained bucket-sized weight copy; serve_cache=False trades that
        # HBM for a per-frame gather (see class docstring).
        self._serve_cache = serve_cache
        self._cache_idx = None
        self._cache_gathered = None
        self._cache_qgathered = None

    # -- membership -------------------------------------------------------

    @property
    def active_slots(self) -> Tuple[int, ...]:
        """Slot ids in serving order — ``segment``'s frames and returned
        masks align with this tuple."""
        return tuple(self._active)

    @property
    def free_slots(self) -> int:
        """Slots available for :meth:`add` right now."""
        if self._slots is None:
            return self.capacity
        return len(self._free)

    def _invalidate_serve_cache(self) -> None:
        self._cache_idx = None
        self._cache_gathered = None
        self._cache_qgathered = None

    def add(self, variables, calib_frame: Optional[np.ndarray] = None,
            qparams=None) -> int:
        """Register a stream; returns its slot id.

        Uploads only this stream's weights (one-slot scatter into the
        resident tree). With ``int8=True`` either a ``calib_frame``
        (H, W, 3) is required — the stream's activation scales are
        calibrated against its own weights before it ever serves — or
        pre-built ``qparams`` (``compress.quantize.QuantizedParams``, e.g.
        from ``compress.qat.finalize`` so serving uses the scales the QAT
        adaptation trained through).
        """
        if self._int8 and calib_frame is None and qparams is None:
            raise ValueError('int8 elastic fleet: add(..., calib_frame=) '
                             'or add(..., qparams=) is required for a '
                             'joining stream')
        if self._slots is None:
            # first stream: upload ONE copy, broadcast to capacity in HBM
            self._slots = self._tile(jax.tree.map(jnp.asarray, variables))
            self._active = [0]
            self._free = list(range(1, self.capacity))
            k = 0
        else:
            if not self._free:
                raise ValueError(f'fleet is at capacity ({self.capacity})')
            k = self._free.pop(0)
            self._slots = self._set_slot(self._slots, k,
                                         jax.tree.map(jnp.asarray,
                                                      variables))
            self._active.append(k)
        if self._int8:
            self._install_qslot(k, variables, calib_frame, qparams)
        self._invalidate_serve_cache()
        return k

    def get_weights(self, slot: int):
        """Read one active slot's weights back to the host (e.g. to persist
        an adapted stream as a checkpoint)."""
        if slot not in self._active:
            raise ValueError(f'slot {slot} is not active')
        return jax.device_get(jax.tree.map(lambda a: a[slot], self._slots))

    def remove(self, slot: int) -> None:
        """Deactivate a stream; its HBM slot is recycled for the next
        :meth:`add`. Nothing device-side happens."""
        self._active.remove(slot)
        self._free.insert(0, slot)  # freed slots are recycled first
        self._invalidate_serve_cache()

    def swap_weights(self, slot: int, variables,
                     calib_frame: Optional[np.ndarray] = None,
                     qparams=None) -> None:
        """Replace one active stream's weights in place (e.g. after a
        re-adaptation pass) — same one-slot upload as :meth:`add`."""
        if slot not in self._active:
            raise ValueError(f'slot {slot} is not active')
        if self._int8 and calib_frame is None and qparams is None:
            raise ValueError('int8 elastic fleet: swap_weights needs a '
                             'calib_frame (re-calibrate) or qparams '
                             '(pre-built scales) for the stream')
        self._slots = self._set_slot(self._slots, slot,
                                     jax.tree.map(jnp.asarray, variables))
        if self._int8:
            self._install_qslot(slot, variables, calib_frame, qparams)
        self._invalidate_serve_cache()

    def _install_qslot(self, k: int, variables, calib_frame,
                       qparams=None) -> None:
        if qparams is not None:
            qtree = qparams.tree() if hasattr(qparams, 'tree') \
                else dict(qparams)
        else:
            qtree = self._server.stream_qparams(variables, calib_frame).tree()
        qtree = jax.tree.map(jnp.asarray, qtree)
        if self._qslots is None:
            self._qslots = self._tile(qtree)
        else:
            self._qslots = self._set_slot(self._qslots, k, qtree)

    # -- serving ----------------------------------------------------------

    def _serve_indices(self) -> Tuple[int, np.ndarray]:
        n = len(self._active)
        bucket = next(b for b in self._buckets if b >= n)
        idx = np.asarray(self._active + [self._active[-1]] * (bucket - n),
                         np.int32)
        return n, idx

    def segment_async(self, frames: np.ndarray):
        """Like :meth:`segment`, but returns the (n_active, H, W) uint8
        masks as an *unfetched* device array (``np.asarray`` fences).
        Membership may churn while the dispatch is in flight — the gather
        snapshotted the active slots, so the result is unaffected."""
        if not self._active:
            raise ValueError('no active streams')
        frames = np.asarray(frames)
        if frames.shape[0] != len(self._active):
            raise ValueError(
                f'{frames.shape[0]} frames for {len(self._active)} active '
                f'streams (order = active_slots)')
        n, idx = self._serve_indices()
        pad = idx.shape[0] - n
        if pad:
            frames = np.concatenate([frames, frames[-1:].repeat(pad, 0)], 0)
        key = tuple(int(i) for i in idx)
        if key != self._cache_idx:   # membership/weights changed: re-gather
            jidx = jnp.asarray(idx)
            self._cache_gathered = self._gather(self._slots, jidx)
            if self._int8:
                self._cache_qgathered = self._gather(self._qslots, jidx)
            self._cache_idx = key if self._serve_cache else None
        gathered = self._cache_gathered
        qgathered = self._cache_qgathered
        if not self._serve_cache:    # memory-tight mode: nothing retained
            self._cache_gathered = self._cache_qgathered = None
        if self._int8:
            # the per-slot qtrees were calibrated at add/swap time, so the
            # FleetServer must not re-calibrate against the gathered view
            self._server._qtree = qgathered
            self._server._calibrated_weights = \
                self._server._weights_key(gathered)
        masks = self._server.segment_async(gathered, frames)
        return masks[:n]

    def segment(self, frames: np.ndarray) -> np.ndarray:
        """(n_active, H, W, 3) uint8 frames, aligned with
        :attr:`active_slots`, to (n_active, H, W) uint8 sigmoid maps.

        One on-device gather of the active slots into the current bucket's
        stacked tree (cached across steps until membership or a slot's
        weights change), one fleet dispatch; padding masks are dropped here.
        """
        return np.asarray(self.segment_async(frames))
