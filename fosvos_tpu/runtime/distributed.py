"""Multi-host (pod-slice) wiring: DCN process group + global meshes.

The reference's entire multi-machine story is a hostname->GPU-id map
(``src/util/gpu_handler.py:12-15``) plus manually launched processes over
disjoint sequence shards (``src/util/args_helper.py:30-31``,
``src/train_online.py:183-186``). The TPU-native replacement is one process
per host joined into a single JAX runtime over DCN:

* :func:`initialize` — idempotent ``jax.distributed.initialize`` driven by
  CLI args or the standard env vars; a silent no-op for single-process runs
  so every CLI can call it unconditionally.
* :func:`global_mesh` — a mesh over **all** devices in the slice, laid out
  host-major so that trailing mesh axes stay inside a host's ICI domain and
  only the leading (data / seq) axis ever crosses DCN — the
  collectives-ride-ICI layout.
* :func:`process_local_batch` — the per-host slice of a global batch, for
  feeding ``jax.make_array_from_process_local_data``.
* :func:`is_primary` / :func:`primary_only` — rank-0 guards for checkpoint
  and TensorBoard writes.

Pod launch (one command per host)::

    JAX_COORDINATOR_ADDRESS=host0:8476 JAX_NUM_PROCESSES=4 \\
    JAX_PROCESS_ID=<k> python -m fosvos_tpu.cli.train_offline --data-parallel ...

On Cloud TPU pod slices all three env vars are auto-detected and
``initialize()`` needs no arguments at all.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import numpy as np

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> int:
    """Join the DCN process group; returns this host's process index.

    Arguments default to ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES``
    / ``JAX_PROCESS_ID`` (and to full auto-detection on Cloud TPU pods).
    Single-process runs — no coordinator configured anywhere — are a no-op,
    so CLIs call this unconditionally. Idempotent within a process.
    """
    global _initialized
    coordinator_address = (coordinator_address
                           or os.environ.get('JAX_COORDINATOR_ADDRESS'))
    if num_processes is None and 'JAX_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and 'JAX_PROCESS_ID' in os.environ:
        process_id = int(os.environ['JAX_PROCESS_ID'])

    if _initialized:
        return jax.process_index()
    if coordinator_address is None and num_processes is None:
        # single process (or TPU-pod auto-detect explicitly requested via
        # JAX_NUM_PROCESSES); nothing to join
        return jax.process_index()

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _initialized = True
    log.info('DCN process group: process %d/%d, %d local / %d global devices',
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return jax.process_index()


def global_mesh(axis_names: Sequence[str] = ('data',),
                shape: Optional[Sequence[int]] = None) -> 'jax.sharding.Mesh':
    """Mesh over every device in the slice, host-major.

    ``jax.devices()`` is already globally ordered process-major, so with no
    explicit ``shape`` the leading axis spans hosts (DCN) and any trailing
    axes subdivide each host's local devices (ICI). With a ``shape``, the
    leading dimension should be a multiple of the process count for the
    same property to hold.
    """
    from fosvos_tpu.parallel import make_mesh
    return make_mesh(axis_names, shape=shape, devices=jax.devices())


def process_local_batch(global_batch: np.ndarray,
                        axis: int = 0) -> np.ndarray:
    """This host's contiguous shard of a host-major global batch."""
    n = jax.process_count()
    idx = jax.process_index()
    size = global_batch.shape[axis]
    if size % n:
        raise ValueError(f'global batch axis {axis} ({size}) not divisible '
                         f'by process count {n}')
    per = size // n
    sl = [slice(None)] * global_batch.ndim
    sl[axis] = slice(idx * per, (idx + 1) * per)
    return global_batch[tuple(sl)]


def is_primary() -> bool:
    """True on the rank-0 process — the only one that should write
    checkpoints/TensorBoard (every host computes identical replicated state)."""
    return jax.process_index() == 0


def primary_only(fn):
    """Decorator: run ``fn`` on the primary process only (returns None
    elsewhere)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None
    return wrapper
