"""Device mesh utilities — the framework's replacement for the reference's
``gpu_handler`` (``src/util/gpu_handler.py``: pick one CUDA device by id or
hostname). On TPU the unit of scale is a **mesh** of chips connected by ICI;
workloads declare shardings over named axes and XLA inserts the collectives.

Axes used by this framework:

* ``data``    — batch data parallelism (offline parent training)
* ``spatial`` — H-dimension spatial partitioning of 480p feature maps
                (the analogous axis to sequence parallelism for conv nets,
                SURVEY.md §5)
* ``seq``     — embarrassingly-parallel per-video fan-out (online fine-tune,
                prune/mimic sweeps), replacing the reference's manual
                ``--sequence-group`` process sharding (args_helper.py:30-31)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pin_correct_partitioner() -> None:
    """Force the classic GSPMD partitioner: jax 0.9.0's default (Shardy)
    mis-reduces gradients of partially-replicated tensors.

    Repro (tools/repro_shardy_grad_bug.py): on a ('data', 'spatial') mesh
    with images sharded P(None, 'spatial') and the kernel replicated,
    ``grad(conv(x, k).sum())(k)`` comes back exactly ``data_axis_size``
    times too large under Shardy — the backward all-reduce runs over the
    full mesh instead of only the sharded axis. Forward values are correct;
    the classic partitioner computes the correct gradient (ratio 1.0).
    This silently corrupted spatial-sharded *training* (data-only sharding
    is unaffected); caught by the OnlineFinetuner(mesh=...) update-parity
    test. Re-evaluate when jax's Shardy fix lands (their b/433785288).
    """
    try:
        jax.config.update('jax_use_shardy_partitioner', False)
    except AttributeError:  # flag removed => Shardy presumed fixed
        pass


pin_correct_partitioner()


def make_mesh(axis_names: Sequence[str] = ('data',),
              shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh over the available devices.

    With no ``shape``, all devices go to the first axis. ``shape`` entries of
    -1 are inferred (like reshape; the device count must divide evenly). A
    fully-explicit ``shape`` smaller than the device count takes the first
    prod(shape) devices (e.g. a 1-device 'seq' mesh on an 8-device host) —
    -1 shapes never drop devices silently.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if n % known:
            raise ValueError(
                f'cannot infer -1 in mesh shape {shape}: {n} devices are '
                f'not divisible by {known}')
        shape[shape.index(-1)] = n // known
    else:
        want = int(np.prod(shape))
        if want < n:
            devices = devices[:want]
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def batch_spatial_sharded(mesh: Mesh, data_axis: str = 'data',
                          spatial_axis: str = 'spatial') -> NamedSharding:
    """NHWC images sharded over batch and H (spatial conv partitioning;
    GSPMD inserts the halo exchanges)."""
    return NamedSharding(mesh, P(data_axis, spatial_axis))


def local_device_count() -> int:
    return jax.local_device_count()
