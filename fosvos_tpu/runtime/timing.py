"""Timing utilities with device-synchronization semantics.

The reference brackets GPU work with ``cuda.synchronize()`` pairs
(``experiment_helper.py:42-53``); on TPU the equivalents are
``jax.block_until_ready`` or — behind a high-latency link — an in-order
pipeline fence (enqueue N programs, read back a scalar of the last result;
TPU executes programs in order so the elapsed time covers all N).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


class Timer:
    """Wall-clock span timer (reference timeit.default_timer spans)."""

    def __init__(self):
        self.start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.start


def time_blocked(fn: Callable, *args, n_runs: int = 10,
                 skip_first: bool = True) -> np.ndarray:
    """Per-call times with block_until_ready; first call (compile/alloc)
    optionally discarded — the reference methodology."""
    times = []
    for i in range(n_runs + (1 if skip_first else 0)):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        if not (skip_first and i == 0):
            times.append(dt)
    return np.asarray(times)


def _fence(result) -> None:
    """Read back ONE element of the last result. The slice executes on
    device (in order, after every enqueued program), so only a scalar
    crosses the link — a full-array ``np.asarray`` would add the whole
    D2H transfer of the result to the measured span."""
    np.asarray(jax.tree.leaves(result)[0].ravel()[:1])


def time_pipelined(fn: Callable, *args, n_runs: int = 20) -> float:
    """Mean per-call device time via an in-order pipeline fence. Correct on
    single-stream backends (TPU); preferred when host<->device latency would
    otherwise dominate per-call measurements."""
    r = fn(*args)
    _fence(r)  # warm + sync
    t0 = time.perf_counter()
    for _ in range(n_runs):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / n_runs
