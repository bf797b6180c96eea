"""Device selection — the reference's ``gpu_handler`` surface rebuilt for
meshes of TPU chips.

gpu_handler (``src/util/gpu_handler.py``) picks one CUDA device by id or by a
hostname map and silently falls back to CPU. Here:

* :func:`select_device` picks a jax.Device by platform/index with CPU
  fallback (and logs the choice like ``gpu_handler.py:32-36``)
* :func:`select_devices_by_hostname` reproduces the hostname→device-index
  map mechanism (``gpu_handler.py:12-15``) for shared multi-host setups
* real scale-out goes through ``fosvos_tpu.parallel.make_mesh``
"""
from __future__ import annotations

import socket
from typing import Dict, Optional

import jax

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)

# site-configurable hostname -> device index (gpu_handler.py:12-15)
HOSTNAME_DEVICE_MAP: Dict[str, int] = {}


def select_device(device_id: Optional[int] = None,
                  platform: Optional[str] = None) -> jax.Device:
    """Pick the compute device; CPU fallback mirrors
    ``cast_cuda_if_possible`` (gpu_handler.py:39-51)."""
    try:
        devices = jax.devices(platform) if platform else jax.devices()
    except RuntimeError:
        devices = jax.devices('cpu')
    if device_id is None:
        host = socket.gethostname()
        device_id = HOSTNAME_DEVICE_MAP.get(host, 0)
    device_id = min(device_id, len(devices) - 1)
    dev = devices[device_id]
    log.info('Using device: %s', dev)
    return dev


def default_device(device: jax.Device):
    """Context manager scoping computation to one device."""
    return jax.default_device(device)


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: fresh processes skip recompiles
    (multi-minute for 480p graphs on slow-compile backends). Keyed on the
    HLO, so stale entries are impossible. Opt out with FOSVOS_XLA_CACHE=0,
    or point FOSVOS_XLA_CACHE (or ``path``) at a directory."""
    import os
    setting = os.environ.get('FOSVOS_XLA_CACHE', '')
    if setting == '0':
        return
    path = path or setting or os.path.join(
        os.path.expanduser('~'), '.cache', 'fosvos_tpu', 'xla-cache')
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # cache every program regardless of compile time or size
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except (OSError, AttributeError):
        pass  # the cache is an optimization; never block on it


def enable_nan_debugging(enabled: bool = True) -> None:
    """NaN checking for every jitted computation (SURVEY.md §5: the
    framework's sanitizer knob — the reference has none)."""
    jax.config.update('jax_debug_nans', enabled)


def profiler_trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-viewable), the deep-profiling
    companion to the wall-clock timers in runtime.timing."""
    return jax.profiler.trace(log_dir)
