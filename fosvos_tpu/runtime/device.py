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
    or point FOSVOS_XLA_CACHE (or ``path``) at a directory.

    Safe to call after compiles have already happened: jax initializes its
    persistent-cache singleton at most once per process, so a bare
    ``jax.config.update('jax_compilation_cache_dir', ...)`` after the first
    compile is a silent no-op (the process keeps writing to the *old* dir).
    When re-pointing to a different directory this resets that singleton so
    the new location actually takes effect — ``fosvos-warmup --cache-dir``
    depends on this."""
    import os
    setting = os.environ.get('FOSVOS_XLA_CACHE', '')
    if setting == '0':
        return
    path = path or setting or os.path.join(
        os.path.expanduser('~'), '.cache', 'fosvos_tpu', 'xla-cache')
    try:
        os.makedirs(path, exist_ok=True)
        _repoint_persistent_cache(path)
        jax.config.update('jax_compilation_cache_dir', path)
        # cache every program regardless of compile time or size
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except (OSError, AttributeError):
        pass  # the cache is an optimization; never block on it


def _repoint_persistent_cache(path: str) -> None:
    """Reset jax's once-per-process persistent-cache singleton when the
    target directory changes, so the next compile re-initializes it at
    ``path``. Best-effort: touches a private module, degrades to the old
    (first-dir-wins) behavior if jax internals move."""
    try:
        from jax._src import compilation_cache as _cc
        current = jax.config.jax_compilation_cache_dir
        if getattr(_cc, '_cache_initialized', False) and current != path:
            _cc.reset_cache()
            log.info('re-pointed persistent XLA cache %s -> %s',
                     current, path)
    except Exception:  # pragma: no cover - jax-internal layout changed
        pass


def enable_nan_debugging(enabled: bool = True) -> None:
    """NaN checking for every jitted computation (SURVEY.md §5: the
    framework's sanitizer knob — the reference has none)."""
    jax.config.update('jax_debug_nans', enabled)


def profiler_trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-viewable), the deep-profiling
    companion to the wall-clock timers in runtime.timing."""
    return jax.profiler.trace(log_dir)
