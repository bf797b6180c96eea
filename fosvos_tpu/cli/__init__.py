"""CLI entry points.

Importing this package enables a persistent XLA compilation cache for the
CLIs (fresh processes skip the multi-minute 480p compiles on slow-compile
backends; the cache is keyed on the HLO so stale entries are impossible).
Library users importing ``fosvos_tpu`` directly are not affected. Opt out
with ``FOSVOS_XLA_CACHE=0`` or point ``FOSVOS_XLA_CACHE`` at a directory.
"""
import os


def _enable_compilation_cache() -> None:
    setting = os.environ.get('FOSVOS_XLA_CACHE', '')
    if setting == '0':
        return
    path = setting or os.path.join(
        os.path.expanduser('~'), '.cache', 'fosvos_tpu', 'xla-cache')
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        # cache every program regardless of compile time or size
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except (ImportError, OSError, AttributeError):
        pass  # cache is an optimization; never block the CLI on it


_enable_compilation_cache()
