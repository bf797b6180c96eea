"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's strategy: TPU hardware is not required for any test;
multi-chip logic is exercised via ``xla_force_host_platform_device_count``.

Note: in this environment jax is pre-imported at interpreter startup (so
``JAX_PLATFORMS`` env is already consumed); we must redirect via
``jax.config.update`` before any backend initializes.
"""
import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: CPU compiles dominate suite runtime on this
# single-core machine; repeat runs hit the cache.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
