"""CLI entry points.

Importing this package enables a persistent XLA compilation cache for the
CLIs (fresh processes skip the multi-minute 480p compiles on slow-compile
backends). Library users importing ``fosvos_tpu`` directly are not affected.
Opt out with ``FOSVOS_XLA_CACHE=0`` (see runtime.device.enable_compilation_cache).
"""
try:
    from fosvos_tpu.runtime.device import enable_compilation_cache
    enable_compilation_cache()
except ImportError:
    pass
