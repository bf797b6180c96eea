from fosvos_tpu.core import ops  # noqa: F401
