from fosvos_tpu.runtime import checkpoint, device, providers, tb, timing
from fosvos_tpu.runtime.logging import get_logger

__all__ = ['checkpoint', 'device', 'providers', 'tb', 'timing', 'get_logger']
