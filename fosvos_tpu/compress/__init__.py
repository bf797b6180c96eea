from fosvos_tpu.compress import mimic, prune, qat, quantize

__all__ = ['mimic', 'prune', 'qat', 'quantize']
