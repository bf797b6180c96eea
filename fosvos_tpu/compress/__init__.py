from fosvos_tpu.compress import foldbn, mimic, prune, qat, quantize

__all__ = ['foldbn', 'mimic', 'prune', 'qat', 'quantize']
