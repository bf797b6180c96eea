from fosvos_tpu.compress import mimic, prune

__all__ = ['mimic', 'prune']
