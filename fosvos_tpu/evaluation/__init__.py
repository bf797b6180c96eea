from fosvos_tpu.evaluation import experiment, metrics

__all__ = ['experiment', 'metrics']
