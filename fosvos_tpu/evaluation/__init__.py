from fosvos_tpu.evaluation import experiment, metrics

__all__ = ['experiment', 'metrics', 'fleet', 'elastic', 'service']


def __getattr__(name):
    # serving modules re-exported lazily: they pull the train/compress
    # stacks, which plain metric/eval users never need
    if name in ('fleet', 'elastic', 'service'):
        import importlib
        return importlib.import_module(f'fosvos_tpu.evaluation.{name}')
    raise AttributeError(name)
