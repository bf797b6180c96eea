from fosvos_tpu.train import losses, offline, online, optimizers
from fosvos_tpu.train.state import TrainState, create_state

__all__ = ['losses', 'offline', 'online', 'optimizers', 'TrainState',
           'create_state']
