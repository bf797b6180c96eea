"""Train state pytree shared by all training pipelines."""
from __future__ import annotations

from typing import Any

import flax.struct
import optax


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any  # int32 scalar

    @property
    def variables(self):
        return {'params': self.params, 'batch_stats': self.batch_stats}


def create_state(variables, optimizer: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp
    params = variables['params']
    return TrainState(
        params=params,
        batch_stats=variables.get('batch_stats', {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
