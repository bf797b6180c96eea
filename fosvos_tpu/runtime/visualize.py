"""Computation-graph visualization — the TPU-native equivalent of the
reference's autograd graphviz dump (``src/visualize.py`` +
``io_helper.visualize_network``).

In XLA-land the artifacts that matter are the jaxpr (framework-level trace)
and the optimized HLO (what the chip actually runs); both are dumped as text
next to a run.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def visualize_network(model, variables, input_shape=(1, 480, 854, 3),
                      out_dir: str = '.', name: str = 'network') -> dict:
    """Write ``<name>.jaxpr.txt`` and ``<name>.hlo.txt`` for the forward pass
    (reference renders the autograd graph on a 1x3x480x854 input,
    io_helper.py:23-28)."""
    x = jnp.zeros(input_shape, jnp.float32)

    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    jaxpr = jax.make_jaxpr(fwd)(variables, x)
    lowered = jax.jit(fwd).lower(variables, x)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    jaxpr_path = out / f'{name}.jaxpr.txt'
    hlo_path = out / f'{name}.hlo.txt'
    jaxpr_path.write_text(str(jaxpr))
    hlo_path.write_text(lowered.as_text())
    log.info('Wrote %s and %s', jaxpr_path, hlo_path)
    return {'jaxpr': str(jaxpr_path), 'hlo': str(hlo_path)}
