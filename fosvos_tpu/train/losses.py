"""Loss composition for OSVOS training pipelines."""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from fosvos_tpu.core.ops import class_balanced_cross_entropy_loss


def deep_supervision_loss(outputs: Sequence[jax.Array], gts: jax.Array,
                          epoch_frac: jax.Array
                          ) -> Tuple[jax.Array, List[jax.Array]]:
    """Offline (parent) loss, reference ``train_offline.py:84-88``.

    Per-output CB-BCE (``size_average=False``), total =
    ``(1 - epoch/n_epochs) * sum(side losses) + fuse loss`` — the side
    supervision anneals away over training.

    Deliberately five plain-XLA loss calls: each map's reductions fuse into
    its producer head, so the logits never round-trip HBM. A single-pass
    Pallas kernel over all five maps (which must materialize its inputs)
    measured 17% *slower* per train step — see BENCHMARKS.md "Pallas
    kernels: measured and retired".
    """
    losses = [class_balanced_cross_entropy_loss(o, gts, size_average=False)
              for o in outputs]
    total = (1.0 - epoch_frac) * sum(losses[:-1]) + losses[-1]
    return total, losses


def online_loss(outputs: Sequence[jax.Array], gts: jax.Array) -> jax.Array:
    """Online (one-shot) loss: fused output only, reference
    ``train_online.py:81``."""
    return class_balanced_cross_entropy_loss(outputs[-1], gts,
                                             size_average=False)
