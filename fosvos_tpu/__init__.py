"""fosvos-tpu: a TPU-native one-shot video object segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of klausondrag/FOSVOS
(OSVOS on DAVIS-2016 + channel pruning + mimic distillation), designed
TPU-first: NHWC layouts, jitted scan training loops, static shapes,
mesh-sharded parallelism.
"""

__version__ = '0.1.0'
