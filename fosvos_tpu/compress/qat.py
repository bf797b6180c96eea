"""Quantization-aware training (QAT) for the int8 serving path.

:mod:`fosvos_tpu.compress.quantize` serves calibrated models with int8
convolutions (PTQ). PTQ quality rests on the float weights happening to
tolerate the int8 grid; QAT removes that gamble by *training through* the
quantizer: the one-shot adaptation (reference ``train_online.py:147-152``)
runs with every quantizable conv fake-quantized (round-to-grid in the
forward, straight-through gradients in the backward), so the adapted
weights land where the int8 grid can represent them. The finalized
:class:`~fosvos_tpu.compress.quantize.QuantizedParams` then serves masks
whose numerics the training loop already saw.

No reference counterpart (the reference accelerates via pruning and
distillation only); this completes the TPU compression suite:
prune (``compress/prune.py``), mimic (``compress/mimic.py``),
PTQ + QAT (``compress/quantize.py`` + this module).

Scheme — matches the PTQ serving numerics exactly:

* conv kernels: per-output-channel symmetric int8 grid recomputed from the
  *live* weights each step (``s_w[c] = amax(|W[..., c]|)/127``, scale under
  ``stop_gradient``), so the grid tracks the weights as they move;
* conv inputs: per-tensor symmetric int8 grid with the calibration scale
  fixed for the whole adaptation (one compile serves every sequence; the
  serving path reuses the same scales via :func:`finalize`);
* forward value = quantize->dequantize (what the int8 engine computes, up
  to f32-vs-int32 accumulation order); backward = identity through the
  rounding (straight-through estimator), with clipped activations passing
  their gradient too (saturation is rare post-calibration and hard-zeroing
  it destabilizes the short online adaptation).

Implementation mirrors ``quantize.quantized_apply``: a flax method
interceptor rebuilds every calibrated ``nn.Conv`` from the traced
``variables`` tree, so gradients flow to the real kernels and the float
model definitions are reused unchanged. :func:`make_apply` returns a
drop-in for ``model.apply`` accepted by
``train.online.OnlineFinetuner(apply_fn=...)``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fosvos_tpu.compress import quantize
from fosvos_tpu.compress.quantize import (QuantizedParams, _conv_config,
                                          _get_nested, _is_quantizable)


def _ste(x: jax.Array, q: jax.Array) -> jax.Array:
    """Value of ``q``, gradient of ``x`` (straight-through estimator)."""
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_input(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 quantize->dequantize with STE."""
    s = jax.lax.stop_gradient(scale)
    q = jnp.clip(jnp.round(x / s), -127, 127) * s
    return _ste(x, q)


def fake_quant_kernel(kernel: jax.Array) -> jax.Array:
    """Per-output-channel (HWIO axis -1) symmetric int8 grid from the live
    weights, quantize->dequantize with STE — the exact grid
    ``quantize._quantize_kernel`` will commit to at :func:`finalize`."""
    s = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
    s = jax.lax.stop_gradient(jnp.maximum(s, 1e-12))
    q = jnp.clip(jnp.round(kernel / s), -127, 127) * s
    return _ste(kernel, q)


def make_apply(model, act_scale: Dict[str, jax.Array]) -> Callable:
    """A ``model.apply`` drop-in whose calibrated convs run fake-quantized.

    ``act_scale``: per-conv-path input scales (from :func:`calibrate_scales`
    or an existing ``QuantizedParams.act_scale``). Paths absent from the
    dict (and grouped/dilated convs) run float, exactly like the PTQ
    serving path skips them. Kernels/biases are read from the ``variables``
    argument of the returned function, so ``jax.grad`` through it
    differentiates the real parameters.
    """
    act_scale = dict(act_scale)

    def apply_fn(variables, *args, **kwargs):
        params = variables['params']

        def interceptor(next_fun, iargs, ikwargs, context):
            mod = context.module
            if not (isinstance(mod, nn.Conv)
                    and context.method_name == '__call__'):
                return next_fun(*iargs, **ikwargs)
            path = '/'.join(mod.path)
            if path not in act_scale or not _is_quantizable(mod):
                return next_fun(*iargs, **ikwargs)
            xin = iargs[0]
            xq = fake_quant_input(xin.astype(jnp.float32), act_scale[path])
            leaf = _get_nested(params, path)
            kq = fake_quant_kernel(leaf['kernel'].astype(jnp.float32))
            # honor the model's compute dtype (bf16 adaptation keeps its
            # speed; the quantized grid values survive the cast)
            dt = mod.dtype or jnp.float32
            strides, padding = _conv_config(mod)
            dn = jax.lax.conv_dimension_numbers(
                xq.shape, kq.shape, ('NHWC', 'HWIO', 'NHWC'))
            y = jax.lax.conv_general_dilated(
                xq.astype(dt), kq.astype(dt), window_strides=strides,
                padding=padding, dimension_numbers=dn)
            if mod.use_bias:
                y = y + leaf['bias'].astype(y.dtype)
            return y.astype(xin.dtype)

        with nn.intercept_methods(interceptor):
            return model.apply(variables, *args, **kwargs)

    return apply_fn


def calibrate_scales(model, variables, calib_batches: Iterable,
                     preprocess: Optional[Callable] = None,
                     skip: Sequence[str] = (),
                     margin: float = 1.0) -> Dict[str, jax.Array]:
    """Per-conv input scales over representative frames (the PTQ
    calibration pass; see ``quantize.build_qparams``)."""
    qp = quantize.build_qparams(model, variables, calib_batches,
                                preprocess=preprocess, skip=skip,
                                margin=margin)
    return qp.act_scale


def finalize(variables, act_scale: Dict[str, jax.Array]) -> QuantizedParams:
    """Commit QAT-trained weights to the int8 grid they trained on.

    Returns :class:`QuantizedParams` for ``quantize.quantized_apply`` /
    ``InferenceEngine(int8=...)`` — per-channel weight quantization (the
    same formula the fake-quant forward used) plus the training-time
    activation scales, so serving sees the distribution the adaptation
    optimized.
    """
    w = quantize.quantize_weights(variables, list(act_scale))
    return QuantizedParams(kernels=w['kernels'], wscale=w['wscale'],
                           act_scale={p: jnp.asarray(s, jnp.float32)
                                      for p, s in act_scale.items()})
