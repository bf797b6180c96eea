"""Post-training int8 quantization (PTQ) for the serving path.

The reference accelerates its models by channel pruning (``prune.py``) and
distillation (``mimic.py``); int8 PTQ is the TPU-native third leg of that
acceleration story (no reference counterpart — TPU MXUs execute
int8 x int8 -> int32 contractions at up to twice the bf16 rate, and int8
activations halve the HBM bytes of the conv-adjacent traffic).

Scheme — standard symmetric PTQ:

* conv kernels: **per-output-channel** symmetric int8,
  ``s_w[c] = amax(|W[..., c]|) / 127``;
* conv inputs: **per-tensor** symmetric int8 with a calibration-measured
  scale ``s_x = amax(|x|) / 127`` over representative frames;
* each conv computes int8 -> int32 on the MXU and dequantizes as
  ``y = conv_int(x_q, w_q) * (s_x * s_w) (+ bias)`` — the rescale/bias are
  elementwise and XLA fuses them into the following BN/ReLU stage;
* deconvs (frozen bilinear upsampling, ``models/common.py:Deconv``) and the
  fuse accumulation stay float: they are bandwidth-trivial after the fuse
  contraction and their precision sets mask edge quality.

Implementation: flax **method interceptors** (``nn.intercept_methods``) —
the float model definitions are reused unchanged; calibration and the
quantized forward intercept every ``nn.Conv.__call__``. Both run under
``jax.jit`` (the interceptor fires at trace time), so calibration is one
compiled forward, not an eager op-by-op walk.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv_config(mod: nn.Conv):
    """(window_strides, padding) in lax.conv_general_dilated terms."""
    s = mod.strides if mod.strides is not None else 1
    if isinstance(s, int):
        s = (s, s)
    p = mod.padding
    if isinstance(p, int):
        p = ((p, p), (p, p))
    elif not isinstance(p, str):  # 'SAME'/'VALID' pass to lax verbatim
        # flax accepts a sequence of ints or of (lo, hi) pairs
        p = tuple((e, e) if isinstance(e, int) else tuple(e) for e in p)
    return tuple(s), p


def _is_quantizable(mod: nn.Conv) -> bool:
    """Plain dense convs only. Grouped or dilated convs would be silently
    mis-lowered by the int8 path (it rebuilds the conv from kernel+strides+
    padding alone), so they are excluded at path discovery and double-checked
    at apply time."""
    def _unit(d):
        if d is None:
            return True
        if isinstance(d, int):
            return d == 1
        return all(int(x) == 1 for x in d)
    return (mod.feature_group_count == 1
            and _unit(mod.kernel_dilation)
            and _unit(getattr(mod, 'input_dilation', None)))


def _get_nested(tree: Dict[str, Any], path: str) -> Dict[str, Any]:
    node = tree
    for seg in path.split('/'):
        node = node[seg]
    return node


@dataclasses.dataclass
class QuantizedParams:
    """Device-resident quantized state for one model's convs.

    ``kernels[path]``: int8 HWIO kernel; ``wscale[path]``: (C_out,) float32
    per-channel dequant scale; ``act_scale[path]``: () float32 per-tensor
    input scale. All three are jit-traceable pytrees so recalibration never
    recompiles the serving forward.
    """
    kernels: Dict[str, jax.Array]
    wscale: Dict[str, jax.Array]
    act_scale: Dict[str, jax.Array]

    def tree(self):
        return {'kernels': self.kernels, 'wscale': self.wscale,
                'act_scale': self.act_scale}

    @staticmethod
    def from_tree(t) -> 'QuantizedParams':
        return QuantizedParams(kernels=dict(t['kernels']),
                               wscale=dict(t['wscale']),
                               act_scale=dict(t['act_scale']))


def conv_paths(model, variables, example: jax.Array,
               skip: Sequence[str] = ()) -> List[str]:
    """All ``nn.Conv`` module paths reached by a forward pass (trace-time
    walk — masks/pruning configs that skip layers are respected)."""
    found: List[str] = []

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Conv) and context.method_name == '__call__'
                and _is_quantizable(mod)):
            path = '/'.join(mod.path)
            if path not in found and not any(s in path for s in skip):
                found.append(path)
        return next_fun(*args, **kwargs)

    def fn(v, x):
        with nn.intercept_methods(interceptor):
            model.apply(v, x, train=False)
        return 0

    jax.eval_shape(fn, variables, example)
    return found


# compiled calibration forwards, keyed by (model identity, conv paths).
# A fresh jax.jit per calibrate_amax call would re-trace AND re-compile the
# full model forward on every calibration (minutes at 480p behind this
# backend); caching the jitted fn lets jax's own cache hit per input shape —
# multi-batch calibration and per-sequence recalibration compile once. The
# model object is kept in the entry so id(model) cannot be recycled.
_CALIB_FNS: Dict[Any, Any] = {}


def calibrate_amax(model, variables, images: jax.Array,
                   paths: Sequence[str]) -> Dict[str, jax.Array]:
    """Per-conv-input abs-max over one batch (one compiled forward)."""
    key = (id(model), tuple(paths))
    entry = _CALIB_FNS.get(key)
    if entry is None:
        store: Dict[str, jax.Array] = {}
        wanted = set(paths)

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (isinstance(mod, nn.Conv)
                    and context.method_name == '__call__'):
                path = '/'.join(mod.path)
                if path in wanted:
                    a = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                    store[path] = jnp.maximum(store[path], a) \
                        if path in store else a
            return next_fun(*args, **kwargs)

        @jax.jit
        def fn(v, x):
            store.clear()
            with nn.intercept_methods(interceptor):
                model.apply(v, x, train=False)
            return dict(store)

        entry = (model, fn)
        _CALIB_FNS[key] = entry
    return entry[1](variables, images)


@jax.jit
def _quantize_kernel(kernel):
    # module-level jit: repeat quantizations of same-shaped kernels hit
    # jax's compile cache instead of re-compiling per call
    k32 = kernel.astype(jnp.float32)
    s = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    kq = jnp.clip(jnp.round(k32 / s), -127, 127).astype(jnp.int8)
    return kq, s


def quantize_weights(variables, paths: Sequence[str]
                     ) -> Dict[str, Dict[str, jax.Array]]:
    """Per-output-channel symmetric int8 kernels + dequant scales."""
    kernels, wscale = {}, {}
    params = variables['params']
    for path in paths:
        kq, s = _quantize_kernel(_get_nested(params, path)['kernel'])
        kernels[path], wscale[path] = kq, s
    return {'kernels': kernels, 'wscale': wscale}


def build_qparams(model, variables, calib_batches: Iterable[np.ndarray],
                  preprocess: Optional[Callable] = None,
                  skip: Sequence[str] = (),
                  margin: float = 1.0) -> QuantizedParams:
    """Calibrate activation scales and quantize weights in one pass.

    ``calib_batches``: iterable of (B,H,W,C) frame batches (uint8 raw or
    float32 preprocessed); ``preprocess`` maps a raw batch to model input
    (e.g. ``evaluation.experiment.device_preprocess``). ``margin`` scales
    the measured abs-max (>1 leaves headroom for unseen activations).
    """
    amax: Dict[str, np.ndarray] = {}
    paths: Optional[List[str]] = None
    for batch in calib_batches:
        x = jnp.asarray(batch)
        if preprocess is not None:
            x = preprocess(x)
        if paths is None:
            paths = conv_paths(model, variables, x, skip=skip)
        batch_amax = calibrate_amax(model, variables, x, paths)
        for p, a in batch_amax.items():
            a = np.asarray(a)
            amax[p] = np.maximum(amax[p], a) if p in amax else a
    if not amax:
        raise ValueError('calibration needs at least one batch')
    w = quantize_weights(variables, list(amax))
    act_scale = {p: jnp.asarray(max(float(a) * margin, 1e-12) / 127.0,
                                jnp.float32)
                 for p, a in amax.items()}
    return QuantizedParams(kernels=w['kernels'], wscale=w['wscale'],
                           act_scale=act_scale)


def quantized_apply(model, variables, qtree, x: jax.Array,
                    train: bool = False, conv_out_dtype=None,
                    **apply_kwargs):
    """Forward pass with every calibrated conv running int8 -> int32.

    ``qtree``: ``QuantizedParams.tree()`` (a plain pytree so it can be a jit
    argument). Non-quantized modules (BN, deconvs, pooling, fuse) run
    exactly as in the float model.

    ``conv_out_dtype``: accumulation/emission dtype for the int8 convs
    (``preferred_element_type``). Default int32 (exact accumulation).
    ``jnp.bfloat16`` halves the conv-output write wherever the raw conv
    result materializes in HBM — probed for the b1 int8+fold regression
    (``tools/bench_b1_fold_probe.py``), where 93 MB/frame of s32 conv
    outputs were the measured cost; bf16 accumulation trades exactness of
    the int32 dot for that traffic.
    """
    if conv_out_dtype is None:
        conv_out_dtype = jnp.int32
    kernels = qtree['kernels']
    wscale = qtree['wscale']
    act_scale = qtree['act_scale']
    params = variables['params']

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not (isinstance(mod, nn.Conv)
                and context.method_name == '__call__'):
            return next_fun(*args, **kwargs)
        path = '/'.join(mod.path)
        if path not in kernels or not _is_quantizable(mod):
            return next_fun(*args, **kwargs)
        xin = args[0]
        s_x = act_scale[path]
        xq = jnp.clip(jnp.round(xin.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        wq = kernels[path]
        strides, padding = _conv_config(mod)
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, wq.shape, ('NHWC', 'HWIO', 'NHWC'))
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=strides, padding=padding,
            dimension_numbers=dn, preferred_element_type=conv_out_dtype)
        y = y.astype(jnp.float32) * (wscale[path] * s_x)
        if mod.use_bias:
            y = y + _get_nested(params, path)['bias'].astype(jnp.float32)
        return y.astype(xin.dtype)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, x, train=train, **apply_kwargs)
