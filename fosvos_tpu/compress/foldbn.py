"""Inference-time BatchNorm folding for the serving path.

Every trunk conv in OSVOS-ResNet (``models/resnet.py``) is bias-free and
directly followed by a ``TorchBatchNorm``; at ``train=False`` that BN is a
per-channel affine ``y = (x - mean) * rsqrt(var + eps) * scale + bias``
over the conv output. Folding multiplies the conv kernel's output channels
by ``g = scale * rsqrt(var + eps)`` ahead of time and replaces the BN with
a single bias add — the multiplicative half rides the MXU for free and the
normalize math disappears from the compiled program. This is the TPU
equivalent of torch's ``fuse_modules`` conv+BN fusion; the reference never
does it (its serving path re-runs BN per frame, ``run_webcam.py:88``).

Measured (``tools/bench_bn_fold_probe.py``, resnet18 b128 480p, real chip):
bf16 3373 -> 3462 fps (+2.6%), int8 PTQ 3836 -> 3984 fps (+3.9%); an
identity-BN upper-bound probe confirms the fold captures the entire
available win. XLA fuses the BN elementwise chain into the conv epilogue,
but the fused multiply/add still occupies VPU cycles that the folded
program simply does not issue.

Batch-1 caveat (``tools/bench_b1_fold_probe.py``): folding helps bf16 at
b1 too (435.9 -> 446.1 fps paired; across sessions within ~2% noise of
b1 fp32, i.e. tied-best rather than a clear b1 winner), but
**int8 + fold at b1 is a 2x regression** (438.5 -> 210.9 fps) — in the
folded int8 program XLA stops fusing the dequant into the conv epilogue
and 93 MB/frame of raw s32 conv outputs materialize (probe ``--hlo``),
which at b1 is pure added HBM latency. Serve b1 as bf16+fold; combine
fold with int8 only at serving batches.

Contract:

* ``fold(model, variables)`` returns a new variables dict whose paired
  conv kernels are pre-scaled and which carries an extra ``bn_fold``
  collection ``{bn_path: folded_bias_vector}``. Folded BN params are
  rewritten to the identity affine, so the folded tree is
  SELF-CONSISTENT: plain ``model.apply`` on it produces the same values
  (one redundant multiply-by-1 slower) — int8 calibration and any
  fold-unaware consumer stays correct. Unpaired BNs (none in the stock
  models) and models with no BN at all (OSVOS-VGG) pass through
  unchanged (no ``bn_fold`` key).
* ``folded_apply(model, variables, x, ...)`` runs the forward with every
  folded BN replaced by its bias add. If ``variables`` has no ``bn_fold``
  collection it is exactly ``model.apply``. Inference only: folding is
  invalid under ``train=True`` (BN must see batch moments) and asserts.
* composes with int8 PTQ (``compress/quantize.py``): quantize the FOLDED
  variables (per-channel weight scales absorb ``g``), then pass
  ``apply_fn=partial(quantized_apply, ...)``.

Numerics: re-associating ``(x * g) conv w`` vs ``(x conv w) * g`` perturbs
logits at the 1e-2 relative level through 20 layers (bit-parity paths must
not fold — the engine's default is off); mask agreement stays >99%
(``tests/test_foldbn.py``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fosvos_tpu.models.common import TorchBatchNorm

FOLD_COLLECTION = 'bn_fold'
# bn_fold keys are flat 'a/b/c' paths; '/' never appears in a module name
_SEP = '/'


def discover_conv_bn_pairs(model, variables,
                           example: Optional[jax.Array] = None,
                           ) -> Dict[str, Tuple[str, float]]:
    """``{bn_path: (conv_path, eps)}`` for every TorchBatchNorm whose input
    IS the output of an ``nn.Conv`` (trace-time object-identity match, so
    only BNs that directly consume a conv fold — in the stock models that
    is all of them). Topology-only: a tiny example input suffices."""
    if example is None:
        example = jnp.zeros((1, 64, 96, 3), jnp.float32)
    pairs: Dict[str, Tuple[str, float]] = {}
    conv_out: Dict[int, str] = {}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, TorchBatchNorm)
                and context.method_name == '__call__'):
            src = conv_out.get(id(args[0]))
            if src is not None:
                pairs[_SEP.join(mod.path)] = (src, float(mod.eps))
        out = next_fun(*args, **kwargs)
        if isinstance(mod, nn.Conv) and context.method_name == '__call__':
            conv_out[id(out)] = _SEP.join(mod.path)
        return out

    def fn(v, x):
        with nn.intercept_methods(interceptor):
            model.apply(v, x, train=False)
        return 0

    jax.eval_shape(fn, variables, example)
    return pairs


def _get(tree: Dict[str, Any], path: str) -> Dict[str, Any]:
    node = tree
    for seg in path.split(_SEP):
        node = node[seg]
    return node


def fold(model, variables,
         pairs: Optional[Dict[str, Tuple[str, float]]] = None):
    """Fold each paired BN into its conv (f32 math regardless of the
    serving dtype) and return new variables carrying the ``bn_fold``
    collection. The input tree is not mutated."""
    if pairs is None:
        pairs = discover_conv_bn_pairs(model, variables)
    if not pairs:
        return variables

    from flax.core import unfreeze
    # tree.map rebuilds every dict level, so the kernel reassignment below
    # cannot alias the caller's tree (unfreeze: FrozenDict -> mutable)
    params = jax.tree.map(np.asarray, unfreeze(
        jax.device_get(variables['params'])))
    stats = jax.tree.map(np.asarray, unfreeze(
        jax.device_get(variables['batch_stats'])))

    biases: Dict[str, jax.Array] = {}
    for bn_path, (conv_path, eps) in pairs.items():
        bn_p = _get(params, bn_path)
        bn_s = _get(stats, bn_path)
        g = np.asarray(bn_p['scale'], np.float32) / np.sqrt(
            np.asarray(bn_s['var'], np.float32) + eps)
        b = (np.asarray(bn_p['bias'], np.float32)
             - np.asarray(bn_s['mean'], np.float32) * g)
        biases[bn_path] = jnp.asarray(b, jnp.float32)
        conv_p = _get(params, conv_path)
        kernel = np.asarray(conv_p['kernel'])
        conv_p['kernel'] = (kernel.astype(np.float32) * g).astype(
            kernel.dtype)
        # rewrite the BN to the identity affine (scale 1, mean 0,
        # var 1-eps, bias b) so the folded tree is SELF-CONSISTENT under
        # plain model.apply: (x*1)*rsqrt((1-eps)+eps)+b == x + b. Any
        # consumer that doesn't know about folding (int8 calibration,
        # logits paths, torch export) stays numerically correct;
        # folded_apply is purely the perf shortcut that skips the
        # identity BN's residual multiply.
        c = b.shape[0]
        bn_p['scale'] = np.ones(c, np.float32)
        bn_p['bias'] = b.astype(np.float32)
        bn_s['mean'] = np.zeros(c, np.float32)
        bn_s['var'] = np.full(c, 1.0 - eps, np.float32)

    new_vars = {k: v for k, v in variables.items()}
    new_vars['params'] = params
    new_vars['batch_stats'] = stats
    new_vars[FOLD_COLLECTION] = biases
    return new_vars


def is_folded(variables) -> bool:
    return FOLD_COLLECTION in variables


def fold_qparams(model, variables, qtree,
                 pairs: Optional[Dict[str, Tuple[str, float]]] = None):
    """Absorb the fold's per-channel ``g`` into pre-built int8 weight
    scales (``compress/quantize.py`` qtree) so externally-calibrated or
    QAT-trained quantized state dequantizes correctly when served next to
    a folded tree. ``variables`` must be the UNFOLDED tree the qtree was
    built against (g is recomputed from its BN params/stats)."""
    if pairs is None:
        pairs = discover_conv_bn_pairs(model, variables)
    if not pairs:
        return qtree
    params = jax.device_get(variables['params'])
    stats = jax.device_get(variables['batch_stats'])
    wscale = dict(qtree['wscale'])
    for bn_path, (conv_path, eps) in pairs.items():
        if conv_path not in wscale:
            continue
        bn_p = _get(params, bn_path)
        bn_s = _get(stats, bn_path)
        g = np.asarray(bn_p['scale'], np.float32) / np.sqrt(
            np.asarray(bn_s['var'], np.float32) + eps)
        wscale[conv_path] = jnp.asarray(
            np.asarray(wscale[conv_path], np.float32) * g, jnp.float32)
    return {**{k: v for k, v in qtree.items()}, 'wscale': wscale}


def _bias_interceptor(biases: Dict[str, jax.Array]):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, TorchBatchNorm)
                and context.method_name == '__call__'):
            path = _SEP.join(mod.path)
            b = biases.get(path)
            if b is not None:
                xin = args[0]
                # f32 add like the BN it replaces, cast back to the
                # serving dtype (TorchBatchNorm does the same)
                return (xin.astype(jnp.float32) + b).astype(xin.dtype)
        return next_fun(*args, **kwargs)
    return interceptor


def folded_apply(model, variables, x: jax.Array, train: bool = False,
                 apply_fn: Optional[Callable] = None, **apply_kwargs):
    """Forward with folded BNs skipped (replaced by their bias adds).

    ``apply_fn(variables, x, train=..., **kw)`` defaults to
    ``model.apply``; pass a partial of ``quantize.quantized_apply`` to
    compose folding with int8 serving (interceptors nest). A variables
    dict without ``bn_fold`` falls straight through to ``apply_fn``.
    """
    if apply_fn is None:
        def apply_fn(v, xx, **kw):
            return model.apply(v, xx, **kw)
    biases = variables.get(FOLD_COLLECTION) if hasattr(variables, 'get') \
        else None
    if not biases:
        return apply_fn(variables, x, train=train, **apply_kwargs)
    if train:
        raise ValueError('BN folding is inference-only: a folded model '
                         'cannot compute batch moments (unfold / reload '
                         'the checkpoint to train)')
    inner = {k: v for k, v in variables.items() if k != FOLD_COLLECTION}
    with nn.intercept_methods(_bias_interceptor(biases)):
        return apply_fn(inner, x, train=train, **apply_kwargs)
