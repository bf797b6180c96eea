"""Probe: is inference-time BatchNorm folding worth building for serving?

Every trunk conv in OSVOS-ResNet (models/resnet.py) is bias-free and
followed by a TorchBatchNorm; at ``train=False`` the BN is a per-channel
affine ``y = (x - mean) * rsqrt(var + eps) * scale + bias`` over the conv
output. Classic serving optimization (torch's ``fuse_modules`` does the
same): fold the multiplicative part into the conv kernel's output channels
and the rest into a single bias add, removing the normalize math from the
compiled program entirely.

Whether that buys anything on TPU is NOT obvious: XLA fuses elementwise
consumers into the conv epilogue, so the BN may already be free (the same
reason three Pallas kernels were retired, BENCHMARKS.md). This probe
measures, at the serving config (resnet18 b128 480p bf16):

1. baseline          — ``model.apply(train=False)`` as the zoo benches it;
2. folded            — kernels pre-scaled by ``g = scale*rsqrt(var+eps)``,
                       BN replaced by one bias add (the real candidate);
3. identity-BN       — BN replaced by identity (numerically wrong; upper
                       bound on any possible win).

plus a numerics check that (2) matches (1) on the fused logit map.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/bench_bn_fold_probe.py [--batch 128] [--int8]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from fosvos_tpu.models import make_resnet  # noqa: E402
from fosvos_tpu.models.common import TorchBatchNorm  # noqa: E402


def discover_conv_bn_pairs(model, variables, example):
    """bn_path -> (conv_path, eps) for every BN whose input IS a conv
    output (trace-time identity match — residual-add BNs would not pair,
    but in this model every TorchBatchNorm directly consumes a conv)."""
    pairs = {}
    conv_out = {}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, TorchBatchNorm)
                and context.method_name == '__call__'):
            src = conv_out.get(id(args[0]))
            if src is not None:
                pairs['/'.join(mod.path)] = (src, float(mod.eps))
        out = next_fun(*args, **kwargs)
        if isinstance(mod, nn.Conv) and context.method_name == '__call__':
            conv_out[id(out)] = '/'.join(mod.path)
        return out

    def fn(v, x):
        with nn.intercept_methods(interceptor):
            model.apply(v, x, train=False)
        return 0

    jax.eval_shape(fn, variables, example)
    return pairs


def _get(tree, path):
    node = tree
    for seg in path.split('/'):
        node = node[seg]
    return node


def fold_bn(variables, pairs):
    """Scale each paired conv kernel by g (f32 math), return the new
    variables plus {bn_path: folded bias vector}."""
    import copy
    params = copy.deepcopy(jax.device_get(variables['params']))
    stats = jax.device_get(variables['batch_stats'])
    biases = {}
    for bn_path, (conv_path, eps) in pairs.items():
        bn_p = _get(params, bn_path)
        bn_s = _get(stats, bn_path)
        g = np.asarray(bn_p['scale'], np.float32) / np.sqrt(
            np.asarray(bn_s['var'], np.float32) + eps)
        b = np.asarray(bn_p['bias'], np.float32) - \
            np.asarray(bn_s['mean'], np.float32) * g
        conv_p = _get(params, conv_path)
        conv_p['kernel'] = (np.asarray(conv_p['kernel'], np.float32)
                            * g).astype(np.float32)
        biases[bn_path] = jnp.asarray(b, jnp.float32)
    new_vars = dict(variables)
    new_vars['params'] = params
    new_vars['batch_stats'] = stats
    return new_vars, biases


def folded_apply(model, variables, biases, x):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, TorchBatchNorm)
                and context.method_name == '__call__'):
            p = '/'.join(mod.path)
            if p in biases:
                xin = args[0]
                return (xin.astype(jnp.float32)
                        + biases[p]).astype(xin.dtype)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, x, train=False)


def identity_bn_apply(model, variables, x):
    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, TorchBatchNorm)
                and context.method_name == '__call__'):
            return args[0]
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, x, train=False)


def _bf16(tree):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def _time(call, n_runs=10, rounds=3):
    np.asarray(call())  # compile + warm
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        r = None
        for _ in range(n_runs):
            r = call()
        np.asarray(r[0, 0, :8])  # in-order fence (runtime.timing semantics)
        best = min(best, (time.perf_counter() - t0) / n_runs)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--int8', action='store_true',
                    help='also probe the folded int8 PTQ path')
    args = ap.parse_args()

    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    # realistic (non-init) BN stats/params so the fold isn't trivially 1/0
    key = jax.random.PRNGKey(1)

    def _perturb(a):
        nonlocal key
        key, k = jax.random.split(key)
        return a + 0.05 * jax.random.normal(k, a.shape, a.dtype) \
            if a.dtype == jnp.float32 else a
    variables = jax.tree.map(_perturb, variables)
    variables['batch_stats'] = jax.tree.map(
        lambda a: jnp.abs(a) + 0.5, variables['batch_stats'])

    example = jnp.zeros((1, 64, 96, 3), jnp.float32)
    pairs = discover_conv_bn_pairs(model, variables, example)
    print(f'# paired {len(pairs)} conv->BN sites', file=sys.stderr)

    folded_vars, biases = fold_bn(variables, pairs)

    b, h, w = args.batch, 480, 854
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 40.0,
                         jnp.bfloat16)

    v_bf = jax.device_put(_bf16(variables))
    vf_bf = jax.device_put(_bf16(folded_vars))
    biases_d = jax.device_put(biases)

    # numerics: folded must match baseline (f32, small input)
    small = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32) * 40.0)
    ref = model.apply(jax.device_put(variables), small, train=False)[-1]
    got = folded_apply(model, jax.device_put(folded_vars), biases_d, small)[-1]
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    scale_mag = float(jnp.max(jnp.abs(ref)))
    print(f'# fold numerics: max|diff| {err:.3e} on logits of magnitude '
          f'{scale_mag:.2f}', file=sys.stderr)

    @jax.jit
    def fwd_base(v, x):
        outs = model.apply(v, x, train=False)
        prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
        return jnp.round(prob * 255.0).astype(jnp.uint8)

    @jax.jit
    def fwd_folded(v, bs, x):
        outs = folded_apply(model, v, bs, x)
        prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
        return jnp.round(prob * 255.0).astype(jnp.uint8)

    @jax.jit
    def fwd_identity(v, x):
        outs = identity_bn_apply(model, v, x)
        prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
        return jnp.round(prob * 255.0).astype(jnp.uint8)

    t_base = _time(lambda: fwd_base(v_bf, frames))
    t_fold = _time(lambda: fwd_folded(vf_bf, biases_d, frames))
    t_ident = _time(lambda: fwd_identity(v_bf, frames))

    print(f'baseline  b{b} bf16: {t_base*1e3:8.2f} ms/batch '
          f'({b/t_base:7.1f} fps)')
    print(f'folded BN b{b} bf16: {t_fold*1e3:8.2f} ms/batch '
          f'({b/t_fold:7.1f} fps)  [{t_base/t_fold:.3f}x]')
    print(f'identity  b{b} bf16: {t_ident*1e3:8.2f} ms/batch '
          f'({b/t_ident:7.1f} fps)  [{t_base/t_ident:.3f}x; upper bound]')

    if args.int8:
        from fosvos_tpu.compress import quantize
        paths = quantize.conv_paths(model, variables, frames[:4])
        # int8 on FOLDED weights + BN-skip: quantize the folded variables,
        # then run quantized_apply under the BN-skip interceptor
        qtree = jax.device_put(quantize.build_qparams(
            model, vf_bf, [frames[:4]]).tree())
        qtree_base = jax.device_put(quantize.build_qparams(
            model, v_bf, [frames[:4]]).tree())

        @jax.jit
        def fwd_q_base(v, qt, x):
            outs = quantize.quantized_apply(model, v, qt, x)
            prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
            return jnp.round(prob * 255.0).astype(jnp.uint8)

        @jax.jit
        def fwd_q_folded(v, qt, bs, x):
            def interceptor(next_fun, args, kwargs, context):
                mod = context.module
                if (isinstance(mod, TorchBatchNorm)
                        and context.method_name == '__call__'):
                    p = '/'.join(mod.path)
                    if p in bs:
                        xin = args[0]
                        return (xin.astype(jnp.float32)
                                + bs[p]).astype(xin.dtype)
                return next_fun(*args, **kwargs)
            with nn.intercept_methods(interceptor):
                outs = quantize.quantized_apply(model, v, qt, x)
            prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
            return jnp.round(prob * 255.0).astype(jnp.uint8)

        t_qb = _time(lambda: fwd_q_base(v_bf, qtree_base, frames))
        t_qf = _time(lambda: fwd_q_folded(vf_bf, qtree, biases_d, frames))
        print(f'int8 base b{b}:      {t_qb*1e3:8.2f} ms/batch '
              f'({b/t_qb:7.1f} fps)')
        print(f'int8 fold b{b}:      {t_qf*1e3:8.2f} ms/batch '
              f'({b/t_qf:7.1f} fps)  [{t_qb/t_qf:.3f}x]')
        print(f'# {len(paths)} quantized convs', file=sys.stderr)


if __name__ == '__main__':
    main()
