"""Decompose the int8 serving gap: which stage keeps b128 int8 at ~30% of
the chip's int8 peak while bf16 reaches ~50% of its own?

Probes, each timed with the pipelined in-order fence
(``runtime.timing`` semantics — per-call block_until_ready would measure
the tunnel, CLAUDE.md):

1. **raw conv rate**: one serving-shaped 3x3 conv (stage-2 resnet shape),
   bf16 x bf16 -> f32 vs int8 x int8 -> int32. If the int8 conv is not
   ~2x the bf16 conv, XLA is not hitting the MXU's int8 rate and
   model-level work is moot.
2. **quantize-op overhead**: the same int8 conv with the activation
   quantization (clip/round/scale from ``compress.quantize``) included —
   isolates the VPU cost of per-layer requantization.
3. **trunk vs full model**: OSVOS-ResNet18 b128 int8 with heads (the
   serving program) vs trunk-only (side heads sliced off) — isolates the
   bf16 deconv/fuse tail.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python tools/bench_int8_microprobe.py [--batch 128]
"""
import argparse
import time

import numpy as np

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _fence(r):
    # fetch a TINY device-side slice — np.asarray of a full serving-shaped
    # output would ship GBs over the tunnel and dwarf the measurement
    leaf = jax.tree.leaves(r)[0]
    np.asarray(jnp.ravel(leaf)[:8])


def _time(fn, *args, n_runs=20, rounds=3):
    _fence(fn(*args))  # compile + warm
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n_runs):
            r = fn(*args)
        _fence(r)      # in-order fence
        best = min(best, (time.perf_counter() - t0) / n_runs)
    return best


def probe_raw_conv(batch):
    h, w, cin, cout = 120, 214, 128, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, h, w, cin), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.bfloat16)
    xq = jnp.asarray(rng.randint(-127, 128, (batch, h, w, cin)), jnp.int8)
    kq = jnp.asarray(rng.randint(-127, 128, (3, 3, cin, cout)), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def conv_bf16(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    @jax.jit
    def conv_int8(xq, kq):
        return jax.lax.conv_general_dilated(
            xq, kq, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    @jax.jit
    def conv_int8_with_quant(x, kq):
        s = jnp.float32(0.05)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, kq, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * s).astype(jnp.bfloat16)

    flops = 2 * batch * h * w * cin * cout * 9
    t_bf = _time(conv_bf16, x, k)
    t_i8 = _time(conv_int8, xq, kq)
    t_i8q = _time(conv_int8_with_quant, x, kq)
    print(f'raw 3x3 conv {batch}x{h}x{w}x{cin}->{cout}:')
    print(f'  bf16          {t_bf * 1e3:8.2f} ms  {flops / t_bf / 1e12:6.1f} TFLOP/s')
    print(f'  int8          {t_i8 * 1e3:8.2f} ms  {flops / t_i8 / 1e12:6.1f} TOP/s '
          f'({t_bf / t_i8:.2f}x vs bf16)')
    print(f'  int8 + quant  {t_i8q * 1e3:8.2f} ms  (quant overhead '
          f'{(t_i8q - t_i8) * 1e3:.2f} ms)')


def probe_raw_matmul():
    """Is the MXU's int8 2x rate reachable through dot_general where the
    conv lowering missed it? (M,K)x(K,N) at conv-like sizes."""
    m, k, n = 32768, 1152, 128    # = im2col of the 3x3 conv probe, sliced
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(k, n) * 0.05, jnp.bfloat16)
    aq = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    bq = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)

    @jax.jit
    def mm_bf16(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @jax.jit
    def mm_int8(aq, bq):
        return jax.lax.dot_general(aq, bq, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    flops = 2 * m * k * n
    t_bf = _time(mm_bf16, a, b)
    t_i8 = _time(mm_int8, aq, bq)
    print(f'raw matmul {m}x{k}x{n}:')
    print(f'  bf16          {t_bf * 1e3:8.2f} ms  {flops / t_bf / 1e12:6.1f} TFLOP/s')
    print(f'  int8          {t_i8 * 1e3:8.2f} ms  {flops / t_i8 / 1e12:6.1f} TOP/s '
          f'({t_bf / t_i8:.2f}x vs bf16)')


def probe_model(batch):
    from fosvos_tpu.compress import quantize
    from fosvos_tpu.models import make_resnet

    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    variables = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(batch, 480, 854, 3) * 40.0, jnp.bfloat16)
    qtree = jax.device_put(quantize.build_qparams(
        model, variables, [frames[:4]]).tree())

    @jax.jit
    def full_int8(v, q, x):
        outs = quantize.quantized_apply(model, v, q, x)
        prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
        return jnp.round(prob * 255.0).astype(jnp.uint8)

    @jax.jit
    def full_bf16(v, x):
        outs = model.apply(v, x, train=False)
        prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
        return jnp.round(prob * 255.0).astype(jnp.uint8)

    from flax import linen as nn
    from fosvos_tpu.models.common import SideHead

    @jax.jit
    def trunk_int8(v, q, x):
        # trunk cost only: intercept every SideHead, record its input's
        # mean (keeps the trunk live) and return zero maps (heads, deconvs,
        # fuse and the full-res writes all fold away)
        grabbed = []

        def skip_heads(next_fun, args, kwargs, context):
            if (isinstance(context.module, SideHead)
                    and context.method_name == '__call__'):
                xx, out_h, out_w = args[0], args[1], args[2]
                grabbed.append(jnp.mean(xx.astype(jnp.float32)))
                z = jnp.zeros((xx.shape[0], out_h, out_w, 1), xx.dtype)
                return z, z
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(skip_heads):
            quantize.quantized_apply(model, v, q, x)
        return sum(grabbed)

    t_full = _time(full_int8, variables, qtree, frames, n_runs=10)
    t_bf16 = _time(full_bf16, variables, frames, n_runs=10)
    t_trunk = _time(trunk_int8, variables, qtree, frames, n_runs=10)
    print(f'resnet18 480p b{batch}:')
    print(f'  full bf16     {t_bf16 * 1e3:8.2f} ms  ({batch / t_bf16:7.1f} fps)')
    print(f'  full int8     {t_full * 1e3:8.2f} ms  ({batch / t_full:7.1f} fps)')
    print(f'  trunk int8    {t_trunk * 1e3:8.2f} ms  (head/tail cost '
          f'{(t_full - t_trunk) * 1e3:.2f} ms)')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--skip-model', action='store_true')
    ap.add_argument('--matmul-only', action='store_true')
    args = ap.parse_args()
    if args.matmul_only:
        probe_raw_matmul()
        return
    probe_raw_conv(args.batch)
    probe_raw_matmul()
    if not args.skip_model:
        probe_model(args.batch)


if __name__ == '__main__':
    main()
