"""Probe: does inference-time BN folding (compress/foldbn.py) move batch-1
480p latency?

Round-3/4 measured folding at the serving batch (b128: +2.6% bf16 / +3.9%
int8) but the b1 regime is launch/HBM-bound, not MXU-bound — removing the
~20 per-BN elementwise stages could matter proportionally more there (or
not at all, if XLA was already fusing them into the conv epilogues).

Also probes the one untried int8 variant for b1: conv output emitted at
``preferred_element_type=bfloat16`` instead of int32
(``quantized_apply(conv_out_dtype=jnp.bfloat16)``), halving the conv
output write wherever the raw conv result materializes (the s32
materialization is the measured cost that made b1 int8+fold a 2x
regression, BENCHMARKS.md) — keys ``int8bf16out`` / ``int8bf16out_fold``.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_b1_fold_probe.py
"""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from fosvos_tpu.compress import foldbn, quantize
from fosvos_tpu.models import make_resnet
from fosvos_tpu.runtime.timing import time_pipelined


def _bf16(variables):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)


def measure(fn, *args, n_runs=30, rounds=3):
    """Best-of-``rounds`` pipelined-fence timing. The protocol itself is
    runtime.timing.time_pipelined (the single shared implementation — a
    local copy here measurably drifted from bench.py's numbers, ADVICE r4)."""
    return min(time_pipelined(fn, *args, n_runs=n_runs)
               for _ in range(rounds))


def main():
    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    rng = np.random.RandomState(0)
    frames_np = rng.randn(1, 480, 854, 3).astype(np.float32) * 40.0

    results = {}
    for dtype in ('bf16', 'int8', 'int8bf16out'):
        jdt = jnp.bfloat16
        conv_out = jnp.bfloat16 if dtype == 'int8bf16out' else None
        for fold in (False, True):
            v = foldbn.fold(model, variables) if fold else variables
            v = jax.device_put(_bf16(v))
            frames = jnp.asarray(frames_np, jdt)
            if dtype.startswith('int8'):
                qtree = jax.device_put(quantize.build_qparams(
                    model, v, [frames]).tree())

                @jax.jit
                def fwd(v, qtree, images):
                    outs = foldbn.folded_apply(
                        model, v, images,
                        apply_fn=lambda vv, x, **kw: quantize.quantized_apply(
                            model, vv, qtree, x,
                            conv_out_dtype=conv_out, **kw))
                    prob = jax.nn.sigmoid(
                        outs[-1][..., 0].astype(jnp.float32))
                    return jnp.round(prob * 255.0).astype(jnp.uint8)

                dt = measure(fwd, v, qtree, frames)
            else:
                @jax.jit
                def fwd(v, images):
                    outs = foldbn.folded_apply(model, v, images, train=False)
                    prob = jax.nn.sigmoid(
                        outs[-1][..., 0].astype(jnp.float32))
                    return jnp.round(prob * 255.0).astype(jnp.uint8)

                dt = measure(fwd, v, frames)
            key = f'{dtype}{"_fold" if fold else ""}'
            results[key] = dt
            print(f'b1 {key}: {dt * 1e3:.3f} ms/frame ({1 / dt:.1f} fps)',
                  flush=True)

    for base, folded in (('bf16', 'bf16_fold'), ('int8', 'int8_fold'),
                         ('int8bf16out', 'int8bf16out_fold')):
        d = results[base] / results[folded]
        print(f'{folded} vs {base}: {d:.3f}x')
    print(f'int8bf16out_fold vs int8_fold: '
          f'{results["int8_fold"] / results["int8bf16out_fold"]:.3f}x')


def hlo_report():
    """Compile the b1 int8+fold forward and report what actually
    materializes in HBM: if XLA fuses each requantize into the producer
    conv's epilogue, the inter-layer tensors are s8 and int8 chaining is
    already happening; if full-res bf16/f32 fusion outputs dominate, an
    explicit int8-in/int8-out path would halve inter-layer traffic."""
    import collections
    import re

    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    variables = foldbn.fold(model, variables)
    v = jax.device_put(_bf16(variables))
    frames = jnp.asarray(
        np.random.RandomState(0).randn(1, 480, 854, 3).astype(np.float32)
        * 40.0, jnp.bfloat16)
    qtree = jax.device_put(quantize.build_qparams(model, v, [frames]).tree())

    @jax.jit
    def fwd(v, qtree, images):
        outs = foldbn.folded_apply(
            model, v, images,
            apply_fn=lambda vv, x, **kw: quantize.quantized_apply(
                model, vv, qtree, x, **kw))
        prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
        return jnp.round(prob * 255.0).astype(jnp.uint8)

    txt = fwd.lower(v, qtree, frames).compile().as_text()
    # fusion/conv root shapes = what is written back to HBM
    counts = collections.Counter()
    big_bytes = collections.Counter()
    itemsize = {'s8': 1, 'u8': 1, 'bf16': 2, 'f32': 4, 's32': 4}
    for m in re.finditer(r'^\s*(?:ROOT\s+)?%?[\w.-]+ = '
                         r'(s8|u8|bf16|f32|s32)\[([\d,]*)\][^=]*'
                         r'(fusion|convolution)\(', txt, re.M):
        dt, dims, kind = m.groups()
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        if n >= 1 << 20:  # only full-res-ish tensors matter for HBM traffic
            counts[f'{kind}:{dt}'] += 1
            big_bytes[dt] += n * itemsize[dt]
    print('materialized >=1Mi-elem HBM outputs (kind:dtype -> count):')
    for k, c in sorted(counts.items()):
        print(f'  {k}: {c}')
    print('bytes written by dtype:',
          {k: f'{b / 1e6:.0f} MB' for k, b in sorted(big_bytes.items())})


if __name__ == '__main__':
    if '--hlo' in sys.argv:
        hlo_report()
    else:
        main()
