"""Measurements behind retiring the fused mask-head Pallas kernel (round 4).

The serving forward's tail — four fuse contributions, each a
kernel-segregated 2x2 conv (``ops.deconv_phase_map``) + depth-to-space +
center-crop, then summed (reference composition ``osvos_vgg.py:71-81`` with
the 1x1 fuse pre-contracted into the deconv kernels) — costs ~4.2 ms of a
33.7 ms b128 480p int8 forward (``tools/bench_int8_microprobe.py``),
because XLA materializes every head's full-resolution interleave.

A Pallas kernel was built to do the whole tail in one pass (the four phase
maps for one frame total ~3.4 MB — VMEM-resident). It is numerically
correct (1 bf16 ulp vs the XLA path: Mosaic keeps bf16 adds in f32
registers) but **slower**, because this Mosaic version cannot express the
column interleave at all:

* lane-merge reshape ``(hp, wp, s) -> (hp, wp*s)``: "infer-vector-layout:
  unsupported shape cast";
* ``jnp.repeat(axis=-1)`` and strided sublane stores: also rejected;
* only the MAJOR-dim merge ``(hp, s, W) -> (hp*s, W)`` compiles.

So the kernel needs an XLA-side pre-transform to row-phase layout, and
both halves are relayout-bound (b128 480p bf16, best-of-3 pipelined):

| stage                              | time    |
|------------------------------------|---------|
| XLA pre-transform to row-phase     | 3.44 ms |
| Pallas kernel (merge + crop + sum) | 3.59 ms |
| fused path total                   | 5.87 ms |
| **plain XLA composition**          | **3.88 ms** |

Verdict: retired — the XLA composition is within ~30% of the 2-copy floor
that XLA-expressible rearrangements allow, and Mosaic offers no cheaper
schedule. Revisit if Mosaic gains lane-merge reshapes / strided stores.
(Same methodology as the round-3 retirements: BENCHMARKS.md, "Pallas
kernels: measured and retired".)

Run: PYTHONPATH=/root/.axon_site:/root/repo \\
         python tools/bench_fused_heads_retirement.py
"""
import functools
import sys
import time

sys.path.insert(0, '.')

import numpy as np  # noqa: E402

from fosvos_tpu.runtime.device import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fosvos_tpu.core import ops  # noqa: E402


def reference_contrib_sum(phase_maps, strides, out_h, out_w):
    """The production composition (models/common.py SideHead + model sum):
    per-head depth-to-space + crop, then sum."""
    acc = None
    for pm, s in zip(phase_maps, strides):
        full = ops.depth_to_space_phases(pm, s, 1)
        z = ops.center_crop(full, out_h, out_w)
        acc = z if acc is None else acc + z
    return acc


def _to_row_phase(pm, s):
    """(N, hp, wp, s*s) -> (N, hp, s, wp*s): the column interleave Mosaic
    cannot do, done in XLA (a coarse-resolution copy)."""
    n, hp, wp, _ = pm.shape
    r = pm.reshape(n, hp, wp, s, s).transpose(0, 1, 3, 2, 4)
    return r.reshape(n, hp, s, wp * s)


def _kernel(specs, out_h, out_w, *refs):
    y_refs, o_ref = refs[:-1], refs[-1]
    acc = None
    for ref, (s, hp, wfull, offh, offw) in zip(y_refs, specs):
        z = ref[0].reshape(hp * s, wfull)  # row interleave (major merge)
        z = jax.lax.slice(z, (offh, offw), (offh + out_h, offw + out_w))
        acc = z if acc is None else acc + z
    o_ref[0] = acc


def fused_contrib_sum(phase_maps, strides, out_h, out_w, interpret=None):
    """The retired kernel: XLA row-phase pre-transform + one pallas_call
    doing row-merge + crop + sum for all heads."""
    from jax.experimental import pallas as pl

    n = phase_maps[0].shape[0]
    dtype = phase_maps[0].dtype
    specs, rps = [], []
    for pm, s in zip(phase_maps, strides):
        _, hp, wp, c = pm.shape
        assert c == s * s
        specs.append((s, hp, wp * s,
                      (hp * s - out_h) // 2, (wp * s - out_w) // 2))
        rps.append(_to_row_phase(pm, s))
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    out = pl.pallas_call(
        functools.partial(_kernel, specs, out_h, out_w),
        grid=(n,),
        in_specs=[pl.BlockSpec((1,) + rp.shape[1:], lambda i: (i, 0, 0, 0))
                  for rp in rps],
        out_specs=pl.BlockSpec((1, out_h, out_w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), dtype),
        interpret=interpret,
    )(*rps)
    return out[..., None]


def _fence(r):
    np.asarray(jnp.ravel(jax.tree.leaves(r)[0])[:8])


def _time(fn, *args, n_runs=20, rounds=3):
    _fence(fn(*args))
    best = float('inf')
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n_runs):
            r = fn(*args)
        _fence(r)
        best = min(best, (time.perf_counter() - t0) / n_runs)
    return best


def main():
    rng = np.random.RandomState(0)
    h, w, n = 480, 854, 128
    strides = [4, 8, 16, 32]   # resnet head deconv strides (2^(2+i))
    pms = [jnp.asarray(rng.randn(n, h // s + 1, w // s + 1, s * s),
                       jnp.bfloat16) for s in strides]

    f_fused = jax.jit(
        lambda *p: fused_contrib_sum(list(p), strides, h, w))
    f_ref = jax.jit(
        lambda *p: reference_contrib_sum(list(p), strides, h, w))

    got = np.asarray(f_fused(*pms)[:2]).astype(np.float32)
    want = np.asarray(f_ref(*pms)[:2]).astype(np.float32)
    err = np.abs(got - want).max()
    print(f'max |fused - xla| = {err:.4f} (bf16: 1-2 ulp from f32-register '
          f'accumulation in Mosaic)')
    print(f'fused (retired): {_time(f_fused, *pms) * 1e3:.2f} ms')
    print(f'plain XLA      : {_time(f_ref, *pms) * 1e3:.2f} ms')


if __name__ == '__main__':
    main()
