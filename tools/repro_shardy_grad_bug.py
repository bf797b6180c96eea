"""Minimal repro: jax 0.9.0's Shardy partitioner mis-reduces gradients of
partially-replicated tensors.

Setup: a ('data', 'spatial') mesh; images sharded P(None, 'spatial')
(i.e. REPLICATED across 'data', sharded across 'spatial'); conv kernel
replicated. The kernel gradient of conv(x, k).sum() must be independent of
the mesh — but under Shardy it comes back exactly data_axis_size times too
large (the backward all-reduce runs over the whole mesh instead of only the
'spatial' axis). Forward values are correct either way; the classic GSPMD
partitioner computes the correct gradient.

This silently corrupted every spatially-sharded *training* path (data-only
sharding is unaffected, which is why the dp gradient-parity test never saw
it). fosvos_tpu.parallel.mesh.pin_correct_partitioner() forces the classic
partitioner; this script documents the evidence.

Usage: python tools/repro_shardy_grad_bug.py [--classic]
"""
import argparse

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)

ap = argparse.ArgumentParser()
ap.add_argument('--classic', action='store_true',
                help='use the classic GSPMD partitioner (the workaround)')
args = ap.parse_args()
if args.classic:
    jax.config.update('jax_use_shardy_partitioner', False)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(2, 32, 48, 8).astype(np.float32))
k = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)

conv = lambda xx, kk: jax.lax.conv_general_dilated(
    xx, kk, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
gfn = lambda kk, xx: jax.grad(lambda q: conv(xx, q).sum())(kk)
g_ref = np.asarray(jax.jit(gfn)(k, x))

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ('data', 'spatial'))
rep = NamedSharding(mesh, P())
sh = NamedSharding(mesh, P(None, 'spatial'))
g_sh = np.asarray(jax.jit(gfn, in_shardings=(rep, sh), out_shardings=rep)(
    k, jax.device_put(x, sh)))

ratio = float(np.mean(g_sh / np.where(np.abs(g_ref) > 1e-6, g_ref, np.nan)))
mode = 'classic GSPMD' if args.classic else 'Shardy (jax default)'
print(f'jax {jax.__version__}, partitioner: {mode}')
print(f'sharded-grad / reference-grad ratio: {ratio:.4f}  '
      f'(correct = 1.0; the bug gives the data-axis size)')
