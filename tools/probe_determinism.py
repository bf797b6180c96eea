"""Probe run-to-run nondeterminism on the tunneled TPU backend.

BENCHMARKS.md notes identical code+seed+data produced one-shot final losses
of 6.5 vs 1103 across runs on-chip while CPU runs are deterministic. This
probe separates the candidate causes:

  1. same dispatch repeated        -> per-dispatch nondeterminism
     (same compiled program, same inputs, twice)
  2. grad of the loss repeated     -> nondeterministic reductions in bwd
  3. a 100-step scan repeated from identical carries
                                   -> divergence accumulation rate
  4. process-restart comparison is left to the caller (run the tool twice
     and diff the printed hashes) -> autotuning / compile nondeterminism

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_determinism.py
"""
import hashlib

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

from fosvos_tpu.models import make_resnet
from fosvos_tpu.train import optimizers
from fosvos_tpu.train.losses import online_loss


def digest(tree) -> str:
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(tree):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]


def main():
    h, w = 240, 427   # half-res keeps compiles quick; numerics identical
    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    variables = jax.device_put(variables)
    params, batch_stats = variables['params'], variables['batch_stats']
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 40.0)
    gt = np.zeros((1, h, w, 1), np.float32)
    gt[:, 60:120, 100:220] = 1.0
    gt = jnp.asarray(gt)

    def loss_fn(p, bs, x, g):
        outs, mut = model.apply({'params': p, 'batch_stats': bs}, x,
                                train=True, mutable=['batch_stats'])
        return online_loss(outs, g), mut['batch_stats']

    fwd = jax.jit(lambda p, bs, x, g: loss_fn(p, bs, x, g)[0])
    grad = jax.jit(lambda p, bs, x, g: jax.grad(
        lambda pp: loss_fn(pp, bs, x, g)[0])(p))

    print(f'backend: {jax.devices()[0].platform} {jax.devices()[0]}')

    # 1. forward repeated
    a = np.asarray(fwd(params, batch_stats, img, gt))
    b = np.asarray(fwd(params, batch_stats, img, gt))
    print(f'1. fwd loss twice:  {a!r} vs {b!r}  '
          f'{"DETERMINISTIC" if a.tobytes() == b.tobytes() else "DIVERGENT"}')

    # 2. grad repeated
    ga = grad(params, batch_stats, img, gt)
    gb = grad(params, batch_stats, img, gt)
    da, db = digest(ga), digest(gb)
    print(f'2. grad twice:      {da} vs {db}  '
          f'{"DETERMINISTIC" if da == db else "DIVERGENT"}')
    if da != db:
        diffs = jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), ga, gb)
        mx = max(jax.tree.leaves(diffs))
        print(f'   max |grad diff| over leaves: {mx:.3e}')

    # 3. 100-step scanned adaptation repeated
    base_opt = optimizers.make_optimizer(optimizers.online_variant(11),
                                         params)
    optimizer = optax.MultiSteps(base_opt, every_k_schedule=5)

    @jax.jit
    def scan100(p, bs, os_, x, g):
        def body(c, _):
            pp, bbs, oos = c
            (loss, nbs), grads = jax.value_and_grad(
                lambda q: loss_fn(q, bbs, x, g), has_aux=True)(pp)
            updates, oos = optimizer.update(grads, oos, pp)
            return (optax.apply_updates(pp, updates), nbs, oos), loss
        (p, bs, os_), losses = jax.lax.scan(body, (p, bs, os_), None,
                                            length=100)
        return p, losses

    os0 = optimizer.init(params)
    p1, l1 = scan100(params, batch_stats, os0, img, gt)
    p2, l2 = scan100(params, batch_stats, os0, img, gt)
    l1, l2 = np.asarray(l1), np.asarray(l2)
    d1, d2 = digest(p1), digest(p2)
    same = d1 == d2 and l1.tobytes() == l2.tobytes()
    print(f'3. scan100 twice:   params {d1} vs {d2}; '
          f'first loss {l1[0]:.6g}/{l2[0]:.6g}, '
          f'last {l1[-1]:.6g}/{l2[-1]:.6g}  '
          f'{"DETERMINISTIC" if same else "DIVERGENT"}')
    if not same:
        first_div = int(np.argmax(l1 != l2)) if (l1 != l2).any() else -1
        print(f'   first diverging loss index: {first_div}')

    print(f'process fingerprint (diff across runs => compile/autotune '
          f'nondeterminism): fwd={a!r} scan={digest(p1)}')


if __name__ == '__main__':
    main()
