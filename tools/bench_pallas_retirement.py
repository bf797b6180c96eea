"""Measurements behind retiring the Pallas loss/preprocess kernels.

Run on the TPU chip:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_pallas_retirement.py

Both candidate kernels fuse elementwise/reduction work that XLA already
fuses into adjacent convolutions; a pallas_call must materialize its inputs
and outputs in HBM, which costs more than the fusion saves. Numbers and the
full rationale: BENCHMARKS.md, "Pallas kernels: measured and retired".
The kernels themselves (single-pass CB-BCE with custom VJP, 5-map fused
deep-supervision partials, uint8 preprocess) live in git history at the
commit that adds this file.
"""
import sys

sys.path.insert(0, '.')

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fosvos_tpu.models import make_resnet  # noqa: E402
from fosvos_tpu.data.davis import DAVIS_MEAN_BGR  # noqa: E402
from fosvos_tpu.train.offline import OfflineTrainer  # noqa: E402
from fosvos_tpu.runtime.timing import time_pipelined  # noqa: E402


def bench_offline_step():
    """480p batch-1 offline train step (the deep-supervision loss consumer).

    With the retired fused-loss kernel this measured 11.93 ms vs 10.23 ms
    for plain XLA (jnp.stack of the five maps + pallas input materialization
    beats the single shared label read it saves)."""
    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (1, 480, 854, 3), np.uint8))
    gts_u = np.zeros((1, 480, 854, 1), np.uint8)
    gts_u[:, 100:300, 200:500] = 255
    gts = jnp.asarray(gts_u)

    tr = OfflineTrainer(model, avg_grad_every_n=1, device_preprocess=True)
    state = tr.init_state(variables)
    state, _ = tr.train_step(state, imgs, gts, 0.5)  # compile

    dt = time_pipelined(
        lambda: tr._train_step(state, imgs, gts,
                               jnp.asarray(0.5, jnp.float32))[1],
        n_runs=30)
    print(f'offline step (xla loss): {dt * 1e3:.2f} ms')


def bench_uint8_forward():
    """480p batch-64 uint8-ingest forward (the preprocess consumer).

    With the retired pallas preprocess this measured 125.3 ms vs 94.1 ms for
    the plain cast+subtract, which XLA fuses into the first conv's input
    read instead of round-tripping a full-res float32 tensor through HBM."""
    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    variables = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables))
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 255, (64, 480, 854, 3), np.uint8))

    @jax.jit
    def fwd(variables, images):
        x = images.astype(jnp.float32) - jnp.asarray(DAVIS_MEAN_BGR,
                                                     jnp.float32)
        outs = model.apply(variables, x, train=False)
        prob = jax.nn.sigmoid(outs[-1][..., 0].astype(jnp.float32))
        return jnp.round(prob * 255.0).astype(jnp.uint8)

    r = fwd(variables, frames)
    np.asarray(r[0, 0, :1])
    dt = time_pipelined(fwd, variables, frames, n_runs=10)
    print(f'uint8 forward b64 (xla preprocess): {dt * 1e3:.2f} ms '
          f'({64 / dt:.0f} fps)')


if __name__ == '__main__':
    bench_offline_step()
    bench_uint8_forward()
