"""Decompose the batched device-resident offline train step on-chip.

Round-4 verdict (weak #1): the resident engine saturates at ~510 fps at
b32 bf16 (~24% of v5e bf16 peak vs ~53% on the serving path) and nothing
names what binds it. This tool measures the REAL 480p b32 step — the exact
``ChunkEngine`` body from ``train/resident.py`` — as a ladder of ablated
scan programs, each timed with the shared pipelined fence
(``runtime.timing.time_pipelined``) and annotated with the compiled
program's own cost analysis (flops / bytes accessed), so each rung's
delta names a stage:

  data        gather + uint8 cast + flip + normalize   (the input pipeline)
  data+rs     ... + the 0.5-scale cubic resize          (device augmentation)
  fwd(eval)   ... + forward, train=False                (inference trunk)
  fwd         ... + forward, train=True + 5-map loss    (adds BN batch stats)
  fwdbwd      ... + value_and_grad                      (the backward)
  full        ... + MultiSteps(10) Adam update          (the production step)
  full@0.5/0.8  the production step at the other augmentation scales
  fuse-only   fwdbwd with the fuse loss only            (5-head supervision cost)

plus the candidate levers, measured as paired variants:

  lever:bf16-data    cast to bf16 straight out of the uint8 gather
                     (normalize + flip + resize in bf16, halving the
                     augmented batch's HBM round trip)
  lever:donate       donate the state buffers into the scan program

Run (real chip):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_resident_step.py
Options: --batch 32 --scan-steps 10 --runs 5 --skip-levers

Reference anchor for the budget this feeds: ``src/train_offline.py:153-155``
(240 epochs x 2079 frames); the r04 bench row this was built to explain
(``..._b32_bf16`` = 511 fps) decomposed into a fixture artifact (~11%
per-epoch host overhead at 4 steps/epoch) plus a backward-bound device
step that keeps gaining MXU efficiency up to a b128 knee — measured
schedule-weighted 668 (b32) / 735 (b64) / 1074 (b128) / 981 (b256) fps;
the production-loop bench row is now 928 fps at b128 (BENCHMARKS.md
"What binds the batched resident step").
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

from fosvos_tpu.data import transforms
from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
from fosvos_tpu.models import make_resnet
from fosvos_tpu.runtime.timing import time_pipelined
from fosvos_tpu.train import optimizers, resident
from fosvos_tpu.train.losses import deep_supervision_loss
from fosvos_tpu.train.state import TrainState, create_state

H, W = 480, 854


def build(batch):
    model = make_resnet(18).clone(dtype=jnp.bfloat16)
    variables = make_resnet(18).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False)
    base = optimizers.make_optimizer(optimizers.offline_variant(11),
                                     variables['params'])
    optimizer = optax.MultiSteps(base, every_k_schedule=10)
    state = jax.device_put(create_state(variables, optimizer))

    rng = np.random.RandomState(0)
    n = max(64, 2 * batch)
    imgs_u8 = jax.device_put(
        rng.randint(0, 256, (n, H, W, 3), dtype=np.uint8))
    gts_u8 = jax.device_put(
        (rng.rand(n, H, W, 1) > 0.7).astype(np.uint8) * 255)
    return model, optimizer, state, imgs_u8, gts_u8


def make_scan(body, scan_steps, batch, n_frames, donate=False):
    def run(state, imgs_u8, gts_u8, idxs, flips):
        return jax.lax.scan(body(imgs_u8, gts_u8), state, (idxs, flips))

    fn = jax.jit(run, donate_argnums=(0,) if donate else ())
    rng = np.random.RandomState(1)
    idxs = jax.device_put(rng.randint(
        0, n_frames, (scan_steps, batch)).astype(np.int32))
    flips = jax.device_put(rng.rand(scan_steps, batch) < 0.5)
    return fn, idxs, flips


def data_stage(imgs_u8, gts_u8, idx, flip, scale, data_dtype=jnp.float32):
    """The exact ChunkEngine input pipeline (resident.py run_chunk body)."""
    imgs = jnp.take(imgs_u8, idx, axis=0).astype(data_dtype)
    gts = jnp.take(gts_u8, idx, axis=0).astype(data_dtype)
    if scale != 1.0:
        oh, ow = int(round(H * scale)), int(round(W * scale))
        b = imgs.shape[0]
        imgs = jax.image.resize(imgs, (b, oh, ow, 3), 'cubic')
        gts = jax.image.resize(gts, (b, oh, ow, 1), 'nearest')
    imgs, gts = transforms.device_flip(imgs, gts, flip)
    imgs = imgs - jnp.asarray(DAVIS_MEAN_BGR, data_dtype)
    gmax = jnp.maximum(jnp.max(gts, axis=(1, 2, 3), keepdims=True),
                       jnp.asarray(1e-8, data_dtype))
    gts = gts / gmax
    return imgs, gts


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--scan-steps', type=int, default=10)
    ap.add_argument('--runs', type=int, default=5)
    ap.add_argument('--skip-levers', action='store_true')
    ap.add_argument('--only', default=None,
                    help='comma-separated variant-name prefixes to run '
                         "(e.g. 'full@' for just the production steps)")
    args = ap.parse_args(argv)
    B, T = args.batch, args.scan_steps

    model, optimizer, state, imgs_u8, gts_u8 = build(B)
    n_frames = imgs_u8.shape[0]
    print(f'# device={jax.devices()[0].platform} b={B} scan_steps={T}',
          flush=True)

    def body_data(scale, dt=jnp.float32):
        def mk(d_imgs, d_gts):
            def body(carry, xf):
                idx, flip = xf
                imgs, gts = data_stage(d_imgs, d_gts, idx, flip, scale, dt)
                # consume both so nothing is DCE'd
                s = (jnp.sum(imgs.astype(jnp.float32))
                     + jnp.sum(gts.astype(jnp.float32)))
                return carry + s, s
            return body
        return mk

    def body_fwd(scale, train, dt=jnp.float32):
        def mk(d_imgs, d_gts):
            def body(carry, xf):
                stats, acc = carry
                idx, flip = xf
                imgs, gts = data_stage(d_imgs, d_gts, idx, flip, scale, dt)
                if train:
                    outs, mut = model.apply(
                        {'params': state.params, 'batch_stats': stats},
                        imgs, train=True, mutable=['batch_stats'])
                    stats = mut['batch_stats']
                else:
                    outs = model.apply(
                        {'params': state.params, 'batch_stats': stats},
                        imgs, train=False)
                total, _ = deep_supervision_loss(outs, gts, jnp.float32(0.5))
                return (stats, acc + total), total
            return body
        return mk

    def body_bwd(scale, fuse_only=False, dt=jnp.float32):
        def mk(d_imgs, d_gts):
            def body(carry, xf):
                stats, acc = carry
                idx, flip = xf
                imgs, gts = data_stage(d_imgs, d_gts, idx, flip, scale, dt)

                def loss_fn(p):
                    outs, mut = model.apply(
                        {'params': p, 'batch_stats': stats},
                        imgs, train=True, mutable=['batch_stats'])
                    if fuse_only:
                        from fosvos_tpu.train.losses import online_loss
                        total = online_loss(outs, gts)
                    else:
                        total, _ = deep_supervision_loss(
                            outs, gts, jnp.float32(0.5))
                    return total, mut['batch_stats']

                (total, stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                           for g in jax.tree.leaves(grads))
                return (stats, acc + gsum), total
            return body
        return mk

    def body_full(scale, dt=jnp.float32):
        step_fn = resident._offline_step_fn(model, optimizer)

        def mk(d_imgs, d_gts):
            def body(st, xf):
                idx, flip = xf
                imgs, gts = data_stage(d_imgs, d_gts, idx, flip, scale, dt)
                return step_fn(st, None, imgs.astype(jnp.float32),
                               gts.astype(jnp.float32), jnp.float32(0.5))
            return body
        return mk

    variants = [
        ('data@1.0', body_data(1.0), 0.0),
        ('data@0.5', body_data(0.5), 0.0),
        ('fwd-eval@1.0', body_fwd(1.0, train=False), 'stats'),
        ('fwd-train@1.0', body_fwd(1.0, train=True), 'stats'),
        ('fwdbwd@1.0', body_bwd(1.0), 'stats'),
        ('fwdbwd-fuseonly@1.0', body_bwd(1.0, fuse_only=True), 'stats'),
        ('full@1.0', body_full(1.0), 'state'),
        ('full@0.8', body_full(0.8), 'state'),
        ('full@0.5', body_full(0.5), 'state'),
    ]
    if not args.skip_levers:
        variants += [
            ('lever:data@0.5-bf16', body_data(0.5, jnp.bfloat16), 0.0),
            ('lever:full@1.0-bf16data', body_full(1.0, jnp.bfloat16),
             'state'),
            ('lever:full@0.5-bf16data', body_full(0.5, jnp.bfloat16),
             'state'),
        ]

    if args.only:
        prefixes = tuple(p for p in args.only.split(',') if p)
        variants = [v for v in variants if v[0].startswith(prefixes)]

    results = {}
    for name, mk, carry0 in variants:
        donate = False
        if carry0 == 'state':
            init = state
            donate = False
        elif carry0 == 'stats':
            init = (state.batch_stats, jnp.zeros((), jnp.float32))
        else:
            init = jnp.zeros((), jnp.float32)
        fn, idxs, flips = make_scan(mk, T, B, n_frames, donate=donate)
        t0 = time.perf_counter()
        out = fn(init, imgs_u8, gts_u8, idxs, flips)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        compile_s = time.perf_counter() - t0

        cost = {}
        try:
            ca = fn.lower(init, imgs_u8, gts_u8, idxs, flips)\
                   .compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            cost = {k: ca.get(k) for k in ('flops', 'bytes accessed')
                    if ca and k in ca}
        except Exception as e:  # pragma: no cover - backend-dependent
            cost = {'error': str(e)[:80]}

        dt = min(time_pipelined(lambda: fn(init, imgs_u8, gts_u8, idxs,
                                           flips), n_runs=args.runs)
                 for _ in range(3))
        per_step_ms = dt / T * 1e3
        fps = B * T / dt
        row = {'variant': name, 'per_step_ms': round(per_step_ms, 3),
               'fps': round(fps, 1), 'compile_s': round(compile_s, 1)}
        if cost.get('flops'):
            row['tflops_per_s'] = round(
                cost['flops'] / T / (per_step_ms / 1e3) / 1e12, 1)
        if cost.get('bytes accessed'):
            row['hbm_gb_per_s'] = round(
                cost['bytes accessed'] / T / (per_step_ms / 1e3) / 1e9, 1)
        results[name] = row
        print(json.dumps(row), flush=True)

    # derived deltas (per-step ms at scale 1.0)
    def d(a, b):
        if a in results and b in results:
            return round(results[a]['per_step_ms']
                         - results[b]['per_step_ms'], 3)
        return None

    print(json.dumps({
        'delta_forward_ms': d('fwd-eval@1.0', 'data@1.0'),
        'delta_bn_stats_ms': d('fwd-train@1.0', 'fwd-eval@1.0'),
        'delta_backward_ms': d('fwdbwd@1.0', 'fwd-train@1.0'),
        'delta_optimizer_ms': d('full@1.0', 'fwdbwd@1.0'),
        'delta_sidehead_bwd_ms': d('fwdbwd@1.0', 'fwdbwd-fuseonly@1.0'),
        'delta_resize05_ms': d('data@0.5', 'data@1.0'),
        'schedule_weighted_fps': round(
            3 * B / sum(results[f'full@{s}']['per_step_ms'] / 1e3
                        for s in ('1.0', '0.8', '0.5')), 1)
        if all(f'full@{s}' in results for s in ('1.0', '0.8', '0.5'))
        else None,
    }), flush=True)


if __name__ == '__main__':
    main()
