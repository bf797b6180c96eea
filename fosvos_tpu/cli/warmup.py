"""Deployment warmup: precompile the production programs into the
persistent XLA cache.

A fresh 480p program costs minutes of XLA compile time on this backend
(first resnet18 forward ~4 min; the adaptation scans similar) — paid by
whichever process runs the shape first. The reference has no equivalent
problem (PyTorch 0.4 runs eagerly); the TPU-native answer is to pay the
compiles once at *deploy* time: this CLI executes tiny-budget runs of the
serving/adaptation/webcam programs at the production shapes, so every
program lands in ``runtime.device.enable_compilation_cache``'s on-disk
cache and later processes (the online sweep, the fleet server, run_webcam)
start in seconds.

Compiled programs depend on shapes/dtypes only, never on weight values, so
warmup needs no checkpoint: a fresh-init model of the right topology warms
exactly the programs the real weights will run. Budget-shaped programs
(the adaptation's per-chunk scan lengths) are reproduced by running the
real scale schedule for the requested ``--n-epochs`` at the sweep's seed.

Typical deploy step::

    fosvos-warmup --network resnet18 --height 480 --width 854 \
        --batch-size-test 4 --adapt --serve --bf16
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def build_model(network: str, arch_json: str = None,
                scale_down_exponent: int = 0):
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.models import (OSVOSResNet, OSVOSVGG, ResNetArch,
                                   resnet_arch)
    if arch_json:
        with open(arch_json) as f:
            model = OSVOSResNet(arch=ResNetArch.from_json(f.read()))
    elif network == 'vgg16':
        model = OSVOSVGG()
    else:
        version = int(network.removeprefix('resnet'))
        model = OSVOSResNet(arch=resnet_arch(version, scale_down_exponent))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3), jnp.float32),
                           train=False)
    return model, variables


def warm_serve(model, variables, h: int, w: int, batch_size: int,
               bf16: bool, int8: bool, mean, fold_bn: bool = False) -> None:
    """The InferenceEngine forward (mask production) at (batch, h, w)."""
    from fosvos_tpu.evaluation import experiment
    engine = experiment.InferenceEngine(model, batch_size, mean=mean,
                                        bf16=bf16, int8=int8,
                                        fold_bn=fold_bn)
    frames = np.zeros((batch_size, h, w, 3), np.uint8)
    if int8:
        # programs depend on scale *shapes* only; zeros-calibration warms
        # the same int8 forward the real calibration will run
        engine.calibrate(variables, frames)
    t0 = time.perf_counter()
    engine.masks_for_sequence(variables, frames)
    log.info('serve warm: b%d %dx%d bf16=%s int8=%s fold_bn=%s (%.1fs)',
             batch_size, h, w, bf16, int8, fold_bn,
             time.perf_counter() - t0)


def warm_adapt(model, variables, h: int, w: int, n_epochs: int,
               avg_grad_every_n: int, bf16: bool, qat_int8: bool,
               sequential_windows: bool = False, seed: int = 0) -> None:
    """Every program of one full-budget one-shot adaptation: the window
    (and trailing-partial) scans for each distinct (scale shape, chunk
    length) the schedule produces."""
    import jax.numpy as jnp
    from fosvos_tpu.train import online
    amodel = model.clone(dtype=jnp.bfloat16) if bf16 else model
    apply_fn = None
    if qat_int8:
        from fosvos_tpu.compress import qat
        img = np.zeros((1, h, w, 3), np.float32)
        scales = qat.calibrate_scales(model, variables, [img], margin=1.25)
        apply_fn = qat.make_apply(amodel, scales)
    tuner = online.OnlineFinetuner(
        amodel, avg_grad_every_n=avg_grad_every_n,
        window_batch=not sequential_windows, apply_fn=apply_fn)
    img = np.zeros((h, w, 3), np.float32)
    gt = np.zeros((h, w), np.float32)
    gt[h // 4: h // 2, w // 4: w // 2] = 1.0  # non-degenerate mask
    t0 = time.perf_counter()
    res = tuner.finetune(variables, img, gt, n_epochs=n_epochs, seed=seed)
    log.info('adapt warm: %dx%d %d steps bf16=%s qat=%s (%.1fs)', h, w,
             res.n_steps, bf16, qat_int8, time.perf_counter() - t0)


def warm_fleet(model, variables, h: int, w: int, capacity: int,
               bf16: bool, int8: bool, mean) -> None:
    """Every serve-bucket program an ElasticFleet of this capacity can
    reach (``elastic._bucket_sizes``: power-of-two sizes plus the
    capacity itself), so a production fleet's joins/leaves never hit a
    cold 480p compile — including at full fleet load."""
    from fosvos_tpu.evaluation.elastic import ElasticFleet, _bucket_sizes
    ef = ElasticFleet(model, capacity, bf16=bf16, int8=int8, mean=mean)
    frame = np.zeros((h, w, 3), np.uint8)
    t0 = time.perf_counter()
    sizes = _bucket_sizes(capacity, 1)
    n_active = 0
    for bucket in sizes:
        while n_active < bucket:
            ef.add(variables, calib_frame=frame if int8 else None)
            n_active += 1
        ef.segment(np.zeros((n_active, h, w, 3), np.uint8))
    log.info('fleet warm: %d bucket programs up to %d streams %dx%d '
             'bf16=%s int8=%s (%.1fs)', len(sizes), n_active,
             h, w, bf16, int8, time.perf_counter() - t0)


def warm_webcam(model, variables, h: int, w: int, bf16: bool,
                int8: bool) -> None:
    """The streaming segment program (run_webcam's one-jit step)."""
    from fosvos_tpu.cli.run_webcam import make_segment_fn
    submit, fetch = make_segment_fn(model, variables, boolean_mask=True,
                                    bf16=bf16, int8=int8)
    t0 = time.perf_counter()
    fetch(submit(np.zeros((h, w, 3), np.uint8)))
    log.info('webcam warm: %dx%d bf16=%s int8=%s (%.1fs)', h, w, bf16,
             int8, time.perf_counter() - t0)


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument('--network', default='resnet18', type=str)
    parser.add_argument('--arch-json', default=None, type=str,
                        help='pruned/mimic topology to warm instead of the '
                             'stock network')
    parser.add_argument('--scale-down-exponent', default=0, type=int)
    parser.add_argument('--height', default=480, type=int)
    parser.add_argument('--width', default=854, type=int)
    parser.add_argument('--batch-size-test', default=4, type=int)
    parser.add_argument('--n-epochs', default=10000, type=int,
                        help='adaptation budget whose chunk programs to '
                             'warm (reference default 10000)')
    parser.add_argument('--avg-grad-every-n', default=5, type=int)
    parser.add_argument('--serve', action='store_true',
                        help='warm the InferenceEngine forward')
    parser.add_argument('--adapt', action='store_true',
                        help='warm the one-shot adaptation scans')
    parser.add_argument('--webcam', action='store_true',
                        help='warm the streaming segment program')
    parser.add_argument('--fleet-capacity', default=0, type=int,
                        help='warm every elastic-fleet serve bucket up to '
                             'this capacity (power-of-two bucket sizes)')
    parser.add_argument('--sequential-windows', action='store_true')
    parser.add_argument('--bf16', action='store_true')
    parser.add_argument('--int8', action='store_true')
    parser.add_argument('--fold-bn', action='store_true',
                        help='warm the BN-folded serve program '
                             '(compress/foldbn.py)')
    parser.add_argument('--qat-int8', action='store_true')
    parser.add_argument('--cache-dir', default=None, type=str,
                        help='persistent XLA cache location (default '
                             '~/.cache/fosvos_tpu/xla-cache)')
    args = parser.parse_args(argv)

    from fosvos_tpu.runtime.device import enable_compilation_cache
    enable_compilation_cache(args.cache_dir)

    from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
    model, variables = build_model(args.network, args.arch_json,
                                   args.scale_down_exponent)
    h, w = args.height, args.width
    if not (args.serve or args.adapt or args.webcam
            or args.fleet_capacity):
        args.serve = args.adapt = True
    t0 = time.perf_counter()
    if args.serve:
        warm_serve(model, variables, h, w, args.batch_size_test,
                   args.bf16, args.int8, DAVIS_MEAN_BGR,
                   fold_bn=getattr(args, 'fold_bn', False))
    if args.adapt:
        warm_adapt(model, variables, h, w, args.n_epochs,
                   args.avg_grad_every_n, args.bf16,
                   getattr(args, 'qat_int8', False),
                   args.sequential_windows)
    if args.fleet_capacity:
        warm_fleet(model, variables, h, w, args.fleet_capacity,
                   args.bf16, args.int8, DAVIS_MEAN_BGR)
    if args.webcam:
        warm_webcam(model, variables, h, w, args.bf16, args.int8)
    log.info('warmup done in %.1fs — programs cached for later processes',
             time.perf_counter() - t0)


if __name__ == '__main__':
    main()
