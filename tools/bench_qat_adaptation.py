"""Measure the QAT adaptation leg on the real chip.

Three questions, answered on a synthetic 480p frame with the production
budget (10k steps, Adam variant 11, flip + 3-scale schedule):

1. step cost: QAT (fake-quant forward, ``compress/qat.py``) vs float —
   the fake-quant inserts per-conv round/clip chains, so the window step
   does strictly more elementwise work;
2. quality: IoU of the adapted model served (a) float, (b) int8 from PTQ
   of the float-adapted weights, (c) int8 from the QAT weights with
   training-time scales (``qat.finalize``) — all on the training frame;
3. consistency: sign agreement between the QAT training forward and the
   int8 engine it claims to match.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_qat_adaptation.py \\
           [--n-epochs 10000] [--dtype fp32|bf16]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from fosvos_tpu.runtime.device import enable_compilation_cache

enable_compilation_cache()

from fosvos_tpu.compress import qat, quantize
from fosvos_tpu.models import make_resnet
from fosvos_tpu.train import online, optimizers


def _iou(logits, gt):
    pred = np.asarray(logits)[..., 0] > 0.0
    gt = np.asarray(gt) >= 0.5
    inter = np.logical_and(pred, gt).sum()
    return inter / max(np.logical_or(pred, gt).sum(), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-epochs', type=int, default=10000)
    ap.add_argument('--dtype', default='fp32', choices=['fp32', 'bf16'])
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == 'bf16' else None
    model = make_resnet(18, dtype=dtype)
    init_model = make_resnet(18)
    variables = jax.device_put(init_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False))

    rng = np.random.RandomState(0)
    img = (rng.randn(480, 854, 3) * 40.0).astype(np.float32)
    gt = np.zeros((480, 854), np.float32)
    gt[100:300, 200:500] = 1.0
    x = jnp.asarray(img[None])
    preset = optimizers.online_variant(11)

    # float adaptation (reference workload), twice for steady state
    tuner = online.OnlineFinetuner(model, preset, avg_grad_every_n=5)
    for i in range(2):
        rf = tuner.finetune(variables, img, gt, n_epochs=args.n_epochs,
                            seed=i)
    fl = {'params': rf.state.params, 'batch_stats': rf.state.batch_stats}
    print(f'float  {args.dtype}: {rf.wall_time_s:.1f} s '
          f'({rf.wall_time_s / args.n_epochs * 1e3:.2f} ms/step), '
          f'final loss {rf.losses[-1]:.4g}')

    # QAT adaptation, same budget/seeds
    scales = qat.calibrate_scales(init_model, variables, [img[None]],
                                  margin=1.25)
    qtuner = online.OnlineFinetuner(
        model, preset, avg_grad_every_n=5,
        apply_fn=qat.make_apply(model, scales))
    for i in range(2):
        rq = qtuner.finetune(variables, img, gt, n_epochs=args.n_epochs,
                             seed=i)
    ad = {'params': rq.state.params, 'batch_stats': rq.state.batch_stats}
    print(f'QAT    {args.dtype}: {rq.wall_time_s:.1f} s '
          f'({rq.wall_time_s / args.n_epochs * 1e3:.2f} ms/step, '
          f'{rq.wall_time_s / rf.wall_time_s:.2f}x float), '
          f'final loss {rq.losses[-1]:.4g}')

    # serving quality on the training frame
    t0 = time.perf_counter()
    float_outs = init_model.apply(fl, x, train=False)
    ptq = quantize.build_qparams(init_model, fl, [img[None]])
    ptq_outs = quantize.quantized_apply(init_model, fl, ptq.tree(), x)
    qp = qat.finalize(ad, scales)
    qat_outs = quantize.quantized_apply(init_model, ad, qp.tree(), x)
    fq_outs = qat.make_apply(init_model, scales)(ad, x, train=False)
    agree = np.mean(np.sign(np.asarray(qat_outs[-1]))
                    == np.sign(np.asarray(fq_outs[-1])))
    print(f'IoU on the training frame: float {_iou(float_outs[-1][0], gt):.4f} | '
          f'PTQ-of-float {_iou(ptq_outs[-1][0], gt):.4f} | '
          f'QAT-int8 {_iou(qat_outs[-1][0], gt):.4f}')
    print(f'QAT forward vs int8 engine sign agreement: {agree:.6f} '
          f'(serving eval {time.perf_counter() - t0:.1f} s)')


if __name__ == '__main__':
    main()
