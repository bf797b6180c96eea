"""A/B: sequential per-scale curriculum vs interleaved chunk schedule.

Background: compiling one scan per augmentation scale forces the 10k-step
one-shot adaptation into per-scale segments. Running the segments
lowest-scale-first (round-1 behavior) creates a scale *curriculum* the
reference does not have (it draws the scale uniformly per step,
``custom_transforms.py:63-92``). This script measures whether that matters,
deterministically on CPU (the TPU-tunnel backend shows run-to-run variance),
over several seeds on the synthetic fixture.

Metrics per arm: post-adaptation full-res training loss, and mean IoU over
the *unseen* frames of the sequence (the object moves, so this measures
generalization of the adapted model, like DAVIS J).

Usage: XLA_FLAGS=... python tools/ab_scale_schedule.py  (CPU, ~3 min)
"""
import sys

sys.path.insert(0, '.')

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fosvos_tpu.data import davis, synthetic, transforms  # noqa: E402
from fosvos_tpu.models import OSVOSResNet, resnet_arch  # noqa: E402
from fosvos_tpu.train import online  # noqa: E402
from fosvos_tpu.train.losses import online_loss  # noqa: E402

N_STEPS = 3000
SEEDS = (0, 1, 2)


def iou(pred, gt):
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    return inter / max(union, 1)


def evaluate(model, variables, images, gts):
    outs = model.apply(variables, jnp.asarray(images), train=False)
    preds = np.asarray(outs[-1][..., 0]) > 0
    return float(np.mean([iou(p, g >= 0.5) for p, g in zip(preds, gts)]))


def main():
    import tempfile
    db = synthetic.generate(tempfile.mkdtemp() + '/davis', size=(32, 48))
    ds_train = davis.DAVIS2016(mode='train', db_root_dir=db,
                               seq_name='synth-swan')
    img, gt = ds_train.make_img_gt_pair(0)
    ds_test = davis.DAVIS2016(mode='test', db_root_dir=db,
                              seq_name='synth-swan')
    frames, _, _ = ds_test.load_sequence()
    gt_masks = [ds_test.make_img_gt_pair(i)[1] for i in range(len(ds_test))]
    # GT only exists on frame 0 in test mode; reload full annotations
    import cv2
    gt_masks = [cv2.imread(s.label_path or
                           s.image_path.replace('JPEGImages', 'Annotations')
                           .replace('.jpg', '.png'), 0) / 255.0
                for s in ds_test.samples]

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 3), jnp.float32),
                           train=False)
    tuner = online.OnlineFinetuner(model)

    k = len(transforms.TRAIN_SCALES)
    sequential = [(s, N_STEPS // k) for s in sorted(transforms.TRAIN_SCALES)]

    @jax.jit
    def train_loss(variables, images, gts):
        outs = model.apply(variables, images, train=False)
        return online_loss(outs, gts)

    for arm in ('sequential', 'interleaved'):
        losses, ious = [], []
        for seed in SEEDS:
            sched = (sequential if arm == 'sequential'
                     else transforms.scale_schedule(
                         N_STEPS, np.random.RandomState(seed)))
            res = tuner.finetune(variables, img, gt, seed=seed,
                                 schedule=sched)
            adapted = {'params': res.state.params,
                       'batch_stats': res.state.batch_stats}
            final = float(train_loss(adapted, jnp.asarray(img[None]),
                                     jnp.asarray(gt[None, ..., None])))
            m_iou = evaluate(model, adapted, frames, gt_masks)
            losses.append(final)
            ious.append(m_iou)
            print(f'{arm} seed={seed}: full-res loss {final:.3f}, '
                  f'unseen-frame IoU {m_iou:.4f}')
        print(f'== {arm}: loss {np.mean(losses):.3f} +- {np.std(losses):.3f}, '
              f'IoU {np.mean(ious):.4f} +- {np.std(ious):.4f}')


if __name__ == '__main__':
    main()
