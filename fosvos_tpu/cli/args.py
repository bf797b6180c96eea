"""Shared CLI argument surface, reproducing ``src/util/args_helper.py``."""
from __future__ import annotations

import argparse


def get_base_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument('--gpu-id', '--device-id', dest='device_id',
                        default=None, type=int,
                        help='Device index to use (name kept for parity)')
    parser.add_argument('--network', default='vgg16', type=str,
                        choices=['vgg16', 'resnet18', 'resnet34', 'resnet50',
                                 'resnet101', 'resnet152'],
                        help='The network to use (the reference CLI stops at '
                             'resnet34, args_helper.py:8-9; its model layer '
                             'supports the full family, osvos_resnet.py:74-88 '
                             '— exposed here end-to-end)')
    parser.add_argument('--no-training', action='store_true',
                        help='Skip the training phase')
    parser.add_argument('--no-testing', action='store_true',
                        help='Skip the testing phase')
    parser.add_argument('--variant-offline', default=None, type=int,
                        help='offline optimizer variant id')
    parser.add_argument('--eval-speeds', action='store_true',
                        help='evaluates the network speeds')
    parser.add_argument('--db-root-dir', default=None, type=str,
                        help='DAVIS-2016 root (overrides FOSVOS_DB_ROOT)')
    parser.add_argument('--pretrained-path', default=None, type=str,
                        help='.pth state_dict of the torchvision trunk')
    parser.add_argument('--pretrained-caffe', default=None, type=str,
                        help='vgg_hed_caffe.mat: initialize the VGG trunk '
                             'from the caffe HED weights instead of '
                             "torchvision (the reference's pretrained=2 / "
                             'is_loading_vgg_caffe path, '
                             'osvos_vgg.py:139-153)')
    parser.add_argument('--data-parallel', action='store_true',
                        help='shard the batch over all devices of the mesh '
                             '(offline training)')
    parser.add_argument('--device-resident', action='store_true',
                        help='offline training with the whole train split '
                             'resident in HBM (one upload for the run) and '
                             'on-device flip/multi-scale augmentation; '
                             'removes the per-step H2D transfer entirely '
                             '(BENCHMARKS.md offline section)')
    parser.add_argument('--n-epochs', default=None, type=int,
                        help='override the reference training budget '
                             '(offline 240 / online 10000)')
    parser.add_argument('--batch-size', default=None, type=int,
                        help='training batch size (reference default 1; '
                             'larger batches are markedly faster on TPU — '
                             'BENCHMARKS.md offline table)')
    parser.add_argument('--test-while-training', action='store_true',
                        help='run the val-split loss pass every test-every-n '
                             'epochs during offline training '
                             '(reference train_offline.py:115-136)')
    parser.add_argument('--start-epoch', default=None, type=int,
                        help='resume from this epoch checkpoint')
    parser.add_argument('--bf16', action='store_true',
                        help='bfloat16 compute: testing/eval forwards (~3x '
                             'throughput) and, for offline/online training, '
                             'bf16 activations with fp32 params/BN/losses '
                             '(1.54x per offline step measured); default '
                             'fp32 keeps masks bit-comparable')
    parser.add_argument('--int8', action='store_true',
                        help='int8 post-training-quantized testing/eval '
                             'forwards (compress/quantize.py; calibrates on '
                             "each sequence's first batch). Composes with "
                             '--bf16 (int8 convs + bf16 elsewhere)')
    parser.add_argument('--fold-bn', action='store_true',
                        help='fold BatchNorms into conv kernels for '
                             'testing/eval forwards (compress/foldbn.py; '
                             '+2.6%% bf16 / +3.9%% int8 serving throughput '
                             'measured). Off by default: folding '
                             're-associates float rounding, so bit-parity '
                             'runs must not use it')
    parser.add_argument('--visualize-network', action='store_true',
                        help='dump the forward jaxpr + lowered HLO next to '
                             "the run (the XLA equivalent of the reference's "
                             'autograd graphviz render, io_helper.py:23-28)')
    parser.add_argument('--visualize-results', action='store_true',
                        help='additionally write prediction-overlay PNGs '
                             'next to the masks (headless equivalent of the '
                             "reference's live result window, "
                             'experiment_helper.py:83-104)')
    return parser


def parse_args(is_online: bool, argv=None) -> argparse.Namespace:
    parser = get_base_parser()
    if is_online:
        parser.add_argument('-s', '--sequence-name', default=None, type=str)
        parser.add_argument('-sg', '--sequence-group', default=None, type=int)
        parser.add_argument('-sgs', '--sequence-group-size', default=None,
                            type=int)
        parser.add_argument('--variant-online', default=None, type=int)
        parser.add_argument('--offline-epoch', default=None, type=int,
                            help='epoch of the offline parent checkpoint to '
                                 'adapt from (default 239 = the offline '
                                 "CLI's final snapshot)")
        parser.add_argument('--fanout', action='store_true',
                            help='adapt all sequences in parallel on the '
                             'device mesh instead of sequentially')
        parser.add_argument('--sequential-windows', action='store_true',
                            help='run the 5 accumulation micro-steps '
                             'sequentially (exact reference loop order) '
                             'instead of the default batched window '
                             '(one vmapped {orig,flipped} fwd/bwd per '
                             'window; numerically equivalent, 3x faster)')
        parser.add_argument('--skip-done', action='store_true',
                            help='skip sequences whose final checkpoint '
                             'already exists (crash-safe work queue; replaces '
                             "the reference's hand-edited already_done list, "
                             'train_online.py:179-182)')
        parser.add_argument('--qat-int8', action='store_true',
                            help='quantization-aware adaptation: run the '
                             'one-shot fine-tune through the int8 serving '
                             'numerics (fake-quant forward, straight-through '
                             'gradients — compress/qat.py) and serve the '
                             'adapted model int8 with the training-time '
                             'scales. Implies --int8 for the test phase. '
                             'Scales are calibrated once on the first '
                             "sequence's frame so the sweep compiles once")
    args = parser.parse_args(argv)
    args.is_training = not args.no_training
    args.is_testing = not args.no_testing
    return args
