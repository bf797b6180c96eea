"""Channel-pruning CLI — reference ``src/prune.py`` ``main``/``__main__``.

Usage: python -m fosvos_tpu.cli.prune [--offline | -s SEQ]
           [--prune-per-iter 64] [--n-epochs-select 20]
           [--n-epochs-finetune 20]
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional


from fosvos_tpu.compress import prune as prune_lib
from fosvos_tpu.config.paths import Paths
from fosvos_tpu.data.davis import DAVIS2016, VAL_SEQUENCES
from fosvos_tpu.evaluation import experiment
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.runtime import checkpoint
from fosvos_tpu.runtime.logging import get_logger
from fosvos_tpu.runtime.providers import ResNetOnlineProvider
from fosvos_tpu.config.settings import OnlineSettings

log = get_logger(__file__)


def get_experiment_id(n_epochs_select, n_epochs_finetune, prune_per_iter):
    # reference prune.py:547-549
    return ('prune_per_iter={0},epochs_select={1},epochs_finetune={2}'
            .format(prune_per_iter, n_epochs_select, n_epochs_finetune))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--gpu-id', '--device-id', dest='device_id',
                        default=None, type=int)
    parser.add_argument('--offline', action='store_true')
    parser.add_argument('-s', '--sequence-name', default=None, type=str)
    parser.add_argument('-sg', '--sequence-group', default=None, type=int)
    parser.add_argument('-sgs', '--sequence-group-size', default=None,
                        type=int)
    parser.add_argument('--prune-per-iter', default=64, type=int)
    parser.add_argument('--n-epochs-select', default=20, type=int)
    parser.add_argument('--n-epochs-finetune', default=20, type=int)
    parser.add_argument('--percentage-max', default=90, type=int)
    parser.add_argument('--db-root-dir', default=None, type=str)
    parser.add_argument('--model-path', default=None, type=str,
                        help='checkpoint to prune (.pth migrates)')
    parser.add_argument('--pretrained-path', default=None, type=str,
                        help='torchvision resnet18 state_dict (.pth); used '
                             'when no --model-path is given — the reference '
                             'prunes the torchvision-pretrained net '
                             '(prune.py:33-43, OSVOS_RESNET(pretrained=True))')
    parser.add_argument('--no-tensorboard', action='store_true')
    parser.add_argument('--device-resident', action='store_true',
                        help='rank/fine-tune over the HBM-resident train '
                             'split (train/resident.py engine) — removes '
                             'the per-step H2D transfer; ignored for '
                             'per-sequence (1-frame) online runs')
    parser.add_argument('--batch-size', default=1, type=int,
                        help='rank/fine-tune batch for --device-resident '
                             '(reference setting: 1). >1 batches both '
                             "inner loops like the parent trainer's "
                             '--batch-size — same b128 knee; deviation: '
                             'BN batch moments over B frames')
    args = parser.parse_args(argv)

    db_root_dir = args.db_root_dir or Paths.db_root_dir()
    experiment_id = get_experiment_id(args.n_epochs_select,
                                      args.n_epochs_finetune,
                                      args.prune_per_iter)
    log.info('Experiment ID: %s', experiment_id)
    # reference path stem, prune.py:559-566
    path_stem = Path('resnet18') / '11' / 'prune' / experiment_id
    path_stem /= 'offline' if args.offline else 'online'

    if args.offline:
        sequences = [None]
    elif args.sequence_name is not None:
        sequences = [args.sequence_name]
    elif args.sequence_group is not None:
        sequences = [s for i, s in enumerate(VAL_SEQUENCES)
                     if i % args.sequence_group_size == args.sequence_group]
    else:
        sequences = list(VAL_SEQUENCES)

    for seq in sequences:
        run_one(seq, args, db_root_dir, path_stem)


def run_one(seq_name: Optional[str], args, db_root_dir, path_stem) -> None:
    import jax
    import jax.numpy as jnp

    arch = resnet_arch(18)
    model = OSVOSResNet(arch=arch)
    settings = OnlineSettings()
    provider = ResNetOnlineProvider('resnet18', Paths.models_dir(), settings,
                                    variant_offline=11, variant_online=11)
    if args.model_path:
        provider.init_network(arch)
        provider.load_model(0, path=args.model_path)
        model = provider.model
        variables = provider.variables
    else:
        # reference default: prune the torchvision-pretrained net
        # (prune.py:33-43, OSVOS_RESNET(pretrained=True))
        provider.pretrained_path = args.pretrained_path
        provider.init_network(arch)
        provider.load_pretrained_trunk()
        model = provider.model
        variables = jax.tree.map(jnp.asarray, provider.variables)
        if not args.pretrained_path:
            log.warning('No --model-path and no --pretrained-path: pruning '
                        'a fresh-init network. The reference prunes the '
                        'torchvision-pretrained net (prune.py:33-43); pass '
                        '--pretrained-path <torchvision resnet18 .pth> to '
                        'match it.')

    db = DAVIS2016(mode='train', db_root_dir=str(db_root_dir),
                   seq_name=seq_name)

    # ranking/fine-tune data: the reference's full augmented train loader
    # (flip + multi-scale, prune.py:226-251 via io_helper.get_data_loader_
    # train). The three scale shapes are grouped into per-shape compiled
    # rank-scans inside TaylorRanker.rank — one dispatch per scale bucket.
    import numpy as np
    from fosvos_tpu.data import transforms as _tf
    aug_rng = np.random.RandomState(0)

    def batches_fn():
        return _tf.augmented_frame_stream(db, aug_rng)

    models_dir = Path('models') / path_stem
    results_dir = Path('results') / path_stem

    def on_checkpoint(ckpt: prune_lib.PruneCheckpoint) -> None:
        sub = seq_name or 'offline'
        stem = f'{sub}_percentage-{ckpt.percentage}'
        checkpoint.save(str(models_dir), stem, ckpt.variables,
                        ckpt.arch.to_json())
        small = OSVOSResNet(arch=ckpt.arch)
        small_vars = jax.tree.map(jnp.asarray, ckpt.variables)
        db_test = DAVIS2016(mode='test', db_root_dir=str(db_root_dir),
                            seq_name=seq_name)
        # reference tests twice: speeds then masks (prune.py:634-640)
        speed = experiment.test(small, small_vars, db_test,
                                str(results_dir / str(ckpt.percentage)),
                                seq_name=seq_name, eval_speeds=True)
        experiment.test(small, small_vars, db_test,
                        str(results_dir / str(ckpt.percentage)),
                        seq_name=seq_name)
        for k, v in speed.items():
            if hasattr(v, 'fps'):
                log.info('pruned %d%% %s: %.1f fps', ckpt.percentage, k, v.fps)

    # reference TB path: tensorboard/<path_stem> (prune.py:568-569); a
    # per-sequence subdir is added so sweep runs don't clobber each other
    from fosvos_tpu.runtime.tb import NullWriter, get_summary_writer
    writer = (NullWriter() if args.no_tensorboard else
              get_summary_writer(Path('tensorboard') / path_stem
                                 / (seq_name or 'offline')))
    use_resident = getattr(args, 'device_resident', False)
    if use_resident and seq_name is not None:
        log.info('--device-resident ignored for a 1-frame online run')
        use_resident = False
    try:
        prune_lib.prune_iteratively(
            model, model.arch, variables, batches_fn,
            is_offline=args.offline,
            prune_per_iter=args.prune_per_iter,
            n_epochs_select=args.n_epochs_select,
            n_epochs_finetune=args.n_epochs_finetune,
            percentage_max=args.percentage_max,
            checkpoint_fn=on_checkpoint,
            summary_writer=writer,
            resident_dataset=db if use_resident else None,
            resident_batch_size=args.batch_size)
    finally:
        writer.close()  # flush partial-run scalars even on mid-sweep crash


if __name__ == '__main__':
    main()
