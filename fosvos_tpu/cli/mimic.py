"""Mimic / distillation CLI — reference ``src/mimic.py`` ``__main__``:
sweeps student width scale_down_exponent 0..6, each trained against the
teacher's outputs, then speed+mask evaluation.
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional


from fosvos_tpu.compress import mimic as mimic_lib
from fosvos_tpu.config.paths import Paths
from fosvos_tpu.data.davis import DAVIS2016, VAL_SEQUENCES
from fosvos_tpu.evaluation import experiment
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.models import import_torch
from fosvos_tpu.runtime import checkpoint
from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def get_experiment_id(learning_rate, criterion, criterion_from, learn_from):
    # reference mimic.py:38-41
    return ('lr={0:0.1e},criterion={1},criterion_from={2},learn_from={3}'
            .format(learning_rate, criterion, criterion_from, learn_from))


def load_teacher(model_path: Optional[str]):
    import jax
    import jax.numpy as jnp
    arch = resnet_arch(18)
    model = OSVOSResNet(arch=arch)
    if model_path and model_path.endswith('.pth'):
        sd = import_torch.load_state_dict(model_path)
        variables = import_torch.osvos_resnet_checkpoint_to_variables(sd, arch)
        variables = jax.tree.map(jnp.asarray, variables)
    elif model_path:
        d, stem = str(Path(model_path).parent), Path(model_path).stem
        if stem.endswith('.npz'):
            stem = stem[:-4]
        variables, _ = checkpoint.load(d, stem)
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        log.warning('No --teacher-path: using fresh-init teacher.')
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 96, 3), jnp.float32),
                               train=False)
    return model, variables


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument('--gpu-id', '--device-id', dest='device_id',
                        default=None, type=int)
    parser.add_argument('--offline', action='store_true')
    parser.add_argument('-s', '--sequence-name', default=None, type=str)
    parser.add_argument('-sg', '--sequence-group', default=None, type=int)
    parser.add_argument('-sgs', '--sequence-group-size', default=None,
                        type=int)
    parser.add_argument('--n-epochs', default=200, type=int)
    parser.add_argument('--learning-rate', default=1e-3, type=float)
    parser.add_argument('--no-training', action='store_true')
    parser.add_argument('--criterion', default='CBCEL', type=str,
                        choices=['MSE', 'L1', 'CBCEL'])
    parser.add_argument('--learn-from', default='teacher', type=str,
                        choices=['teacher', 'ground_truth'])
    parser.add_argument('--scale-down-exponents', default='0,1,2,3,4,5,6',
                        type=str, help='comma list (reference sweeps 0..6)')
    parser.add_argument('--db-root-dir', default=None, type=str)
    parser.add_argument('--teacher-path', default=None, type=str)
    args = parser.parse_args(argv)

    db_root_dir = args.db_root_dir or Paths.db_root_dir()
    sdes = [int(s) for s in args.scale_down_exponents.split(',')]

    if args.offline:
        sequences = [None]
    elif args.sequence_name is not None:
        sequences = [args.sequence_name]
    elif args.sequence_group is not None:
        sequences = [s for i, s in enumerate(VAL_SEQUENCES)
                     if i % args.sequence_group_size == args.sequence_group]
    else:
        sequences = list(VAL_SEQUENCES)

    for sde in sdes:
        log.info('scale-down-exponent: %d', sde)
        for seq in sequences:
            run_one(seq, sde, args, db_root_dir)


def run_one(seq_name: Optional[str], sde: int, args, db_root_dir) -> None:
    import jax
    import jax.numpy as jnp

    experiment_id = get_experiment_id(args.learning_rate, args.criterion,
                                      'all', args.learn_from)
    path_stem = Path('resnet18') / '11' / 'mimic' / experiment_id
    path_stem /= 'offline' if args.offline else 'online'
    models_dir = Path('models') / path_stem / str(sde)
    results_dir = Path('results') / path_stem / str(sde)

    teacher_model, teacher_vars = (load_teacher(args.teacher_path)
                                   if args.learn_from == 'teacher'
                                   else (None, None))

    student_arch = resnet_arch(18, scale_down_exponent=sde)
    student_model = OSVOSResNet(arch=student_arch)
    student_vars = student_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False)

    db_train = DAVIS2016(mode='train', db_root_dir=str(db_root_dir),
                         seq_name=seq_name)
    db_val = DAVIS2016(mode='test', db_root_dir=str(db_root_dir),
                       seq_name=seq_name)

    def batches(db):
        def gen():
            for i in range(len(db)):
                img, gt = db.make_img_gt_pair(i)
                yield img[None], gt[None, ..., None]
        return gen

    sub = seq_name or 'offline'

    if not args.no_training:
        def snapshot(epoch, state):
            checkpoint.save(str(models_dir / sub), str(epoch),
                            {'params': state.params,
                             'batch_stats': state.batch_stats},
                            student_arch.to_json())

        res = mimic_lib.train_mimic(
            student_model, student_vars, teacher_model, teacher_vars,
            batches(db_train), val_batches_fn=batches(db_val),
            n_epochs=args.n_epochs, criterion=args.criterion,
            learn_from=args.learn_from, learning_rate=args.learning_rate,
            snapshot_fn=snapshot)
        student_vars = {'params': res.state.params,
                        'batch_stats': res.state.batch_stats}
        checkpoint.save(str(models_dir / sub), str(args.n_epochs),
                        student_vars, student_arch.to_json())

    # speed then masks, reference mimic.py:135-141
    out_dir = str(results_dir / sub)
    speed = experiment.test(student_model, student_vars, db_val, out_dir,
                            seq_name=seq_name, eval_speeds=True)
    experiment.test(student_model, student_vars, db_val, out_dir,
                    seq_name=seq_name)
    for k, v in speed.items():
        if hasattr(v, 'fps'):
            log.info('mimic sde=%d %s: %.1f fps', sde, k, v.fps)


if __name__ == '__main__':
    main()
