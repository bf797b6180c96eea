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


def resolve_teacher_path(seq_name: Optional[str], is_offline: bool,
                         override: Optional[str] = None,
                         models_dir=None,
                         teacher_epoch: Optional[int] = None
                         ) -> Optional[str]:
    """Teacher checkpoint per the reference contract (``mimic.py:19-30``):

    * offline mode — the offline parent, ``resnet18_11_epoch-239``;
    * online mode — the teacher **already adapted to this sequence**,
      ``resnet18_11_11_<seq>_epoch-9999`` (the output of the online sweep),
      so each sequence distills from its own specialist.

    ``override`` (the ``--teacher-path`` flag) wins when given;
    ``teacher_epoch`` (``--teacher-epoch``) replaces the reference's
    default epoch (239 offline / 9999 online) for sweeps run with a
    non-default budget. Resolution tries the framework's npz stem first,
    then the reference's ``.pth`` name, under ``models_dir``.
    """
    if override:
        return override
    d = Path(models_dir if models_dir is not None else Paths.models_dir())
    if is_offline:
        stem = checkpoint.checkpoint_stem(
            'resnet18', teacher_epoch if teacher_epoch is not None else 239,
            11)
    else:
        stem = checkpoint.checkpoint_stem(
            'resnet18', teacher_epoch if teacher_epoch is not None else 9999,
            11, 11, seq_name)
    if checkpoint.exists(str(d), stem):
        return str(d / stem)
    pth = d / (stem + '.pth')
    if pth.exists():
        return str(pth)
    return None


def load_teacher(model_path: Optional[str]):
    import jax
    import jax.numpy as jnp
    from fosvos_tpu.models import ResNetArch
    arch = resnet_arch(18)
    if model_path and model_path.endswith('.pth'):
        sd = import_torch.load_state_dict(model_path)
        variables = import_torch.osvos_resnet_checkpoint_to_variables(sd, arch)
        variables = jax.tree.map(jnp.asarray, variables)
    elif model_path:
        d, stem = str(Path(model_path).parent), Path(model_path).stem
        if stem.endswith('.npz'):
            stem = stem[:-4]
        variables, arch_json = checkpoint.load(d, stem)
        if arch_json:
            arch = ResNetArch.from_json(arch_json)
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        log.warning('No teacher checkpoint found: using fresh-init teacher '
                    '(pass --teacher-path, or run the online sweep first so '
                    'the per-sequence adapted teachers exist).')
        model = OSVOSResNet(arch=arch)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 96, 3), jnp.float32),
                               train=False)
        return model, variables
    return OSVOSResNet(arch=arch), variables


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
    parser.add_argument('--teacher-path', default=None, type=str,
                        help='teacher checkpoint override; by default the '
                             'reference contract resolves it (offline: the '
                             'offline parent, online: the per-sequence '
                             'adapted teacher, mimic.py:19-30)')
    parser.add_argument('--teacher-epoch', default=None, type=int,
                        help='epoch of the teacher checkpoint when the '
                             'sweep was run with a non-default budget '
                             '(default: 239 offline / 9999 online)')
    parser.add_argument('--allow-fresh-teacher', action='store_true',
                        help='fall back to a fresh-init teacher when no '
                             'checkpoint resolves (default: hard error — '
                             'distilling from random weights is never '
                             'intended)')
    parser.add_argument('--no-tensorboard', action='store_true')
    parser.add_argument('--qat-int8', action='store_true',
                        help='distill INTO the int8 serving numerics: the '
                             'student forward runs fake-quantized '
                             '(compress/qat.py; the teacher stays float) '
                             'and the speed/mask eval serves the student '
                             'int8 with the training-time scales. With '
                             '--no-training, the reloaded student is '
                             'PTQ-calibrated and served int8 instead')
    parser.add_argument('--device-resident', action='store_true',
                        help='offline mode: distill over the HBM-resident '
                             'train split (train/resident.py engine) — '
                             'removes the per-step H2D transfer; ignored '
                             'for per-sequence (1-frame) online runs')
    parser.add_argument('--batch-size', default=1, type=int,
                        help='distillation batch for --device-resident '
                             '(reference setting: 1). >1 batches the '
                             'teacher+student step like the parent '
                             "trainer's --batch-size — same b128 knee; "
                             'deviation: teacher train-mode BN and '
                             'student BN see batch moments over B frames')
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

    teacher_model, teacher_vars = (None, None)
    if args.learn_from == 'teacher':
        teacher_path = resolve_teacher_path(
            seq_name, args.offline, override=args.teacher_path,
            teacher_epoch=getattr(args, 'teacher_epoch', None))
        log.info('Teacher for %s: %s', seq_name or 'offline', teacher_path)
        if teacher_path is None and not getattr(args, 'allow_fresh_teacher',
                                                False):
            raise SystemExit(
                f'No teacher checkpoint found for '
                f'{seq_name or "offline"} under {Paths.models_dir()} '
                f'(expected the reference naming, mimic.py:19-30). Run the '
                f'online sweep / offline training first, or pass '
                f'--teacher-path / --teacher-epoch; --allow-fresh-teacher '
                f'overrides this check.')
        teacher_model, teacher_vars = load_teacher(teacher_path)

    student_arch = resnet_arch(18, scale_down_exponent=sde)
    student_model = OSVOSResNet(arch=student_arch)
    student_vars = student_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 3), jnp.float32),
        train=False)

    db_train = DAVIS2016(mode='train', db_root_dir=str(db_root_dir),
                         seq_name=seq_name)
    db_val = DAVIS2016(mode='test', db_root_dir=str(db_root_dir),
                       seq_name=seq_name)

    # distillation data = the reference's standard augmented train loader
    # (flip + multi-scale {0.5, 0.8, 1}, mimic.py:63-64 -> io_helper.py:62-70);
    # the three scale shapes each get their own compiled step (jit cache).
    import numpy as np
    from fosvos_tpu.data import transforms as _tf
    aug_rng = np.random.RandomState(0)

    def train_batches():
        return _tf.augmented_frame_stream(db_train, aug_rng)

    def val_batches():
        for i in range(len(db_val)):
            img, gt = db_val.make_img_gt_pair(i)
            yield img[None], gt[None, ..., None]

    sub = seq_name or 'offline'

    qat_scales = None
    student_apply_fn = None

    def calibrate_qat(vars_now):
        # one calibration per run; margin leaves headroom for the student's
        # activations drifting as distillation progresses
        from fosvos_tpu.compress import qat
        img0, _ = db_train.make_img_gt_pair(0)
        scales = qat.calibrate_scales(student_model, vars_now,
                                      [img0[None]], margin=1.5)
        log.info('QAT: calibrated %d student conv scales', len(scales))
        return scales

    if getattr(args, 'qat_int8', False) and not args.no_training:
        from fosvos_tpu.compress import qat
        qat_scales = calibrate_qat(student_vars)
        student_apply_fn = qat.make_apply(student_model, qat_scales)

    if not args.no_training:
        def snapshot(epoch, state):
            checkpoint.save(str(models_dir / sub), str(epoch),
                            {'params': state.params,
                             'batch_stats': state.batch_stats},
                            student_arch.to_json())

        from fosvos_tpu.runtime.tb import NullWriter, get_summary_writer
        # reference path mimic.py:87 plus a per-sequence subdir so a sweep
        # doesn't rmtree the previous sequences' scalars
        writer = (NullWriter() if args.no_tensorboard else
                  get_summary_writer(
                      Path('tensorboard') / path_stem / str(sde) / sub))
        use_resident = getattr(args, 'device_resident', False)
        if use_resident and seq_name is not None:
            log.info('--device-resident ignored for a 1-frame online run')
            use_resident = False
        try:
            if use_resident:
                if args.batch_size > 1:
                    log.info('batched distillation (b%d): teacher/student '
                             'BN sees batch moments — see --batch-size '
                             'help', args.batch_size)
                res = mimic_lib.train_mimic_resident(
                    student_model, student_vars, teacher_model, teacher_vars,
                    db_train, val_batches_fn=val_batches,
                    n_epochs=args.n_epochs, criterion=args.criterion,
                    learn_from=args.learn_from,
                    learning_rate=args.learning_rate,
                    snapshot_fn=snapshot, summary_writer=writer,
                    student_apply_fn=student_apply_fn,
                    batch_size=args.batch_size)
            else:
                res = mimic_lib.train_mimic(
                    student_model, student_vars, teacher_model, teacher_vars,
                    train_batches, val_batches_fn=val_batches,
                    n_epochs=args.n_epochs, criterion=args.criterion,
                    learn_from=args.learn_from,
                    learning_rate=args.learning_rate,
                    snapshot_fn=snapshot, summary_writer=writer,
                    student_apply_fn=student_apply_fn)
        finally:
            writer.close()  # flush partial-run scalars on mid-sweep crash
        student_vars = {'params': res.state.params,
                        'batch_stats': res.state.batch_stats}
        checkpoint.save(str(models_dir / sub), str(args.n_epochs),
                        student_vars, student_arch.to_json())
    else:
        # reference mimic.py:121-123: --no-training reloads the student
        # trained by a previous run from the final-epoch checkpoint
        stem = str(args.n_epochs)
        if checkpoint.exists(str(models_dir / sub), stem):
            loaded, arch_json = checkpoint.load(str(models_dir / sub), stem)
            student_vars = jax.tree.map(jnp.asarray, loaded)
            log.info('Loaded student from %s/%s', models_dir / sub, stem)
        else:
            log.warning('--no-training but no checkpoint at %s/%s: '
                        'evaluating a fresh-init student.',
                        models_dir / sub, stem)
        if getattr(args, 'qat_int8', False):
            # calibrate on the weights actually being served
            qat_scales = calibrate_qat(student_vars)

    # speed then masks, reference mimic.py:135-141
    out_dir = str(results_dir / sub)
    engine = None
    if qat_scales is not None:
        from fosvos_tpu.compress import qat
        engine = experiment.InferenceEngine(student_model, 4,
                                            mean=db_val.meanval, int8=True)
        engine.set_qparams(student_vars,
                           qat.finalize(student_vars, qat_scales))
    speed = experiment.test(student_model, student_vars, db_val, out_dir,
                            seq_name=seq_name, eval_speeds=True,
                            engine=engine)
    experiment.test(student_model, student_vars, db_val, out_dir,
                    seq_name=seq_name, engine=engine)
    for k, v in speed.items():
        if hasattr(v, 'fps'):
            log.info('mimic sde=%d %s: %.1f fps', sde, k, v.fps)


if __name__ == '__main__':
    main()
