"""Online (one-shot) fine-tune CLI — reference ``src/train_online.py``.

Per sequence: adapt the offline parent on the first annotated frame
(compiled scans), then segment the whole sequence and write masks.

Scale-out: the reference shards the 20 val sequences across processes
(``-sg/-sgs``); those flags still work, and ``--fanout`` instead adapts all
selected sequences *in parallel* on the device mesh (fosvos_tpu.parallel).
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import List, Optional

import numpy as np

from fosvos_tpu.cli.args import parse_args
from fosvos_tpu.config.paths import Paths
from fosvos_tpu.config.settings import OnlineSettings, write_settings
from fosvos_tpu.data.davis import DAVIS2016, VAL_SEQUENCES
from fosvos_tpu.evaluation import experiment
from fosvos_tpu.runtime.logging import get_logger
from fosvos_tpu.runtime.providers import provider_mapping
from fosvos_tpu.train import online

log = get_logger(__file__)


def adaptation_model(net_provider, settings):
    """Model the adaptation steps run on. With ``--bf16`` the clone computes
    activations in bfloat16 while params, optimizer state, BN running stats
    and the CB-BCE loss stay float32 (``core/ops.py`` casts the logits) —
    the same recipe as offline ``--bf16`` training. The fp32 model is still
    what gets served/saved; only the step compute dtype changes."""
    if getattr(settings, 'bf16', False):
        import jax.numpy as jnp
        return net_provider.model.clone(dtype=jnp.bfloat16)
    return net_provider.model


def train_and_test(net_provider, tuner: Optional[online.OnlineFinetuner],
                   seq_name: str, settings: OnlineSettings, db_root_dir,
                   save_dir_models, save_dir_results,
                   engine: Optional[experiment.InferenceEngine] = None
                   ) -> None:
    write_settings(save_dir_models, net_provider.name, settings,
                   variant_offline=settings.variant_offline,
                   variant_online=settings.variant_online)

    if settings.is_training:
        net_provider.load_network_train()
        if settings.is_visualizing_network:
            from fosvos_tpu.runtime.visualize import visualize_network
            visualize_network(net_provider.model, net_provider.variables,
                              out_dir=str(save_dir_models),
                              name=net_provider.name)
            settings.is_visualizing_network = False  # once per sweep
        db = DAVIS2016(mode='train', db_root_dir=str(db_root_dir),
                       seq_name=seq_name)
        img, gt = db.make_img_gt_pair(0)
        if tuner is None:
            tuner = online.OnlineFinetuner(
                adaptation_model(net_provider, settings),
                net_provider.get_preset(), settings.avg_grad_every_n)
        res = tuner.finetune(net_provider.variables, img, gt,
                             n_epochs=settings.n_epochs)
        log.info('Train %s: total time %s sec', seq_name, res.wall_time_s)
        log.info('Train %s: %d steps, final loss %f', seq_name, res.n_steps,
                 res.losses[-1])
        # per-step losses to TensorBoard, reference tag names
        # (train_online.py:90,98,104); written post-hoc since the loop is
        # fully on-device
        from fosvos_tpu.runtime.tb import get_summary_writer
        writer = get_summary_writer(
            Path('tensorboard') / net_provider.name / (seq_name or 'all'))
        for step, loss in enumerate(res.losses):
            if step % settings.avg_grad_every_n == 0:
                writer.add_scalar('data/total_loss_iter', float(loss), step)
        chunk = max(settings.n_epochs // 20, 1)
        for e in range(0, res.n_steps, chunk):
            writer.add_scalar('data/total_loss_epoch',
                              float(res.losses[e:e + chunk].mean()), e)
        writer.close()
        net_provider.variables = {'params': res.state.params,
                                  'batch_stats': res.state.batch_stats}
        net_provider.save_model(settings.n_epochs - 1, sequence=seq_name)

    if settings.is_testing:
        if not settings.is_training:
            net_provider.load_network_test(sequence=seq_name)
        db = DAVIS2016(mode='test', db_root_dir=str(db_root_dir),
                       seq_name=seq_name)
        if settings.variant_offline is None:
            save_dir = Path(save_dir_results) / net_provider.name / 'online'
        else:
            save_dir = (Path(save_dir_results) / net_provider.name
                        / str(settings.variant_offline)
                        / str(settings.variant_online))
        if (engine is not None and engine.int8 and tuner is not None
                and getattr(tuner, 'qat_act_scale', None) is not None):
            # serve with the exact scales the QAT adaptation trained through
            from fosvos_tpu.compress import qat
            engine.set_qparams(
                net_provider.variables,
                qat.finalize(net_provider.variables, tuner.qat_act_scale))
        out = experiment.test(net_provider.model, net_provider.variables, db,
                              str(save_dir), seq_name=seq_name,
                              eval_speeds=settings.eval_speeds,
                              batch_size=settings.batch_size_test,
                              engine=engine,
                              is_visualizing_results=(
                                  settings.is_visualizing_results))
        log.info('Test %s: %d images in %.2fs', seq_name, out['n_images'],
                 out['total_time_s'])


def run_fanout(net_provider, sequences: List[str], settings: OnlineSettings,
               db_root_dir, save_dir_models, save_dir_results,
               window_batch: bool = True, qat_int8: bool = False,
               int8: bool = False, bf16: bool = False,
               fold_bn: bool = False) -> None:
    """All sequences at once on the mesh (fosvos_tpu.parallel.fanout)."""
    import jax
    from fosvos_tpu.parallel import fanout, make_mesh

    net_provider.load_network_train()
    # raw uint8 transfer format; normalization runs on device in the fanout
    imgs, gts = [], []
    mean = None
    for seq in sequences:
        db = DAVIS2016(mode='train', db_root_dir=str(db_root_dir),
                       seq_name=seq)
        img, gt = db.make_raw_pair(0)
        imgs.append(img)
        gts.append(gt)
        mean = db.meanval

    amodel = adaptation_model(net_provider, settings)
    apply_fn = None
    qat_scales = None
    if qat_int8:
        from fosvos_tpu.compress import qat
        from fosvos_tpu.evaluation.experiment import device_preprocess
        # one calibration for the whole fan-out (first sequence's frame;
        # margin leaves headroom) — every sequence adapts through the same
        # fake-quant forward, mirroring the sequential sweep
        qat_scales = qat.calibrate_scales(
            net_provider.model, net_provider.variables, [imgs[0][None]],
            preprocess=lambda x: device_preprocess(x, mean), margin=1.25)
        apply_fn = qat.make_apply(amodel, qat_scales)
        log.info('QAT fanout: calibrated %d conv input scales',
                 len(qat_scales))

    mesh = make_mesh(('seq',))
    fo = fanout.SequenceFanout(amodel,
                               mesh, net_provider.get_preset(),
                               settings.avg_grad_every_n, mean=mean,
                               window_batch=window_batch,
                               apply_fn=apply_fn)
    res = fo.finetune_all(net_provider.variables, np.stack(imgs),
                          np.stack(gts), n_epochs=settings.n_epochs)
    log.info('Fanout: adapted %d sequences in %.2fs on %d devices',
             len(sequences), res.wall_time_s, mesh.size)

    engine = experiment.InferenceEngine(net_provider.model,
                                        settings.batch_size_test,
                                        bf16=bf16,
                                        int8=int8 or qat_int8,
                                        fold_bn=fold_bn)  # fanout
    for k, seq in enumerate(sequences):
        net_provider.variables = jax.tree.map(
            lambda a: a[k], {'params': res.params,
                             'batch_stats': res.batch_stats})
        net_provider.save_model(settings.n_epochs - 1, sequence=seq)
        if settings.is_testing:
            if qat_int8:
                from fosvos_tpu.compress import qat
                engine.set_qparams(
                    net_provider.variables,
                    qat.finalize(net_provider.variables, qat_scales))
            db = DAVIS2016(mode='test', db_root_dir=str(db_root_dir),
                           seq_name=seq)
            save_dir = (Path(save_dir_results) / net_provider.name
                        / str(settings.variant_offline)
                        / str(settings.variant_online))
            experiment.test(net_provider.model, net_provider.variables, db,
                            str(save_dir), seq_name=seq,
                            batch_size=settings.batch_size_test,
                            engine=engine)


def select_regime(n_sequences: int, n_devices: int, fanout_requested: bool,
                  is_training: bool) -> str:
    """Pick 'fanout' or 'sequential' for the sweep.

    Fan-out is the right regime only when the mesh can actually hold the
    sequences: with more sequences than devices each device time-slices
    several adapted models, measured 2.2x slower per sequence than the
    sequential sweep on one chip (HBM churn, BENCHMARKS.md). And fan-out
    parallelizes the *adaptation* — with --no-training there is nothing to
    fan out, so the sequential test sweep runs.
    """
    if not fanout_requested or n_sequences <= 1:
        return 'sequential'
    if not is_training:
        log.info('--fanout ignored with --no-training (fan-out parallelizes '
                 'the adaptation itself); running the sequential test sweep.')
        return 'sequential'
    if n_sequences > n_devices:
        log.info('fanout regime: %d sequences > %d devices -> sequential '
                 'sweep (fan-out measured 2.2x slower per sequence when '
                 'devices time-slice sequences, BENCHMARKS.md)',
                 n_sequences, n_devices)
        return 'sequential'
    log.info('fanout regime: %d sequences over %d devices', n_sequences,
             n_devices)
    return 'fanout'


def main(argv=None):
    args = parse_args(is_online=True, argv=argv)
    db_root_dir = args.db_root_dir or Paths.db_root_dir()

    save_dir_models = Path('models')
    save_dir_models.mkdir(parents=True, exist_ok=True)
    save_dir_results = Path('results')
    save_dir_results.mkdir(parents=True, exist_ok=True)

    # reference defaults, train_online.py:147-152
    n_epochs = args.n_epochs or 10000
    settings = OnlineSettings(
        is_training=args.is_training, is_testing=args.is_testing,
        start_epoch=args.start_epoch or 0, n_epochs=n_epochs,
        avg_grad_every_n=5,
        snapshot_every_n=n_epochs, is_testing_while_training=False,
        test_every_n=5, batch_size_train=1, batch_size_test=1,
        is_visualizing_network=getattr(args, 'visualize_network', False),
        is_visualizing_results=getattr(args, 'visualize_results', False),
        offline_epoch=(args.offline_epoch if args.offline_epoch is not None
                       else 239),
        variant_offline=args.variant_offline,
        variant_online=args.variant_online, eval_speeds=args.eval_speeds)
    settings.bf16 = getattr(args, 'bf16', False)

    provider_class = provider_mapping[('online', args.network)]
    version = (int(args.network.removeprefix('resnet'))
               if args.network.startswith('resnet') else 18)
    net_provider = provider_class(args.network, save_dir_models, settings,
                                  variant_offline=args.variant_offline,
                                  variant_online=args.variant_online,
                                  version=version)

    if args.sequence_name is not None:
        sequences = [args.sequence_name]
    elif args.sequence_group is not None:
        # manual process-sharding kept for parity (train_online.py:183-186)
        sequences = [s for i, s in enumerate(VAL_SEQUENCES)
                     if i % args.sequence_group_size == args.sequence_group]
    else:
        sequences = list(VAL_SEQUENCES)

    if getattr(args, 'skip_done', False):
        from fosvos_tpu.runtime import checkpoint as ckpt_mod
        remaining = []
        for seq in sequences:
            stem = ckpt_mod.checkpoint_stem(
                args.network, settings.n_epochs - 1, args.variant_offline,
                args.variant_online, seq)
            if ckpt_mod.exists(str(save_dir_models), stem):
                log.info('skip-done: %s already adapted', seq)
            else:
                remaining.append(seq)
        sequences = remaining

    import jax
    qat_int8 = getattr(args, 'qat_int8', False)
    if qat_int8 and not getattr(args, 'int8', False):
        log.info('--qat-int8 implies --int8 for the test phase')
        args.int8 = True
    if select_regime(len(sequences), len(jax.devices()),
                     getattr(args, 'fanout', False),
                     settings.is_training) == 'fanout':
        run_fanout(net_provider, sequences, settings, db_root_dir,
                   save_dir_models, save_dir_results,
                   window_batch=not getattr(args, 'sequential_windows',
                                            False),
                   qat_int8=qat_int8,
                   int8=getattr(args, 'int8', False),
                   bf16=getattr(args, 'bf16', False),
                   fold_bn=getattr(args, 'fold_bn', False))
        return

    # one finetuner + one inference engine reused across sequences: the
    # compiled train scans and the 480p forward are built once per sweep
    tuner = None
    engine = None
    for seq in sequences:
        if tuner is None and settings.is_training:
            net_provider.load_network_train()
            amodel = adaptation_model(net_provider, settings)
            apply_fn = None
            qat_scales = None
            if qat_int8:
                from fosvos_tpu.compress import qat
                db0 = DAVIS2016(mode='train', db_root_dir=str(db_root_dir),
                                seq_name=seq)
                img0, _ = db0.make_img_gt_pair(0)
                # one calibration for the whole sweep (per-sequence scales
                # would recompile the adaptation scan each sequence); the
                # margin leaves headroom for later sequences' activations
                qat_scales = qat.calibrate_scales(
                    net_provider.model, net_provider.variables, [img0[None]],
                    margin=1.25)
                apply_fn = qat.make_apply(amodel, qat_scales)
                log.info('QAT: calibrated %d conv input scales on %s',
                         len(qat_scales), seq)
            tuner = online.OnlineFinetuner(
                amodel,
                net_provider.get_preset(), settings.avg_grad_every_n,
                window_batch=not getattr(args, 'sequential_windows', False),
                apply_fn=apply_fn)
            tuner.qat_act_scale = qat_scales
        if engine is None:
            if net_provider.model is None:
                net_provider.load_network_train()
            engine = experiment.InferenceEngine(
                net_provider.model, settings.batch_size_test,
                bf16=getattr(args, 'bf16', False),
                int8=getattr(args, 'int8', False),
                fold_bn=getattr(args, 'fold_bn', False))
        train_and_test(net_provider, tuner, seq, settings, db_root_dir,
                       save_dir_models, save_dir_results, engine=engine)


if __name__ == '__main__':
    main()
