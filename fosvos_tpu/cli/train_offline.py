"""Offline (parent) training CLI — reference ``src/train_offline.py``.

Usage: python -m fosvos_tpu.cli.train_offline --network resnet18
       [--variant-offline 11] [--no-training] [--no-testing] [--eval-speeds]
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from fosvos_tpu.cli.args import parse_args
from fosvos_tpu.config.paths import Paths
from fosvos_tpu.config.settings import OfflineSettings, write_settings
from fosvos_tpu.data.davis import DAVIS2016
from fosvos_tpu.evaluation import experiment
from fosvos_tpu.runtime.logging import get_logger
from fosvos_tpu.runtime.providers import provider_mapping
from fosvos_tpu.runtime.tb import NullWriter, get_summary_writer
from fosvos_tpu.train import offline

log = get_logger(__file__)


def train_and_test(net_provider, settings: OfflineSettings, db_root_dir,
                   save_dir_models, save_dir_results,
                   use_tensorboard: bool = True) -> None:
    write_settings(save_dir_models, net_provider.name, settings,
                   variant_offline=settings.variant_offline)

    if settings.is_training:
        net_provider.load_network_train()
        if settings.is_visualizing_network:
            from fosvos_tpu.runtime.visualize import visualize_network
            visualize_network(net_provider.model, net_provider.variables,
                              out_dir=str(save_dir_models),
                              name=net_provider.name)
        train_model = net_provider.model
        if getattr(settings, 'bf16', False):
            # bf16 activations, fp32 params/BN-stats/losses — measured 1.54x
            # per-step on-chip at b16 480p (BENCHMARKS.md)
            import jax.numpy as jnp
            train_model = train_model.clone(dtype=jnp.bfloat16)
            log.info('Training compute dtype: bfloat16 (params stay fp32)')
        db_train = DAVIS2016(mode='train', db_root_dir=str(db_root_dir))
        writer = (get_summary_writer(Path(save_dir_models) / 'tb-offline')
                  if use_tensorboard else NullWriter())

        def log_epoch(stats: offline.EpochStats):
            # reference scalar names, train_offline.py:93
            writer.add_scalar('data/total_loss_epoch',
                              float(stats.mean_losses[-1]), stats.epoch)
            log.info('[Epoch: %d] fuse loss %f (%.1fs)', stats.epoch,
                     stats.mean_losses[-1], stats.wall_time_s)

        def snapshot(epoch, state):
            net_provider.variables = {'params': state.params,
                                      'batch_stats': state.batch_stats}
            net_provider.save_model(epoch)

        test_db = (DAVIS2016(mode='test', db_root_dir=str(db_root_dir))
                   if settings.is_testing_while_training else None)

        def log_test(stats: offline.EpochStats):
            # reference scalar name, train_offline.py:133
            writer.add_scalar('data/test_loss_epoch',
                              float(stats.mean_losses[-1]), stats.epoch)
            log.info('***Testing*** [Epoch: %d] fuse loss %f', stats.epoch,
                     stats.mean_losses[-1])

        try:
            state = _run_training(net_provider, train_model, db_train,
                                  settings, log_epoch, snapshot, test_db,
                                  log_test)
        finally:
            writer.close()  # flush partial-run scalars on mid-run crash
        net_provider.variables = {'params': state.params,
                                  'batch_stats': state.batch_stats}
        net_provider.save_model(settings.n_epochs - 1)

    if settings.is_testing:
        if not settings.is_training:
            net_provider.load_network_test()
        db_test = DAVIS2016(mode='test', db_root_dir=str(db_root_dir))
        if settings.variant_offline is None:
            save_dir = Path(save_dir_results) / net_provider.name / 'offline'
        else:
            save_dir = (Path(save_dir_results) / net_provider.name
                        / str(settings.variant_offline) / 'offline')
        out = experiment.test(net_provider.model, net_provider.variables,
                              db_test, str(save_dir),
                              eval_speeds=settings.eval_speeds,
                              batch_size=settings.batch_size_test,
                              is_visualizing_results=(
                                  settings.is_visualizing_results),
                              bf16=getattr(settings, 'bf16', False),
                              int8=getattr(settings, 'int8', False),
                              fold_bn=getattr(settings, 'fold_bn', False))
        log.info('Test finished: %d images in %.2fs',
                 out['n_images'], out['total_time_s'])


def _run_training(net_provider, train_model, db_train, settings, log_epoch,
                  snapshot, test_db, log_test):
    if getattr(settings, 'device_resident', False):
        from fosvos_tpu.train import resident
        mesh = None
        batch = settings.batch_size_train
        shard_spatial = False
        if getattr(settings, 'data_parallel', False):
            import jax as _jax
            from fosvos_tpu.runtime import distributed
            n_dev = len(_jax.devices())
            # 2D mesh when it fits: frame H over 'spatial' halves each
            # device's resident-dataset footprint and partitions convs
            if n_dev >= 4 and n_dev % 2 == 0:
                mesh = distributed.global_mesh(
                    ('data', 'spatial'), shape=(n_dev // 2, 2))
                shard_spatial = True
            else:
                mesh = distributed.global_mesh(('data',))
            batch = settings.batch_size_train * mesh.shape['data']
            log.info('device-resident data-parallel: global batch %d, '
                     'mesh %s', batch, dict(mesh.shape))
        state = resident.train_offline_resident(
            train_model, net_provider.variables, db_train,
            preset=net_provider.get_preset(),
            n_epochs=settings.n_epochs,
            start_epoch=settings.start_epoch,
            batch_size=batch,
            avg_grad_every_n=settings.avg_grad_every_n,
            snapshot_every_n=settings.snapshot_every_n,
            snapshot_fn=snapshot,
            log_fn=log_epoch, mesh=mesh,
            shard_spatial=shard_spatial,
            test_dataset=test_db,
            test_every_n=settings.test_every_n,
            test_log_fn=log_test)
    elif getattr(settings, 'data_parallel', False):
        state = _train_data_parallel(net_provider, db_train, settings,
                                     log_epoch, snapshot,
                                     test_db=test_db, log_test=log_test,
                                     model=train_model)
    else:
        state = offline.train_offline(
            train_model, net_provider.variables, db_train,
            preset=net_provider.get_preset(),
            n_epochs=settings.n_epochs,
            start_epoch=settings.start_epoch,
            batch_size=settings.batch_size_train,
            avg_grad_every_n=settings.avg_grad_every_n,
            snapshot_every_n=settings.snapshot_every_n,
            snapshot_fn=snapshot,
            log_fn=log_epoch,
            test_dataset=test_db,
            test_every_n=settings.test_every_n,
            test_log_fn=log_test)
    return state


def _train_data_parallel(net_provider, db_train, settings, log_epoch,
                         snapshot, test_db=None, log_test=None, model=None):
    """Mesh data-parallel offline training over all devices
    (fosvos_tpu.parallel.data_parallel); the effective batch is
    batch_size_train * n_devices, sharded over the 'data' axis.

    Feature parity with the single-device path: uint8 raw batches decoded on
    the native C++ prefetch threads, device-side normalization (sharded),
    and the test-while-training loss pass."""
    import time
    import numpy as np
    from fosvos_tpu.parallel import data_parallel
    from fosvos_tpu.runtime import distributed

    mesh = distributed.global_mesh(('data',))
    trainer = data_parallel.ShardedOfflineTrainer(
        model if model is not None else net_provider.model, mesh,
        net_provider.get_preset(),
        settings.avg_grad_every_n, device_preprocess=True,
        meanval=db_train.meanval)
    state = trainer.init_state(net_provider.variables)
    rng = np.random.RandomState(0)
    global_batch = settings.batch_size_train * mesh.size

    # double-buffer H2D with sharded placement: batch k+1 lands on the mesh
    # while step k runs (train/offline.prefetch_to_device)
    import jax

    def put_sharded(batch):
        return {k: jax.device_put(v, trainer.batch_sharding)
                for k, v in batch.items()}

    for epoch in range(settings.start_epoch, settings.n_epochs):
        t0 = time.perf_counter()
        epoch_losses = []
        for batch in offline.prefetch_to_device(
                offline.iterate_raw_batches(db_train, global_batch, rng),
                put_fn=put_sharded):
            state, losses = trainer.train_step(state, batch['image'],
                                               batch['gt'],
                                               epoch / settings.n_epochs)
            epoch_losses.append(losses)
        log_epoch(offline.EpochStats(
            epoch=epoch, mean_losses=offline.mean_epoch_losses(epoch_losses),
            wall_time_s=time.perf_counter() - t0))
        if epoch % settings.snapshot_every_n == settings.snapshot_every_n - 1 \
                and epoch != 0:
            snapshot(epoch, state)

        # test-while-training loss pass (reference train_offline.py:115-136),
        # sharded: mesh.size frames per eval step (the last chunk pads by
        # repeating its final frame — a monitoring signal, not a metric)
        if test_db is not None and \
                epoch % settings.test_every_n == settings.test_every_n - 1:
            tlosses = []
            for c0 in range(0, len(test_db), mesh.size):
                pairs = [test_db.make_raw_pair(i)
                         for i in range(c0, min(c0 + mesh.size,
                                                len(test_db)))]
                imgs = np.stack([p[0] for p in pairs])
                gts = np.stack([p[1] for p in pairs])[..., None]
                pad = mesh.size - len(pairs)
                if pad:
                    imgs = np.concatenate([imgs, imgs[-1:].repeat(pad, 0)])
                    gts = np.concatenate([gts, gts[-1:].repeat(pad, 0)])
                tlosses.append(trainer.eval_step(state, imgs, gts))
            if log_test is not None:
                log_test(offline.EpochStats(
                    epoch=epoch,
                    mean_losses=offline.mean_epoch_losses(tlosses),
                    wall_time_s=0.0))
    return state


def main(argv=None):
    args = parse_args(is_online=False, argv=argv)
    db_root_dir = args.db_root_dir or Paths.db_root_dir()

    # join the DCN process group when launched as part of a pod slice
    # (no-op single-process; see runtime.distributed)
    from fosvos_tpu.runtime import distributed
    distributed.initialize()

    save_dir_models = Path('models')
    save_dir_models.mkdir(parents=True, exist_ok=True)
    save_dir_results = Path('results')
    save_dir_results.mkdir(parents=True, exist_ok=True)

    # reference defaults, train_offline.py:153-157
    settings = OfflineSettings(
        is_training=args.is_training, is_testing=args.is_testing,
        start_epoch=args.start_epoch or 0,
        n_epochs=args.n_epochs or 240,
        avg_grad_every_n=10, snapshot_every_n=40,
        is_testing_while_training=getattr(args, 'test_while_training', False),
        test_every_n=5,
        batch_size_train=args.batch_size or 1,
        batch_size_test=1,
        is_visualizing_network=getattr(args, 'visualize_network', False),
        is_visualizing_results=getattr(args, 'visualize_results', False),
        is_loading_vgg_caffe=bool(args.pretrained_caffe),
        variant_offline=args.variant_offline, eval_speeds=args.eval_speeds)
    settings.data_parallel = args.data_parallel
    settings.device_resident = args.device_resident
    settings.bf16 = args.bf16
    settings.int8 = getattr(args, 'int8', False)
    settings.fold_bn = getattr(args, 'fold_bn', False)

    provider_class = provider_mapping[('offline', args.network)]
    version = (int(args.network.removeprefix('resnet'))
               if args.network.startswith('resnet') else 18)
    net_provider = provider_class(args.network, save_dir_models, settings,
                                  variant_offline=args.variant_offline,
                                  version=version,
                                  pretrained_path=args.pretrained_path,
                                  caffe_path=args.pretrained_caffe)
    train_and_test(net_provider, settings, db_root_dir, save_dir_models,
                   save_dir_results)


if __name__ == '__main__':
    main()
