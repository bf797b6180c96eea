"""Multi-device tests on the virtual 8-CPU mesh (conftest forces
--xla_force_host_platform_device_count=8)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.parallel import data_parallel, fanout, make_mesh
from fosvos_tpu.train import offline, optimizers


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')), size=(32, 48))


@pytest.fixture(scope='module')
def tiny():
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_mesh_construction():
    m = make_mesh(('data',))
    assert m.shape['data'] == 8
    m2 = make_mesh(('data', 'spatial'), shape=(4, 2))
    assert m2.shape == {'data': 4, 'spatial': 2}
    m3 = make_mesh(('seq',), shape=(-1,))
    assert m3.shape['seq'] == 8
    # explicit sub-mesh: first prod(shape) devices
    m4 = make_mesh(('seq',), shape=(2,))
    assert m4.shape['seq'] == 2
    # -1 inference must never silently drop devices (8 % 3 != 0)
    with pytest.raises(ValueError, match='not divisible'):
        make_mesh(('data', 'spatial'), shape=(-1, 3))


def test_dp_train_step_matches_single_device(db, tiny):
    """Sharded-batch gradients must equal single-device gradients."""
    model, variables = tiny
    imgs = np.random.RandomState(0).randn(8, 32, 48, 3).astype(np.float32)
    gts = (np.random.RandomState(1).rand(8, 32, 48, 1) > 0.7).astype(np.float32)

    preset = optimizers.offline_variant(11)

    single = offline.OfflineTrainer(model, preset, avg_grad_every_n=1)
    s_state = single.init_state(variables)
    s_state, s_losses = single.train_step(s_state, imgs, gts, 0.0)

    m = make_mesh(('data',))
    dp = data_parallel.ShardedOfflineTrainer(model, m, preset,
                                             avg_grad_every_n=1)
    d_state = dp.init_state(variables)
    d_state, d_losses = dp.train_step(d_state, imgs, gts, 0.0)

    np.testing.assert_allclose(np.asarray(d_losses), np.asarray(s_losses),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(d_state.params['layer_fuse']['kernel']),
        np.asarray(s_state.params['layer_fuse']['kernel']),
        rtol=1e-4, atol=1e-6)


def test_dp_spatial_sharding_matches_single_device(tiny):
    """2D mesh: batch over 'data', H over 'spatial' (GSPMD halo exchange).
    Gradient parity, not just finiteness: this is the regression test for
    the jax-0.9 Shardy partitioner bug that over-reduced gradients of
    partially-replicated tensors by the replication factor
    (tools/repro_shardy_grad_bug.py; mesh.pin_correct_partitioner)."""
    model, variables = tiny
    imgs = np.random.RandomState(0).randn(4, 32, 48, 3).astype(np.float32)
    gts = (np.random.RandomState(1).rand(4, 32, 48, 1) > 0.7).astype(np.float32)
    preset = optimizers.offline_variant(11)

    single = offline.OfflineTrainer(model, preset, avg_grad_every_n=1)
    s_state = single.init_state(variables)
    s_state, s_losses = single.train_step(s_state, imgs, gts, 0.0)

    m = make_mesh(('data', 'spatial'), shape=(4, 2))
    dp = data_parallel.ShardedOfflineTrainer(model, m,
                                             optimizers.offline_variant(11),
                                             avg_grad_every_n=1,
                                             shard_spatial=True)
    state = dp.init_state(variables)
    state, losses = dp.train_step(state, imgs, gts, 0.0)
    assert np.isfinite(np.asarray(losses)).all()
    np.testing.assert_allclose(
        np.asarray(state.params['layer_fuse']['kernel']),
        np.asarray(s_state.params['layer_fuse']['kernel']),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.params['base_conv']['kernel']),
        np.asarray(s_state.params['base_conv']['kernel']),
        rtol=1e-4, atol=1e-6)


def test_sequence_fanout_adapts_each_sequence(db, tiny):
    """8 sequences, one per virtual device; each adapted copy must fit its
    own frame better than the shared init does."""
    model, variables = tiny
    ds_train = davis.DAVIS2016(mode='train', db_root_dir=db)
    # synthesize 8 'sequences' from the 8 train frames
    imgs, gts = [], []
    for i in range(8):
        im, g = ds_train.make_img_gt_pair(i)
        imgs.append(im)
        gts.append(g)
    imgs, gts = np.stack(imgs), np.stack(gts)

    m = make_mesh(('seq',))
    fo = fanout.SequenceFanout(model, m, optimizers.online_variant(10),
                               avg_grad_every_n=5)
    res = fo.finetune_all(variables, imgs, gts, n_epochs=300, augment=False,
                          seed=0)

    assert res.losses.shape == (300, 8)
    assert np.isfinite(res.losses).all()
    # each sequence's loss decreased a lot
    assert (res.losses[-1] < res.losses[0] * 0.1).all()

    # per-sequence params actually diverged
    k0 = np.asarray(res.params['layer_fuse']['kernel'][0])
    k1 = np.asarray(res.params['layer_fuse']['kernel'][1])
    assert not np.allclose(k0, k1)

    # adapted model segments its own frame
    one_vars = jax.tree.map(lambda a: a[0], {'params': res.params,
                                             'batch_stats': res.batch_stats})
    outs = model.apply(one_vars, jnp.asarray(imgs[:1]), train=False)
    pred = np.asarray(outs[-1][0, ..., 0]) > 0
    g = gts[0] >= 0.5
    iou = np.logical_and(pred, g).sum() / max(np.logical_or(pred, g).sum(), 1)
    assert iou > 0.8


def test_fanout_pads_sequences_to_mesh(db, tiny):
    model, variables = tiny
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    imgs, gts = [], []
    for i in range(3):  # 3 sequences on an 8-way mesh -> padded to 8
        im, g = ds.make_img_gt_pair(i)
        imgs.append(im)
        gts.append(g)
    m = make_mesh(('seq',))
    fo = fanout.SequenceFanout(model, m, optimizers.online_variant(11))
    res = fo.finetune_all(variables, np.stack(imgs), np.stack(gts),
                          n_epochs=10, augment=False)
    assert res.losses.shape == (10, 3)
    assert res.params['layer_fuse']['kernel'].shape[0] == 3


def test_fanout_cli_path(db, tiny, tmp_path, monkeypatch):
    """The --fanout branch of the train_online CLI on the virtual mesh."""
    monkeypatch.chdir(tmp_path)
    from pathlib import Path
    from fosvos_tpu.cli import train_online as cli_mod
    from fosvos_tpu.runtime import checkpoint
    from fosvos_tpu.runtime.providers import ResNetOnlineProvider

    model, variables = tiny

    orig = cli_mod.OnlineSettings

    def small(**kw):
        kw.update(n_epochs=8, snapshot_every_n=8)
        return orig(**kw)

    monkeypatch.setattr(cli_mod, 'OnlineSettings', small)
    monkeypatch.setattr(cli_mod, 'VAL_SEQUENCES',
                        ['synth-swan', 'synth-goat'])

    seed = ResNetOnlineProvider('resnet18', 'models',
                                small(variant_offline=11, variant_online=11),
                                variant_offline=11, variant_online=11)
    seed.model = model
    seed.variables = jax.tree.map(jnp.asarray, variables)
    Path('models').mkdir(exist_ok=True)
    seed.save_model(239)  # offline_epoch default (= final offline snapshot)

    cli_mod.main(['--network', 'resnet18', '--variant-offline', '11',
                  '--variant-online', '11', '--fanout',
                  '--db-root-dir', db])

    for seq in ('synth-swan', 'synth-goat'):
        assert checkpoint.exists('models',
                                 f'resnet18_11_11_{seq}_epoch-7')
        masks = list(Path(f'results/resnet18/11/11/{seq}/{seq}')
                     .glob('*.png')) or \
            list(Path(f'results/resnet18/11/11/{seq}').glob('*.png'))
        assert len(masks) == 4


def test_fanout_uint8_ingest_matches_float(db, tiny):
    """Raw uint8 ingest (device-side normalize) must reproduce the float
    path exactly at full resolution: uint8->f32 is exact and the synthetic
    masks are binary, so both ingests see bit-identical training inputs."""
    model, variables = tiny
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    imgs_f, gts_f, imgs_u, gts_u = [], [], [], []
    for i in range(2):
        im, g = ds.make_img_gt_pair(i)
        imgs_f.append(im)
        gts_f.append(g)
        im_u, g_u = ds.make_raw_pair(i)
        imgs_u.append(im_u)
        gts_u.append(g_u)

    m = make_mesh(('seq',))
    fo = fanout.SequenceFanout(model, m, optimizers.online_variant(11))
    res_f = fo.finetune_all(variables, np.stack(imgs_f), np.stack(gts_f),
                            n_epochs=5, augment=False, seed=0)
    res_u = fo.finetune_all(variables, np.stack(imgs_u), np.stack(gts_u),
                            n_epochs=5, augment=False, seed=0)
    np.testing.assert_array_equal(res_u.losses, res_f.losses)
    np.testing.assert_array_equal(
        np.asarray(res_u.params['layer_fuse']['kernel']),
        np.asarray(res_f.params['layer_fuse']['kernel']))


def test_dp_device_preprocess_matches_host(db, tiny):
    """Sharded uint8 ingest (device normalize) must equal the float path
    bit-for-bit: uint8->f32 is exact and the fixture masks are binary."""
    model, variables = tiny
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    pf = [ds.make_img_gt_pair(i) for i in range(8)]
    pu = [ds.make_raw_pair(i) for i in range(8)]
    imgs_f = np.stack([p[0] for p in pf])
    gts_f = np.stack([p[1] for p in pf])[..., None]
    imgs_u = np.stack([p[0] for p in pu])
    gts_u = np.stack([p[1] for p in pu])[..., None]

    m = make_mesh(('data',))
    preset = optimizers.offline_variant(11)
    t_f = data_parallel.ShardedOfflineTrainer(model, m, preset,
                                              avg_grad_every_n=1)
    t_u = data_parallel.ShardedOfflineTrainer(model, m, preset,
                                              avg_grad_every_n=1,
                                              device_preprocess=True,
                                              meanval=ds.meanval)
    s_f, l_f = t_f.train_step(t_f.init_state(variables), imgs_f, gts_f, 0.0)
    s_u, l_u = t_u.train_step(t_u.init_state(variables), imgs_u, gts_u, 0.0)
    np.testing.assert_array_equal(np.asarray(l_u), np.asarray(l_f))
    np.testing.assert_array_equal(
        np.asarray(s_u.params['layer_fuse']['kernel']),
        np.asarray(s_f.params['layer_fuse']['kernel']))
    # eval step parity too (test-while-training path)
    e_f = t_f.eval_step(s_f, imgs_f, gts_f)
    e_u = t_u.eval_step(s_u, imgs_u, gts_u)
    np.testing.assert_array_equal(np.asarray(e_u), np.asarray(e_f))


def test_dp_cli_with_test_while_training(db, tiny, tmp_path, monkeypatch):
    """--data-parallel CLI path: raw prefetch batches, sharded eval pass,
    snapshots — feature parity with the single-device loop."""
    monkeypatch.chdir(tmp_path)
    import jax.numpy as jnp
    from fosvos_tpu.cli import train_offline as cli_mod
    from fosvos_tpu.models import resnet_arch as arch_fn
    from fosvos_tpu.runtime import checkpoint, providers

    orig = cli_mod.OfflineSettings

    def small(**kw):
        kw.update(n_epochs=2, snapshot_every_n=2, batch_size_train=1,
                  is_testing_while_training=True, test_every_n=1)
        return orig(**kw)

    monkeypatch.setattr(cli_mod, 'OfflineSettings', small)

    def tiny_init(self, arch=None):
        from fosvos_tpu.models import OSVOSResNet
        self.model = OSVOSResNet(arch=arch or arch_fn(
            18, scale_down_exponent=4))
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3), jnp.float32),
            train=False)
        self.variables = dict(variables)
        return self.model

    monkeypatch.setattr(providers.NetworkProvider, 'init_network', tiny_init)

    test_losses = []
    orig_fn = cli_mod._train_data_parallel

    def spy(net_provider, db_train, settings, log_epoch, snapshot,
            test_db=None, log_test=None, model=None):
        def spy_log(stats):
            test_losses.append(stats.mean_losses)
            if log_test:
                log_test(stats)
        return orig_fn(net_provider, db_train, settings, log_epoch,
                       snapshot, test_db=test_db, log_test=spy_log,
                       model=model)

    monkeypatch.setattr(cli_mod, '_train_data_parallel', spy)

    cli_mod.main(['--network', 'resnet18', '--variant-offline', '11',
                  '--data-parallel', '--no-testing', '--db-root-dir', db])

    assert checkpoint.exists('models', 'resnet18_11_epoch-1')
    assert len(test_losses) == 2          # test pass ran every epoch
    assert np.isfinite(np.stack(test_losses)).all()


def test_spatial_sharded_inference_matches_single_device(db, tiny):
    """Mesh-sharded InferenceEngine (batch over 'data', height over
    'spatial' with GSPMD halo exchange) must produce the single-device
    masks exactly."""
    from fosvos_tpu.evaluation import experiment

    model, variables = tiny
    ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    images, _, _ = ds.load_sequence(ds.sequence_names[0], raw=True)

    single = experiment.InferenceEngine(model, batch_size=4,
                                        mean=ds.meanval)
    ref = single.masks_for_sequence(variables, images)

    mesh = make_mesh(('data', 'spatial'), shape=(4, 2))
    sharded = experiment.InferenceEngine(model, batch_size=4,
                                         mean=ds.meanval, mesh=mesh)
    out = sharded.masks_for_sequence(variables, images)
    np.testing.assert_array_equal(out, ref)

    # spatial-only mesh: the per-frame latency configuration
    mesh_s = make_mesh(('spatial',))
    lat = experiment.InferenceEngine(model, batch_size=1,
                                     mean=ds.meanval, mesh=mesh_s)
    out_lat = lat.masks_for_sequence(variables, images)
    np.testing.assert_array_equal(out_lat, ref)

    with pytest.raises(ValueError):
        experiment.InferenceEngine(model, batch_size=3, mean=ds.meanval,
                                   mesh=mesh)  # 3 % 4 != 0


def test_spatial_sharded_int8_inference_matches_single_device(db, tiny):
    """int8 engine on a mesh: replicated quantized state + sharded frames
    must reproduce the single-device int8 masks exactly (int32 conv
    accumulation is order-independent; the spatial split is a halo
    exchange, not a reduction)."""
    from fosvos_tpu.evaluation import experiment

    model, variables = tiny
    ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    images, _, _ = ds.load_sequence(ds.sequence_names[0], raw=True)

    single = experiment.InferenceEngine(model, batch_size=4,
                                        mean=ds.meanval, int8=True)
    single.calibrate(variables, images)
    ref = single.masks_for_sequence(variables, images)

    mesh = make_mesh(('data', 'spatial'), shape=(4, 2))
    sharded = experiment.InferenceEngine(model, batch_size=4,
                                         mean=ds.meanval, mesh=mesh,
                                         int8=True)
    sharded.calibrate(variables, images)   # same calibration data
    out = sharded.masks_for_sequence(variables, images)
    np.testing.assert_array_equal(out, ref)


def test_mesh_sharded_online_finetune_matches_single_device(db, tiny):
    """OnlineFinetuner(mesh=...) — the window pair over 'data', frame height
    over 'spatial' — must reproduce the unsharded adaptation (same PRNG
    stream; only float reduction order differs)."""
    from fosvos_tpu.train import online

    model, variables = tiny
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    img, gt = ds.make_img_gt_pair(0)
    preset = optimizers.online_variant(2)  # SGD: updates linear in the grads

    ref = online.OnlineFinetuner(model, preset, avg_grad_every_n=5)
    mesh = make_mesh(('data', 'spatial'), shape=(2, 4))
    tuner = online.OnlineFinetuner(model, preset, avg_grad_every_n=5,
                                   mesh=mesh)

    # one optimizer window: sharded result matches tightly (the only
    # difference is cross-device reduction order; longer runs amplify that
    # float noise chaotically through training, so exact parity is only
    # assertable per update)
    r0 = ref.finetune(variables, img, gt, n_epochs=5, seed=4, augment=False)
    r1 = tuner.finetune(variables, img, gt, n_epochs=5, seed=4,
                        augment=False)
    np.testing.assert_allclose(r1.losses, r0.losses, rtol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-6),
        r1.state.params, r0.state.params)

    # longer sharded run: converges like the unsharded one
    r20 = tuner.finetune(variables, img, gt, n_epochs=200, seed=4,
                         augment=False)
    assert np.isfinite(r20.losses).all()
    assert r20.losses[-1] < r20.losses[0] * 0.5

    with pytest.raises(ValueError):
        online.OnlineFinetuner(model, preset, avg_grad_every_n=5,
                               mesh=make_mesh(('data',)))  # 8 doesn't divide 2


def test_fleet_server_on_mesh_matches_single_device(db, tiny):
    """FleetServer over a 'seq' mesh (streams sharded across chips,
    communication-free) must produce the single-device fleet masks
    exactly; stream count may exceed the axis size (leading-dim
    round-robin sharding)."""
    from fosvos_tpu.evaluation import fleet

    model, _ = tiny
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(8)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    images, _, _ = ds.load_sequence(ds.sequence_names[0], raw=True)
    frames = np.stack([images[k % len(images)] for k in range(8)])

    single = fleet.FleetServer(model, mean=ds.meanval)
    ref = single.segment(single.put_weights(var_list), frames)

    mesh = make_mesh(('seq',))
    sharded = fleet.FleetServer(model, mesh=mesh, mean=ds.meanval)
    out = sharded.segment(sharded.put_weights(var_list), frames)
    np.testing.assert_array_equal(out, ref)


def test_elastic_fleet_on_mesh_matches_single_device(db, tiny):
    """ElasticFleet over a 'seq' mesh: membership churn + serving must
    reproduce the single-device elastic fleet exactly (capacity a multiple
    of the axis, bucket = the axis-sized fleet program)."""
    from fosvos_tpu.evaluation import elastic

    model, _ = tiny
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(3)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    images, _, _ = ds.load_sequence(ds.sequence_names[0], raw=True)
    frames = np.stack([images[k % len(images)] for k in range(3)])

    single = elastic.ElasticFleet(model, capacity=8, mean=ds.meanval)
    mesh = make_mesh(('seq',))
    with pytest.raises(ValueError):
        elastic.ElasticFleet(model, capacity=6, mesh=mesh)  # 6 % 8 != 0
    sharded = elastic.ElasticFleet(model, capacity=8, mesh=mesh,
                                   mean=ds.meanval)
    for ef in (single, sharded):
        for v in var_list:
            ef.add(v)
        ef.remove(1)
    np.testing.assert_array_equal(
        sharded.segment(frames[[0, 2]]), single.segment(frames[[0, 2]]))


def test_elastic_fleet_int8_on_mesh_matches_single_device(db, tiny):
    """int8 ElasticFleet on a 'seq' mesh: the sharded per-slot calibration
    (qparam slot tree device_put + one-slot scatters) must reproduce the
    single-device int8 elastic fleet exactly."""
    from fosvos_tpu.evaluation import elastic

    model, _ = tiny
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    var_list = [model.init(jax.random.PRNGKey(k), x, train=False)
                for k in range(2)]
    ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    images, _, _ = ds.load_sequence(ds.sequence_names[0], raw=True)
    frames = images[:2]

    single = elastic.ElasticFleet(model, capacity=8, int8=True,
                                  mean=ds.meanval)
    sharded = elastic.ElasticFleet(model, capacity=8, int8=True,
                                   mesh=make_mesh(('seq',)),
                                   mean=ds.meanval)
    for ef in (single, sharded):
        for k, v in enumerate(var_list):
            ef.add(v, calib_frame=frames[k])
    np.testing.assert_array_equal(sharded.segment(frames),
                                  single.segment(frames))
