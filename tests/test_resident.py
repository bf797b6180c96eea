"""Device-resident offline training (train/resident.py): bit-parity with the
standard path at scale 1.0, and the on-device augmented multi-scale path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.train import offline, optimizers, resident


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')),
                              size=(32, 48))


@pytest.fixture(scope='module')
def tiny_model(db):
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 3), jnp.float32),
                           train=False)
    return model, jax.tree.map(jnp.asarray, variables)


def test_resident_matches_standard_no_augment(db, tiny_model):
    """With augment off there is no resize: the resident chunk scan runs the
    same step sequence as the standard uint8 device-preprocess path.
    Equality is to float-reassociation tolerance (the scan body and the
    standalone step are different XLA programs; measured max divergence
    ~4e-7 after an epoch), not bitwise."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    seed, n_epochs = 3, 2

    state_r = resident.train_offline_resident(
        model, variables, ds, preset=optimizers.offline_variant(11),
        n_epochs=n_epochs, batch_size=1, avg_grad_every_n=2,
        augment=False, seed=seed)

    # hand-rolled standard path over the SAME index order (the resident
    # loop's only rng draw per epoch is the permutation)
    trainer = offline.OfflineTrainer(model, optimizers.offline_variant(11),
                                     avg_grad_every_n=2,
                                     device_preprocess=True,
                                     meanval=ds.meanval)
    state_s = trainer.init_state(variables)
    rng = np.random.RandomState(seed)
    for epoch in range(n_epochs):
        order = rng.permutation(len(ds))
        for i in order:
            img, gt = ds.make_raw_pair(int(i))
            state_s, _ = trainer.train_step(state_s, img[None],
                                            gt[None, ..., None],
                                            epoch / n_epochs)

    got = jax.tree.leaves(jax.tree.map(np.asarray, state_r.params))
    want = jax.tree.leaves(jax.tree.map(np.asarray, state_s.params))
    assert got and all(np.allclose(a, b, atol=5e-6, rtol=1e-5)
                       for a, b in zip(got, want))
    # batch stats too (BN running stats follow the same step sequence)
    got_bs = jax.tree.leaves(jax.tree.map(np.asarray, state_r.batch_stats))
    want_bs = jax.tree.leaves(jax.tree.map(np.asarray, state_s.batch_stats))
    assert all(np.allclose(a, b, atol=5e-6, rtol=1e-5)
               for a, b in zip(got_bs, want_bs))


def test_resident_augmented_multiscale(db, tiny_model):
    """Augmented mode: on-device flip + multi-scale resize, losses finite,
    loss log covers every step, snapshots at the reference cadence."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    stats_log, snaps = [], []
    resident.train_offline_resident(
        model, variables, ds, preset=optimizers.offline_variant(11),
        n_epochs=4, batch_size=1, avg_grad_every_n=2,
        augment=True, seed=0, chunk_steps=2,
        snapshot_every_n=2, snapshot_fn=lambda e, s: snaps.append(e),
        log_fn=stats_log.append)
    assert len(stats_log) == 4
    assert all(np.isfinite(s.mean_losses).all() for s in stats_log)
    assert snaps == [1, 3]


def test_resident_data_parallel_matches_single(db, tiny_model):
    """Resident training over the 8-way virtual 'data' mesh: replicated
    resident arrays, batch axis sharded, GSPMD all-reduce — same params as
    the single-device resident run (float tolerance)."""
    from fosvos_tpu.parallel import make_mesh
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    mesh = make_mesh(('data',))
    assert mesh.size >= 2

    def run(m):
        return resident.train_offline_resident(
            model, variables, ds, preset=optimizers.offline_variant(11),
            n_epochs=1, batch_size=8, avg_grad_every_n=1,
            augment=False, seed=0, mesh=m)

    state_m = run(mesh)
    state_1 = run(None)
    got = jax.tree.leaves(jax.tree.map(np.asarray, state_m.params))
    want = jax.tree.leaves(jax.tree.map(np.asarray, state_1.params))
    assert got and all(np.allclose(a, b, atol=5e-6, rtol=1e-5)
                       for a, b in zip(got, want))


def test_resident_spatial_sharding_matches(db, tiny_model):
    """2D mesh: resident arrays H-sharded over 'spatial', batch over
    'data' — same params as the unsharded resident run, and each device
    holds only its H-slice of the dataset.

    SGD preset: Adam divides by sqrt(v)+eps, which over several steps
    amplifies the mesh's reduction-order float noise to ~1e-4 (measured
    identical with replicated data, so it is the dp reduction, not the
    spatial partitioning); SGD keeps the comparison at gradient-parity
    level."""
    from fosvos_tpu.parallel import make_mesh
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    mesh = make_mesh(('data', 'spatial'), shape=(4, 2))
    preset = optimizers.Preset(family='sgd', lr=1e-4, grouped=False)

    def run(m, spatial):
        return resident.train_offline_resident(
            model, variables, ds, preset=preset,
            n_epochs=1, batch_size=4, avg_grad_every_n=1,
            augment=False, seed=0, mesh=m, shard_spatial=spatial)

    state_sp = run(mesh, True)
    state_1 = run(None, False)
    got = jax.tree.leaves(jax.tree.map(np.asarray, state_sp.params))
    want = jax.tree.leaves(jax.tree.map(np.asarray, state_1.params))
    assert got and all(np.allclose(a, b, atol=5e-6, rtol=1e-5)
                       for a, b in zip(got, want))
    # the resident frames really are H-sharded per device
    d_imgs, _ = resident.upload(ds, mesh=mesh, shard_spatial=True)
    shard_shape = d_imgs.sharding.shard_shape(d_imgs.shape)
    assert shard_shape[1] == d_imgs.shape[1] // 2


def test_resident_mesh_batch_divisibility(db, tiny_model):
    from fosvos_tpu.parallel import make_mesh
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    mesh = make_mesh(('data',))
    with pytest.raises(ValueError, match='multiple of the mesh data axis'):
        resident.train_offline_resident(
            model, variables, ds, n_epochs=1,
            batch_size=mesh.shape['data'] + 1, mesh=mesh)


def test_resident_mimic_distillation(db, tiny_model):
    """Offline mimic over the HBM-resident split: teacher+student chunk
    scans, reference TB tags, snapshot cadence."""
    from fosvos_tpu.compress import mimic as mimic_lib
    teacher_model, teacher_vars = tiny_model
    student_model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=5))
    student_vars = student_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 48, 3), jnp.float32),
        train=False)
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    db_val = davis.DAVIS2016(mode='test', db_root_dir=db,
                             seq_name='synth-swan')

    def val_batches():
        img, gt = db_val.make_img_gt_pair(0)
        yield img[None], gt[None, ..., None]

    class W:
        def __init__(self):
            self.tags = {}

        def add_scalar(self, tag, v, s):
            self.tags.setdefault(tag, []).append((s, float(v)))

    w = W()
    snaps = []
    res = mimic_lib.train_mimic_resident(
        student_model, student_vars, teacher_model, teacher_vars, ds,
        val_batches_fn=val_batches, n_epochs=2, criterion='MSE',
        validate_every_n=2, snapshot_every_n=2,
        snapshot_fn=lambda e, s: snaps.append(e), summary_writer=w,
        chunk_steps=2)
    assert np.isfinite(res.train_losses).all()
    assert len(res.train_losses) == 2 and len(res.val_losses) == 1
    assert {'total_loss_epoch', 'total_loss_iter', 'train/loss',
            'val/loss'} == set(w.tags)
    assert snaps == [2]


def test_resident_mimic_batched(db, tiny_model):
    """Batched distillation (batch_size>1) runs the same engine with the
    batch axis widened — the parent trainer's b128-knee win applied to the
    offline distillation sweep. Semantics deviation (teacher/student BN
    batch moments) is documented; this pins the mechanics: every epoch
    covers len(ds)//B steps, losses stay finite, the trained student's
    state is returned."""
    from fosvos_tpu.compress import mimic as mimic_lib
    teacher_model, teacher_vars = tiny_model
    student_model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=5))
    student_vars = student_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 48, 3), jnp.float32),
        train=False)
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    assert len(ds) >= 4

    res = mimic_lib.train_mimic_resident(
        student_model, student_vars, teacher_model, teacher_vars, ds,
        n_epochs=2, criterion='MSE', chunk_steps=2, batch_size=2)
    assert np.isfinite(res.train_losses).all()
    assert len(res.train_losses) == 2
    # params actually moved
    d0 = jax.tree.leaves(student_vars['params'])[0]
    d1 = jax.tree.leaves(res.state.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_resident_prune_pipeline(db, tiny_model):
    """Pruning with both inner loops on the resident engine: ranking grads
    accumulate on device, masks thread as traced context (no recompile per
    prune iteration), checkpoints materialize a smaller arch."""
    from fosvos_tpu.compress import prune as prune_lib
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)

    class W:
        def __init__(self):
            self.tags = {}

        def add_scalar(self, tag, v, s):
            self.tags.setdefault(tag, []).append((s, float(v)))

    w = W()
    ckpts = prune_lib.prune_iteratively(
        model, model.arch, variables, None, is_offline=True,
        prune_per_iter=16, n_epochs_select=1, n_epochs_finetune=1,
        percentage_max=10, summary_writer=w,
        resident_dataset=ds, resident_chunk_steps=2)
    assert len(ckpts) == 1
    small = ckpts[0].arch
    n_small = small.base_out + sum(sum(b.convs) for st in small.stages
                                   for b in st)
    full = model.arch
    n_full = full.base_out + sum(sum(b.convs) for st in full.stages
                                 for b in st)
    assert n_small < n_full
    assert {'train_pruning/loss', 'finetune/loss'} == set(w.tags)
    assert all(np.isfinite(v) for vs in w.tags.values() for _, v in vs)


def test_resident_prune_batched(db, tiny_model):
    """resident_batch_size>1 batches both prune inner loops (the parent
    trainer's b128-knee win; BN-moments deviation documented). Pins the
    mechanics: the sweep still reaches its target, scalars stay finite,
    and the materialized arch shrinks exactly as in the b1 run."""
    from fosvos_tpu.compress import prune as prune_lib
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    assert len(ds) >= 4

    class W:
        def __init__(self):
            self.tags = {}

        def add_scalar(self, tag, v, s):
            self.tags.setdefault(tag, []).append((s, float(v)))

    w = W()
    ckpts = prune_lib.prune_iteratively(
        model, model.arch, variables, None, is_offline=True,
        prune_per_iter=16, n_epochs_select=1, n_epochs_finetune=1,
        percentage_max=10, summary_writer=w,
        resident_dataset=ds, resident_chunk_steps=2,
        resident_batch_size=2)
    assert len(ckpts) == 1
    small = ckpts[0].arch
    n_small = small.base_out + sum(sum(b.convs) for st in small.stages
                                   for b in st)
    full = model.arch
    n_full = full.base_out + sum(sum(b.convs) for st in full.stages
                                 for b in st)
    assert n_small < n_full
    assert all(np.isfinite(v) for vs in w.tags.values() for _, v in vs)


def test_resident_offline_cli(db, tmp_path, monkeypatch):
    """--device-resident (+ --data-parallel: 2D mesh auto-layout on the
    virtual 8-device mesh) through the real train_offline CLI."""
    monkeypatch.chdir(tmp_path)
    from fosvos_tpu.cli import train_offline as cli_mod
    from fosvos_tpu.models import OSVOSResNet
    from fosvos_tpu.models import resnet_arch as arch_fn
    from fosvos_tpu.runtime import checkpoint, providers

    orig = cli_mod.OfflineSettings

    def small(**kw):
        kw.update(n_epochs=2, snapshot_every_n=2, batch_size_train=1)
        return orig(**kw)

    monkeypatch.setattr(cli_mod, 'OfflineSettings', small)

    def tiny_init(self, arch=None):
        import jax
        import jax.numpy as jnp
        self.model = OSVOSResNet(arch=arch or arch_fn(
            18, scale_down_exponent=4))
        self.variables = dict(self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 48, 3), jnp.float32),
            train=False))
        return self.model

    monkeypatch.setattr(providers.NetworkProvider, 'init_network', tiny_init)

    cli_mod.main(['--network', 'resnet18', '--variant-offline', '11',
                  '--device-resident', '--no-testing',
                  '--db-root-dir', db])
    assert checkpoint.exists('models', 'resnet18_11_epoch-1')

    cli_mod.main(['--network', 'resnet18', '--variant-offline', '11',
                  '--device-resident', '--data-parallel', '--no-testing',
                  '--db-root-dir', db])
    assert checkpoint.exists('models', 'resnet18_11_epoch-1')


def test_resident_mimic_cli_online_ignores_flag(db, tmp_path, monkeypatch,
                                                caplog):
    """--device-resident on a 1-frame online mimic run falls back to the
    standard loader with a log line (nothing resident to win)."""
    monkeypatch.chdir(tmp_path)
    from fosvos_tpu.cli import mimic as cli_mod
    from fosvos_tpu.models import arch as arch_mod
    from fosvos_tpu.runtime import checkpoint as ckpt

    teacher_model = OSVOSResNet(arch=arch_mod.resnet_arch(
        18, scale_down_exponent=4))
    tvars = teacher_model.init(jax.random.PRNGKey(3),
                               jnp.zeros((1, 32, 48, 3), jnp.float32),
                               train=False)
    ckpt.save('teacher', 't', jax.tree.map(np.asarray, tvars),
              teacher_model.arch.to_json())
    real_arch = arch_mod.resnet_arch
    monkeypatch.setattr(
        cli_mod, 'resnet_arch',
        lambda v=18, scale_down_exponent=0:
        real_arch(18, scale_down_exponent=max(scale_down_exponent, 4)))

    import logging
    with caplog.at_level(logging.INFO):
        cli_mod.main(['-s', 'synth-swan', '--db-root-dir', db,
                      '--n-epochs', '2', '--scale-down-exponents', '5',
                      '--criterion', 'MSE', '--teacher-path', 'teacher/t.npz',
                      '--device-resident', '--no-tensorboard'])
    assert any('ignored for a 1-frame online run' in r.message
               for r in caplog.records)


def test_resident_test_while_training(db, tiny_model):
    """Resident eval pass (test-while-training) over the resident test
    split, at the reference cadence, matching the standard eval step."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    test_ds = davis.DAVIS2016(mode='test', db_root_dir=db)
    tlogs = []
    state = resident.train_offline_resident(
        model, variables, ds, preset=optimizers.offline_variant(11),
        n_epochs=2, batch_size=1, avg_grad_every_n=2,
        augment=False, seed=0,
        test_dataset=test_ds, test_every_n=2, test_log_fn=tlogs.append)
    assert len(tlogs) == 1 and tlogs[0].epoch == 1
    assert np.isfinite(tlogs[0].mean_losses).all()

    # cross-check against the standard eval step on the same params
    trainer = offline.OfflineTrainer(model, optimizers.offline_variant(11),
                                     avg_grad_every_n=2,
                                     device_preprocess=True,
                                     meanval=test_ds.meanval)
    trainer.init_state(variables)
    want = []
    for i in range(len(test_ds)):
        img, gt = test_ds.make_img_gt_pair(i)   # normalized floats
        want.append(trainer._eval_step(state.params, state.batch_stats,
                                       jnp.asarray(img[None]),
                                       jnp.asarray(gt[None, ..., None])))
    want = np.asarray(jnp.stack(want)).mean(axis=0)
    assert np.allclose(tlogs[0].mean_losses, want, rtol=1e-5, atol=1e-5)


def test_resident_vgg_no_batch_stats(db):
    """VGG has no BatchNorm: the resident step must handle an empty
    batch_stats collection like the standard trainer does."""
    from fosvos_tpu.models import OSVOSVGG
    model = OSVOSVGG()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 48, 3), jnp.float32))
    ds = davis.DAVIS2016(mode='train', db_root_dir=db,
                         seq_name='synth-bear')
    stats = []
    resident.train_offline_resident(
        model, dict(variables), ds,
        preset=optimizers.vgg_offline_preset(),
        n_epochs=1, batch_size=1, avg_grad_every_n=2,
        augment=False, seed=0, log_fn=stats.append)
    assert np.isfinite(stats[0].mean_losses).all()


def test_resident_batch_gathers(db, tiny_model):
    """batch_size > 1: per-step gather of several resident frames."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    stats_log = []
    resident.train_offline_resident(
        model, variables, ds, preset=optimizers.offline_variant(11),
        n_epochs=1, batch_size=2, avg_grad_every_n=2,
        augment=False, seed=0, log_fn=stats_log.append)
    assert np.isfinite(stats_log[0].mean_losses).all()
