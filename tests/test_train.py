"""End-to-end training tests on the synthetic DAVIS fixture.

Small model widths + few steps keep this CPU-fast while exercising the full
compiled paths (online scan, offline epoch loop, grad accumulation, BN state).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.data import davis, synthetic
from fosvos_tpu.models import OSVOSResNet, resnet_arch
from fosvos_tpu.train import offline, online, optimizers


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    return synthetic.generate(str(tmp_path_factory.mktemp('davis')), size=(32, 48))


@pytest.fixture(scope='module')
def tiny_model():
    # sde=3 -> widths [8,16,32,64]: fast on CPU but the real topology
    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=3))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def _iou(pred_logits, gt):
    pred = np.asarray(pred_logits)[..., 0] > 0.0  # sigmoid(x) > .5 <=> x > 0
    gt = np.asarray(gt) >= 0.5
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    return inter / max(union, 1)


def test_online_finetune_learns_the_frame(db, tiny_model):
    """From random init, the compiled scan must overfit the single frame
    (IoU -> 1 on the training frame, like the reference's 10k-epoch loop)."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    img, gt = ds.make_img_gt_pair(0)

    tuner = online.OnlineFinetuner(
        model, optimizers.online_variant(10), avg_grad_every_n=5)
    res = tuner.finetune(variables, img, gt, n_epochs=300, seed=0,
                         augment=False)

    assert res.losses.shape == (300,)
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0] * 0.01

    outs = model.apply(
        {'params': res.state.params, 'batch_stats': res.state.batch_stats},
        jnp.asarray(img[None]), train=False)
    assert _iou(outs[-1][0], gt) > 0.9


def test_online_finetuner_augmented_reuse_across_sequences(db, tiny_model):
    """Multi-scale + flip buckets, reused finetuner (no donation bugs);
    within each scale bucket the loss is finite and grouped per window."""
    model, variables = tiny_model
    tuner = online.OnlineFinetuner(model, optimizers.online_variant(11))
    for seq in ['synth-swan', 'synth-goat']:
        ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name=seq)
        img, gt = ds.make_img_gt_pair(0)
        res = tuner.finetune(variables, img, gt, n_epochs=24, seed=1)
        assert res.losses.shape == (24,)
        assert np.isfinite(res.losses).all()


def test_window_batch_matches_sequential_microsteps(db, tiny_model):
    """The batched accumulation window must equal 5 sequential MultiSteps
    micro-steps with the same flip draws: same updated params, same
    compounded BN running stats, same per-micro-step loss log."""
    import optax
    from fosvos_tpu.data import transforms
    from fosvos_tpu.train.losses import online_loss

    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    img, gt = ds.make_img_gt_pair(0)
    # SGD preset: the param update is linear in the mean gradient, so the
    # comparison checks gradient equivalence directly. (Adam would amplify
    # reduction-order noise on near-cancelling gradients to +-lr via sign.)
    preset = optimizers.online_variant(2)
    seed, n_acc = 3, 5

    tuner = online.OnlineFinetuner(model, preset, avg_grad_every_n=n_acc,
                                   window_batch=True)
    res = tuner.finetune(variables, img, gt, n_epochs=n_acc, seed=seed,
                         augment=False)

    # replicate the batched path's flip draws from its PRNG stream
    key = jax.random.PRNGKey(seed)
    _, k_flip = jax.random.split(key)
    flips = np.asarray(jax.random.bernoulli(k_flip, shape=(n_acc,)))

    # hand-rolled sequential reference: MultiSteps over the same 5 flips
    base = optimizers.make_optimizer(preset, variables['params'])
    ms = optax.MultiSteps(base, every_k_schedule=n_acc)
    p, bs = variables['params'], variables['batch_stats']
    opt_state = ms.init(p)
    seq_losses = []
    for i in range(n_acc):
        imgs, g = transforms.device_flip(jnp.asarray(img[None]),
                                         jnp.asarray(gt[None, ..., None]),
                                         int(flips[i]))

        def loss_fn(pp):
            outs, mut = model.apply({'params': pp, 'batch_stats': bs}, imgs,
                                    train=True, mutable=['batch_stats'])
            return online_loss(outs, g), mut['batch_stats']

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, opt_state = ms.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        bs = new_bs
        seq_losses.append(float(loss))

    np.testing.assert_allclose(res.losses, seq_losses, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        res.state.params, p)
    # running stats: the window's EMA replay reconstructs batch stats as
    # old + (new-old)/momentum, a 10x amplification of one update's
    # rounding — hence the looser tolerance (each vmapped sample reduces
    # over exactly HW elements, same as sequential, so the unbiased-var
    # factor is identical)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5),
        res.state.batch_stats, bs)


def test_window_batch_partial_window_is_forward_only(db, tiny_model):
    """Trailing n_epochs % n_acc micro-steps never reach an optimizer step
    (MultiSteps semantics): params after 7 epochs == params after 5, but the
    loss log still has 7 entries and BN stats advanced."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    img, gt = ds.make_img_gt_pair(0)
    tuner = online.OnlineFinetuner(model, optimizers.online_variant(11),
                                   avg_grad_every_n=5)
    r5 = tuner.finetune(variables, img, gt, n_epochs=5, seed=0, augment=False)
    r7 = tuner.finetune(variables, img, gt, n_epochs=7, seed=0, augment=False)
    assert r7.losses.shape == (7,)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), r5.state.params, r7.state.params)
    assert not np.allclose(
        np.asarray(r5.state.batch_stats['base_bn']['mean']),
        np.asarray(r7.state.batch_stats['base_bn']['mean']))


def test_online_sequential_mode_still_available(db, tiny_model):
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-goat')
    img, gt = ds.make_img_gt_pair(0)
    tuner = online.OnlineFinetuner(model, optimizers.online_variant(11),
                                   avg_grad_every_n=5, window_batch=False)
    res = tuner.finetune(variables, img, gt, n_epochs=10, seed=0)
    assert res.losses.shape == (10,)
    assert np.isfinite(res.losses).all()


def test_online_finetune_bf16_tracks_fp32(db, tiny_model):
    """--bf16 adaptation (bf16 activations via model.clone, fp32
    params/optimizer/loss — cli.train_online.adaptation_model) must still
    learn the frame; params stay fp32 and land near the fp32 run's."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db, seq_name='synth-swan')
    img, gt = ds.make_img_gt_pair(0)

    tuner16 = online.OnlineFinetuner(model.clone(dtype=jnp.bfloat16),
                                     optimizers.online_variant(10),
                                     avg_grad_every_n=5)
    r16 = tuner16.finetune(variables, img, gt, n_epochs=100, seed=0,
                           augment=False)
    assert np.isfinite(r16.losses).all()
    assert all(np.asarray(a).dtype == np.float32
               for a in jax.tree.leaves(r16.state.params))

    tuner32 = online.OnlineFinetuner(model, optimizers.online_variant(10),
                                     avg_grad_every_n=5)
    r32 = tuner32.finetune(variables, img, gt, n_epochs=100, seed=0,
                           augment=False)
    # same trajectory up to bf16 rounding: losses within a few percent
    ref = np.abs(r32.losses) + 1e-3
    assert (np.abs(r16.losses - r32.losses) / ref < 0.08).all()

    # 100 epochs is mid-descent; require the bf16 run to land at the same
    # training-frame quality as fp32 rather than an absolute threshold
    def iou_of(res):
        outs = model.apply(
            {'params': res.state.params,
             'batch_stats': res.state.batch_stats},
            jnp.asarray(img[None]), train=False)
        return _iou(outs[-1][0], gt)

    assert iou_of(r16) >= iou_of(r32) - 0.05


def test_offline_training_decreases_loss(db, tiny_model):
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)

    stats_log = []
    snaps = []
    state = offline.train_offline(
        model, variables, ds,
        preset=optimizers.offline_variant(11),
        n_epochs=6, batch_size=2, avg_grad_every_n=2,
        augment=False, seed=0,
        snapshot_every_n=5,
        snapshot_fn=lambda e, s: snaps.append(e),
        log_fn=stats_log.append)

    assert len(stats_log) == 6
    first, last = stats_log[0].mean_losses[-1], stats_log[-1].mean_losses[-1]
    assert np.isfinite(last)
    assert last < first  # fuse loss decreased
    assert snaps == [4]  # epoch % 5 == 4


def test_offline_augmented_shapes_compile(db, tiny_model):
    """Multi-scale augmentation produces 3 shapes; step must handle all."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    trainer = offline.OfflineTrainer(model, optimizers.offline_variant(11),
                                     avg_grad_every_n=2)
    state = trainer.init_state(variables)
    rng = np.random.RandomState(0)
    shapes = set()
    for batch in offline.iterate_batches(ds, 1, rng, augment=True):
        shapes.add(batch['image'].shape[1:3])
        state, losses = trainer.train_step(state, batch['image'], batch['gt'],
                                           0.0)
    assert len(shapes) >= 2  # at least two scales drawn
    assert np.isfinite(np.asarray(losses)).all()


def test_prefetch_matches_serial_loop(db, tiny_model):
    """Double-buffered H2D (prefetch_to_device) is bit-identical to the
    serial loop — only transfer timing changes, not what is transferred.
    (Fixed batch list: the native loader's completion-order batching is
    deliberately order-free, so parity is asserted on the same stream.)"""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    rng = np.random.RandomState(0)
    batches = [{'image': b['image'].copy(), 'gt': b['gt'].copy()}
               for b in offline.iterate_batches(ds, 1, rng, augment=True)]

    def run(prefetch):
        trainer = offline.OfflineTrainer(model,
                                         optimizers.offline_variant(11),
                                         avg_grad_every_n=2)
        state = trainer.init_state(variables)
        it = (offline.prefetch_to_device(iter(batches)) if prefetch
              else iter(batches))
        for batch in it:
            state, _ = trainer.train_step(state, batch['image'], batch['gt'],
                                          0.0)
        return jax.tree.map(np.asarray, state.params)

    a, b = run(True), run(False)
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert flat_a and all(np.array_equal(x, y)
                          for x, y in zip(flat_a, flat_b))


def test_prefetch_propagates_generator_errors():
    """Exceptions raised while producing batches surface in the consumer."""
    def bad_batches():
        yield {'x': np.zeros(2, np.float32)}
        raise RuntimeError('decode failed')

    it = offline.prefetch_to_device(bad_batches())
    next(it)
    with pytest.raises(RuntimeError, match='decode failed'):
        next(it)


def test_gradient_accumulation_steps_only_every_n(tiny_model):
    """Params must change only at accumulation boundaries (MultiSteps)."""
    model, variables = tiny_model
    trainer = offline.OfflineTrainer(model, optimizers.offline_variant(11),
                                     avg_grad_every_n=3)
    state = trainer.init_state(variables)
    img = np.random.RandomState(0).randn(1, 32, 48, 3).astype(np.float32)
    gt = (np.random.RandomState(1).rand(1, 32, 48, 1) > 0.5).astype(np.float32)

    p0 = state.params['layer_fuse']['kernel']
    state, _ = trainer.train_step(state, img, gt, 0.0)
    np.testing.assert_array_equal(np.asarray(state.params['layer_fuse']['kernel']),
                                  np.asarray(p0))
    state, _ = trainer.train_step(state, img, gt, 0.0)
    np.testing.assert_array_equal(np.asarray(state.params['layer_fuse']['kernel']),
                                  np.asarray(p0))
    state, _ = trainer.train_step(state, img, gt, 0.0)
    assert not np.array_equal(np.asarray(state.params['layer_fuse']['kernel']),
                              np.asarray(p0))


def test_device_preprocess_matches_host_preprocess(db, tiny_model):
    """uint8 batches + device-side normalization must produce the same loss
    as the host-preprocessed float32 path."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)

    host = offline.OfflineTrainer(model, optimizers.offline_variant(11),
                                  avg_grad_every_n=1)
    dev = offline.OfflineTrainer(model, optimizers.offline_variant(11),
                                 avg_grad_every_n=1, device_preprocess=True)
    hs = host.init_state(variables)
    dsost = dev.init_state(variables)

    img_f, gt_f = ds.make_img_gt_pair(0)
    img_u, gt_u = ds.make_raw_pair(0)
    hs, hloss = host.train_step(hs, img_f[None], gt_f[None, ..., None], 0.0)
    dsost, dloss = dev.train_step(dsost, img_u[None], gt_u[None, ..., None],
                                  0.0)
    np.testing.assert_allclose(np.asarray(dloss), np.asarray(hloss),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dsost.params['layer_fuse']['kernel']),
        np.asarray(hs.params['layer_fuse']['kernel']), rtol=1e-4, atol=1e-7)


def test_iterate_raw_batches_uint8(db):
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    rng = np.random.RandomState(0)
    batch = next(offline.iterate_raw_batches(ds, 2, rng, augment=True))
    assert batch['image'].dtype == np.uint8
    assert batch['gt'].dtype == np.uint8
    assert batch['gt'].shape[-1] == 1


def test_offline_test_while_training(db, tiny_model):
    """Optional test-while-training pass (reference train_offline.py:115-136)
    evaluates the val split every test_every_n epochs."""
    model, variables = tiny_model
    ds = davis.DAVIS2016(mode='train', db_root_dir=db)
    val = davis.DAVIS2016(mode='test', db_root_dir=db)

    test_logs = []
    offline.train_offline(
        model, variables, ds,
        preset=optimizers.offline_variant(11),
        n_epochs=4, batch_size=2, avg_grad_every_n=2,
        augment=False, seed=0, snapshot_every_n=100,
        test_dataset=val, test_every_n=2, test_log_fn=test_logs.append)
    assert [s.epoch for s in test_logs] == [1, 3]
    assert all(np.isfinite(s.mean_losses).all() for s in test_logs)
