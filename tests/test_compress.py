"""Tests for channel pruning (Taylor masks + functional materialization) and
mimic distillation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.compress import mimic, prune
from fosvos_tpu.models import OSVOSResNet, resnet_arch


@pytest.fixture(scope='module')
def tiny():
    arch = resnet_arch(18, scale_down_exponent=3)  # widths [8,16,32,64]
    model = OSVOSResNet(arch=arch)
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, arch, variables


def _batch(seed=0, h=32, w=48):
    rng = np.random.RandomState(seed)
    images = rng.randn(2, h, w, 3).astype(np.float32) * 30
    gts = np.zeros((2, h, w, 1), np.float32)
    gts[:, 8:20, 10:30] = 1.0
    return images, gts


def test_mask_sites_and_counts(tiny):
    _, arch, _ = tiny
    sites = prune.mask_sites(arch)
    # base + 8 blocks x (conv1, out)
    assert len(sites) == 1 + 8 * 2
    assert sites['base'] == 8
    assert sites['stage3_block1/out'] == 64
    masks = prune.init_masks(arch)
    assert prune.total_filters(masks) == sum(sites.values())


def test_taylor_ranks_are_gradients(tiny):
    model, arch, variables = tiny
    ranker = prune.TaylorRanker(model, is_offline=True)
    masks = prune.init_masks(arch)
    ranks = ranker.rank(variables, masks, [_batch()])
    assert set(ranks) == set(masks)
    # gradients must be non-trivial on most sites
    nonzero = sum(float(np.abs(np.asarray(v)).sum()) > 0
                  for v in ranks.values())
    assert nonzero >= len(ranks) - 1


def test_pruning_plan_respects_min_channels(tiny):
    model, arch, variables = tiny
    masks = prune.init_masks(arch)
    rng = np.random.RandomState(0)
    ranks = {k: rng.rand(m.size) for k, m in masks.items()}
    # base has 8 channels: at most 8-4=4 can ever be pruned from it
    plan = prune.pruning_plan(ranks, masks, n_to_prune=300)
    from collections import Counter
    per_site = Counter(site for site, _ in plan)
    assert per_site.get('base', 0) <= 4
    sites = prune.mask_sites(arch)
    for site, n in per_site.items():
        assert n <= sites[site] - prune.N_MIN_CHANNELS


def test_masked_channels_not_repicked(tiny):
    model, arch, variables = tiny
    masks = prune.init_masks(arch)
    masks = prune.apply_plan(masks, [('stage3_block1/out', 0),
                                     ('stage3_block1/out', 1)])
    ranks = {k: np.zeros(m.size) for k, m in masks.items()}  # all-tie zeros
    plan = prune.pruning_plan(ranks, masks, n_to_prune=5)
    assert ('stage3_block1/out', 0) not in plan
    assert ('stage3_block1/out', 1) not in plan


def test_materialize_preserves_function(tiny):
    """Masked model and materialized small model must agree exactly."""
    model, arch, variables = tiny
    rng = np.random.RandomState(1)
    masks = prune.init_masks(arch)
    # prune a random sample of channels at varied sites incl. residual streams
    plan = []
    for site, width in prune.mask_sites(arch).items():
        n = max(1, width // 8)
        for c in rng.choice(width, size=n, replace=False):
            plan.append((site, int(c)))
    masks = prune.apply_plan(masks, plan)

    images, _ = _batch(seed=2)
    outs_masked = model.apply(variables, jnp.asarray(images), train=False,
                              channel_masks=masks)

    small_arch, small_vars = prune.materialize(arch, variables, masks)
    small_model = OSVOSResNet(arch=small_arch)
    outs_small = small_model.apply(
        {'params': jax.tree.map(jnp.asarray, small_vars['params']),
         'batch_stats': jax.tree.map(jnp.asarray, small_vars['batch_stats'])},
        jnp.asarray(images), train=False)

    for a, b in zip(outs_masked, outs_small):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # the small model is genuinely smaller
    n_small = sum(p.size for p in jax.tree.leaves(small_vars['params']))
    n_full = sum(p.size for p in jax.tree.leaves(variables['params']))
    assert n_small < n_full


def test_prune_iteratively_reaches_targets(tiny):
    model, arch, variables = tiny
    batches = [_batch(seed=3)]
    ckpts = prune.prune_iteratively(
        model, arch, variables, lambda: iter(batches), is_offline=False,
        prune_per_iter=8, n_epochs_select=1, n_epochs_finetune=1,
        percentage_max=20, percentage_step=10)
    assert [c.percentage for c in ckpts] == [10, 20]
    total = prune.total_filters(prune.init_masks(arch))
    live2 = prune.remaining_filters(ckpts[1].masks)
    assert live2 <= int(round(total * 0.8))
    # materialized checkpoints run
    m2 = OSVOSResNet(arch=ckpts[1].arch)
    outs = m2.apply(
        {'params': jax.tree.map(jnp.asarray, ckpts[1].variables['params']),
         'batch_stats': jax.tree.map(jnp.asarray,
                                     ckpts[1].variables['batch_stats'])},
        jnp.zeros((1, 32, 48, 3), jnp.float32), train=False)
    assert len(outs) == 5
    # arch JSON round-trips (checkpoint format for pruned topologies)
    from fosvos_tpu.models.arch import ResNetArch
    rt = ResNetArch.from_json(ckpts[1].arch.to_json())
    assert rt == ckpts[1].arch


@pytest.fixture(scope='module')
def taught_teacher(tiny):
    """Teacher with real spatial structure in its outputs: briefly fit the
    tiny model to the fixture mask. CBCEL-from-teacher binarizes teacher
    logits at 0.5 (reference quirk, mimic.py:82-83 + osvos_layers.py:26), so
    a fresh-init teacher (all logits ~0) yields an identically-zero loss —
    distillation only means anything from a trained teacher."""
    from fosvos_tpu.train import online, optimizers as opt
    model, _, variables = tiny
    images, gts = _batch(seed=4)
    tuner = online.OnlineFinetuner(model, opt.online_variant(10),
                                   avg_grad_every_n=1)
    res = tuner.finetune(variables, images[0], gts[0, ..., 0],
                         n_epochs=120, augment=False, seed=0)
    return model, {'params': res.state.params,
                   'batch_stats': res.state.batch_stats}


@pytest.mark.parametrize('criterion', ['MSE', 'L1', 'CBCEL'])
def test_mimic_student_approaches_teacher(taught_teacher, criterion):
    teacher_model, teacher_vars = taught_teacher
    student_arch = resnet_arch(18, scale_down_exponent=4)
    student_model = OSVOSResNet(arch=student_arch)
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    student_vars = student_model.init(jax.random.PRNGKey(1), x, train=False)

    batches = [_batch(seed=4)]
    res = mimic.train_mimic(
        student_model, student_vars, teacher_model, teacher_vars,
        lambda: iter(batches), val_batches_fn=lambda: iter(batches),
        n_epochs=20, criterion=criterion, learn_from='teacher',
        learning_rate=1e-3, validate_every_n=10, snapshot_every_n=100)
    assert len(res.train_losses) == 20
    assert len(res.val_losses) == 2
    assert np.isfinite(res.train_losses).all()
    assert res.train_losses[-1] < res.train_losses[0]


def test_mimic_from_ground_truth(tiny):
    _, _, _ = tiny
    student_model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    student_vars = student_model.init(jax.random.PRNGKey(2), x, train=False)
    batches = [_batch(seed=5)]
    res = mimic.train_mimic(
        student_model, student_vars, None, None,
        lambda: iter(batches), n_epochs=10, criterion='CBCEL',
        learn_from='ground_truth')
    assert res.train_losses[-1] < res.train_losses[0]


def test_rank_scan_matches_loop(tiny):
    """The stacked lax.scan ranking path must equal per-batch grads."""
    model, arch, variables = tiny
    masks = prune.init_masks(arch)
    b1 = _batch(seed=10)
    b2 = _batch(seed=11)

    ranker_loop = prune.TaylorRanker(model, is_offline=True)
    # force the loop path with mismatched shape sentinel: call per batch
    r_a = ranker_loop.rank(variables, masks, [b1])
    r_b = ranker_loop.rank(variables, masks, [b2])
    want = {k: np.asarray(r_a[k]) + np.asarray(r_b[k]) for k in r_a}

    ranker_scan = prune.TaylorRanker(model, is_offline=True)
    got = ranker_scan.rank(variables, masks, [b1, b2])
    assert ranker_scan._scan_fn is not None  # scan path taken
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=1e-4, atol=1e-6)


def test_bottleneck_materialize_preserves_function():
    """Pruning masks + materialization on the Bottleneck (resnet50) family."""
    arch = resnet_arch(50, scale_down_exponent=4)
    model = OSVOSResNet(arch=arch)
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    rng = np.random.RandomState(2)
    masks = prune.init_masks(arch)
    sites = prune.mask_sites(arch)
    # 3 conv sites per bottleneck block + base
    assert len(sites) == 1 + sum(len(st) for st in arch.stages) * 3
    plan = []
    for site, width in sites.items():
        if width > prune.N_MIN_CHANNELS:
            plan.append((site, int(rng.randint(width))))
    masks = prune.apply_plan(masks, plan)

    images = rng.randn(1, 32, 48, 3).astype(np.float32) * 30
    outs_masked = model.apply(variables, jnp.asarray(images), train=False,
                              channel_masks=masks)
    small_arch, small_vars = prune.materialize(arch, variables, masks)
    small = OSVOSResNet(arch=small_arch)
    outs_small = small.apply(
        {'params': jax.tree.map(jnp.asarray, small_vars['params']),
         'batch_stats': jax.tree.map(jnp.asarray,
                                     small_vars['batch_stats'])},
        jnp.asarray(images), train=False)
    for a, b in zip(outs_masked, outs_small):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_rank_mixed_scales_matches_loop(tiny):
    """Multi-scale ranking batches (flip x {0.5,0.8,1} shapes) must be
    grouped per shape into compiled scans and sum to the per-batch loop
    result — the full augmented ranking distribution of the reference
    (prune.py:226-251)."""
    model, arch, variables = tiny
    masks = prune.init_masks(arch)
    batches = [_batch(seed=20, h=32, w=48), _batch(seed=21, h=16, w=24),
               _batch(seed=22, h=32, w=48), _batch(seed=23, h=26, w=38),
               _batch(seed=24, h=16, w=24)]

    ranker_loop = prune.TaylorRanker(model, is_offline=True)
    want = {k: np.zeros_like(np.asarray(m)) for k, m in masks.items()}
    for b in batches:
        r = ranker_loop.rank(variables, masks, [b])
        want = {k: want[k] + np.asarray(r[k]) for k in want}

    ranker = prune.TaylorRanker(model, is_offline=True)
    got = ranker.rank(variables, masks, batches)
    assert ranker._scan_fn is not None
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=1e-4, atol=1e-6)
