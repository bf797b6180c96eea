"""Optimizer preset tests: group labeling, lr table semantics, torch parity
for the production Adam variant."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from fosvos_tpu.models import make_resnet
from fosvos_tpu.train import optimizers


@pytest.fixture(scope='module')
def resnet_params():
    model = make_resnet(18)
    x = jnp.zeros((1, 33, 49, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables['params']


def test_labels(resnet_params):
    labels = optimizers.label_params(resnet_params)
    assert labels['base_conv']['kernel'] == 'stem'
    assert labels['base_bn']['scale'] == 'stem'
    assert labels['stage0_block0']['conv1']['kernel'] == 'trunk_w'
    assert labels['stage0_block0']['bn1']['scale'] == 'trunk_w'
    assert labels['stage0_block0']['bn1']['bias'] == 'trunk_b'
    assert labels['stage1_block0']['downsample_conv']['kernel'] == 'trunk_w'
    assert labels['head0']['side_prep']['kernel'] == 'side_prep_w'
    assert labels['head0']['side_prep']['bias'] == 'side_prep_b'
    assert labels['head0']['score_dsn']['kernel'] == 'score_dsn_w'
    assert labels['head2']['upscale_side_prep']['kernel'] == 'upscale'
    assert labels['head2']['upscale_score_dsn']['kernel'] == 'upscale'
    assert labels['layer_fuse']['kernel'] == 'fuse_w'
    assert labels['layer_fuse']['bias'] == 'fuse_b'


def test_grouped_sgd_lr_table(resnet_params):
    """One step with unit grads: update magnitude must follow the group table
    (network_provider.py:185-204), with frozen upscale/stem."""
    preset = optimizers.Preset(family='sgd', lr=1e-2, weight_decay=0.0,
                               momentum=0.0)
    opt = optimizers.make_optimizer(preset, resnet_params)
    params = jax.tree.map(lambda p: jnp.zeros_like(p), resnet_params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    updates, _ = opt.update(grads, opt.init(params), params)

    def upd(path):
        node = updates
        for k in path:
            node = node[k]
        return np.asarray(node).ravel()[0]

    assert upd(['stage0_block0', 'conv1', 'kernel']) == pytest.approx(-1e-2)
    assert upd(['stage0_block0', 'bn1', 'bias']) == pytest.approx(-2e-2)
    assert upd(['head0', 'score_dsn', 'kernel']) == pytest.approx(-1e-3)
    assert upd(['head0', 'score_dsn', 'bias']) == pytest.approx(-2e-3)
    assert upd(['layer_fuse', 'kernel']) == pytest.approx(-1e-4)
    assert upd(['layer_fuse', 'bias']) == pytest.approx(-2e-4)
    assert upd(['head1', 'upscale_side_prep', 'kernel']) == 0.0
    assert upd(['base_conv', 'kernel']) == 0.0


def test_weight_decay_only_on_weight_groups(resnet_params):
    preset = optimizers.Preset(family='sgd', lr=1.0, weight_decay=0.5,
                               momentum=0.0)
    opt = optimizers.make_optimizer(preset, resnet_params)
    params = jax.tree.map(lambda p: jnp.ones_like(p), resnet_params)
    grads = jax.tree.map(lambda p: jnp.zeros_like(p), params)
    updates, _ = opt.update(grads, opt.init(params), params)
    # weight group: wd pulls toward zero; bias group: untouched
    assert np.asarray(updates['stage0_block0']['conv1']['kernel']).ravel()[0] \
        == pytest.approx(-0.5)
    assert np.asarray(updates['stage0_block0']['bn1']['bias']).ravel()[0] == 0.0


def test_flat_adam_matches_torch():
    """Production variant 11 (Adam 1e-4, wd 2e-4 flat) vs torch.optim.Adam
    over several steps on the same tiny problem."""
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads_seq = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]

    # torch
    wt = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    topt = torch.optim.Adam([wt], lr=1e-4, weight_decay=2e-4)
    for g in grads_seq:
        topt.zero_grad()
        wt.grad = torch.as_tensor(g.copy())
        topt.step()

    # ours: fake single-param tree labeled as trunk (flat ignores labels)
    params = {'stage0_block0': {'conv1': {'kernel': jnp.asarray(w0)}}}
    preset = optimizers.offline_variant(11)
    assert preset.family == 'adam' and preset.lr == 1e-4
    opt = optimizers.make_optimizer(preset, params)
    state = opt.init(params)
    for g in grads_seq:
        gt = {'stage0_block0': {'conv1': {'kernel': jnp.asarray(g)}}}
        updates, state = opt.update(gt, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params['stage0_block0']['conv1']['kernel']),
        wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_grouped_sgd_momentum_matches_torch():
    """Grouped SGD (momentum 0.9, wd 2e-4) parity for a trunk weight."""
    rng = np.random.RandomState(1)
    w0 = rng.randn(3, 3).astype(np.float32)
    grads_seq = [rng.randn(3, 3).astype(np.float32) for _ in range(4)]
    lr = 1e-3

    wt = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    topt = torch.optim.SGD([wt], lr=lr, momentum=0.9, weight_decay=2e-4)
    for g in grads_seq:
        topt.zero_grad()
        wt.grad = torch.as_tensor(g.copy())
        topt.step()

    params = {'stage0_block0': {'conv1': {'kernel': jnp.asarray(w0)}}}
    opt = optimizers.make_optimizer(
        optimizers.Preset(family='sgd', lr=lr, weight_decay=2e-4,
                          momentum=0.9), params)
    state = opt.init(params)
    for g in grads_seq:
        gt = {'stage0_block0': {'conv1': {'kernel': jnp.asarray(g)}}}
        updates, state = opt.update(gt, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params['stage0_block0']['conv1']['kernel']),
        wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_variant_tables():
    assert optimizers.offline_variant(None).grouped
    assert optimizers.offline_variant(11) == optimizers.Preset(
        family='adam', lr=1e-4, weight_decay=0.0002, grouped=False)
    assert optimizers.offline_variant(17).family == 'sgd'
    assert optimizers.offline_variant(17).lr == 1e-4
    assert optimizers.online_variant(11).family == 'adam'
    assert optimizers.vgg_online_preset().freeze_score_dsn
    with pytest.raises(ValueError):
        optimizers.offline_variant(99)
