"""Tests for torch-checkpoint import (fosvos_tpu.models.import_torch).

Synthetic state_dicts with torchvision/reference naming are generated in-test;
value placement is checked by direct indexing (layout-transpose correctness is
already proven against torch in test_ops.py / test_model_parity.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.models import OSVOSVGG, make_resnet, resnet_arch
from fosvos_tpu.models import import_torch as it


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def _bn_entries(rng, prefix, c):
    return {
        f'{prefix}.weight': _rand(rng, c),
        f'{prefix}.bias': _rand(rng, c),
        f'{prefix}.running_mean': _rand(rng, c),
        f'{prefix}.running_var': np.abs(_rand(rng, c)) + 0.5,
    }


def _tv_resnet18_sd(rng):
    sd = {'conv1.weight': _rand(rng, 64, 3, 7, 7)}
    sd.update(_bn_entries(rng, 'bn1', 64))
    in_ch = 64
    for i, planes in enumerate([64, 128, 256, 512]):
        for j in range(2):
            p = f'layer{i + 1}.{j}'
            sd[f'{p}.conv1.weight'] = _rand(rng, planes, in_ch, 3, 3)
            sd.update(_bn_entries(rng, f'{p}.bn1', planes))
            sd[f'{p}.conv2.weight'] = _rand(rng, planes, planes, 3, 3)
            sd.update(_bn_entries(rng, f'{p}.bn2', planes))
            if j == 0 and (i > 0):
                sd[f'{p}.downsample.0.weight'] = _rand(rng, planes, in_ch, 1, 1)
                sd.update(_bn_entries(rng, f'{p}.downsample.1', planes))
            in_ch = planes
    return sd


def test_resnet18_trunk_import():
    rng = np.random.RandomState(0)
    sd = _tv_resnet18_sd(rng)

    model = make_resnet(18)
    x = jnp.zeros((1, 33, 49, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    params, stats = it.resnet_trunk_from_torchvision(
        sd, model.arch, variables['params'], variables['batch_stats'])

    # placement: kernel[h,w,i,o] == sd[o,i,h,w]
    assert params['base_conv']['kernel'].shape == (7, 7, 3, 64)
    assert params['base_conv']['kernel'][1, 2, 0, 5] == sd['conv1.weight'][5, 0, 1, 2]
    assert params['stage1_block0']['downsample_conv']['kernel'][0, 0, 3, 7] == \
        sd['layer2.0.downsample.0.weight'][7, 3, 0, 0]
    np.testing.assert_array_equal(stats['base_bn']['var'],
                                  sd['bn1.running_var'])
    # heads untouched by trunk import
    np.testing.assert_array_equal(
        params['head0']['side_prep']['kernel'],
        variables['params']['head0']['side_prep']['kernel'])

    # imported variables must run
    outs = model.apply({'params': params, 'batch_stats': stats}, x, train=False)
    assert len(outs) == 5


def test_vgg16_trunk_import():
    rng = np.random.RandomState(1)
    # torchvision vgg16 conv layout in 'features'
    cfgs = [(0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
            (10, 256, 128), (12, 256, 256), (14, 256, 256),
            (17, 512, 256), (19, 512, 512), (21, 512, 512),
            (24, 512, 512), (26, 512, 512), (28, 512, 512)]
    sd = {}
    for idx, out, cin in cfgs:
        sd[f'features.{idx}.weight'] = _rand(rng, out, cin, 3, 3)
        sd[f'features.{idx}.bias'] = _rand(rng, out)
    # classifier entries must be ignored
    sd['classifier.0.weight'] = _rand(rng, 4096, 25088)

    model = OSVOSVGG()
    x = jnp.zeros((1, 33, 49, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = it.vgg16_trunk_from_torchvision(sd, variables['params'])

    assert params['stage0_conv0']['kernel'][0, 1, 2, 3] == \
        sd['features.0.weight'][3, 2, 0, 1]
    assert params['stage4_conv2']['kernel'][2, 2, 10, 20] == \
        sd['features.28.weight'][20, 10, 2, 2]
    outs = model.apply({'params': params}, x)
    assert len(outs) == 5


def _reference_osvos_resnet18_sd(rng):
    sd = {'layer_base.0.weight': _rand(rng, 64, 3, 7, 7)}
    sd.update(_bn_entries(rng, 'layer_base.1', 64))
    in_ch = 64
    for i, planes in enumerate([64, 128, 256, 512]):
        for j in range(2):
            p = f'layer_stages.{i}.{j}'
            sd[f'{p}.conv1.weight'] = _rand(rng, planes, in_ch, 3, 3)
            sd.update(_bn_entries(rng, f'{p}.bn1', planes))
            sd[f'{p}.conv2.weight'] = _rand(rng, planes, planes, 3, 3)
            sd.update(_bn_entries(rng, f'{p}.bn2', planes))
            if j == 0 and i > 0:
                sd[f'{p}.downsample.0.weight'] = _rand(rng, planes, in_ch, 1, 1)
                sd.update(_bn_entries(rng, f'{p}.downsample.1', planes))
            in_ch = planes
    for i, planes in enumerate([64, 128, 256, 512]):
        k = 2 ** (3 + i)
        sd[f'side_prep.{i}.weight'] = _rand(rng, 16, planes, 3, 3)
        sd[f'side_prep.{i}.bias'] = _rand(rng, 16)
        sd[f'upscale_side_prep.{i}.weight'] = _rand(rng, 16, 16, k, k)
        sd[f'score_dsn.{i}.weight'] = _rand(rng, 1, 16, 1, 1)
        sd[f'score_dsn.{i}.bias'] = _rand(rng, 1)
        sd[f'upscale_score_dsn.{i}.weight'] = _rand(rng, 1, 1, k, k)
    sd['layer_fuse.weight'] = _rand(rng, 1, 64, 1, 1)
    sd['layer_fuse.bias'] = _rand(rng, 1)
    return sd


def test_reference_osvos_resnet_checkpoint_conversion():
    rng = np.random.RandomState(2)
    sd = _reference_osvos_resnet18_sd(rng)
    variables = it.osvos_resnet_checkpoint_to_variables(sd, resnet_arch(18))

    # deconv: ours (k,k,out,in) == torch (in,out,k,k) transposed
    assert variables['params']['head2']['upscale_side_prep']['kernel'][3, 4, 5, 6] == \
        sd['upscale_side_prep.2.weight'][6, 5, 3, 4]

    model = make_resnet(18)
    x = jnp.zeros((1, 33, 49, 3), jnp.float32)
    outs = model.apply(
        {'params': variables['params'], 'batch_stats': variables['batch_stats']},
        x, train=False)
    assert len(outs) == 5


def test_reference_osvos_vgg_checkpoint_conversion():
    rng = np.random.RandomState(3)
    cfg = [(64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
           (512, 512, 512)]
    in_ch = 3
    sd = {}
    for i, widths in enumerate(cfg):
        # Sequential indices: convs at 0,2.. (stage 0) or after leading pool
        idx = 0 if i == 0 else 1
        for w in widths:
            sd[f'stages.{i}.{idx}.weight'] = _rand(rng, w, in_ch, 3, 3)
            sd[f'stages.{i}.{idx}.bias'] = _rand(rng, w)
            in_ch = w
            idx += 2
    for i in range(4):
        k = 2 ** (2 + i)
        sd[f'side_prep.{i}.weight'] = _rand(rng, 16, cfg[i + 1][-1], 3, 3)
        sd[f'side_prep.{i}.bias'] = _rand(rng, 16)
        sd[f'upscale.{i}.weight'] = _rand(rng, 16, 16, k, k)
        sd[f'score_dsn.{i}.weight'] = _rand(rng, 1, 16, 1, 1)
        sd[f'score_dsn.{i}.bias'] = _rand(rng, 1)
        sd[f'upscale_.{i}.weight'] = _rand(rng, 1, 1, k, k)
    sd['fuse.weight'] = _rand(rng, 1, 64, 1, 1)
    sd['fuse.bias'] = _rand(rng, 1)

    params = it.osvos_vgg_checkpoint_to_params(sd)
    assert params['stage1_conv0']['kernel'][1, 1, 10, 20] == \
        sd['stages.1.1.weight'][20, 10, 1, 1]

    model = OSVOSVGG()
    outs = model.apply({'params': params},
                       jnp.zeros((1, 33, 49, 3), jnp.float32))
    assert len(outs) == 5


def test_vgg16_trunk_from_caffe(tmp_path):
    """Synthetic vgg_hed_caffe.mat with the reference's cell layout."""
    import scipy.io
    rng = np.random.RandomState(7)
    cfg = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    in_ch = 3
    weights, biases = [], []
    for out in cfg:
        # stored such that .transpose() gives torch (out,in,kh,kw)
        w_torch = _rand(rng, out, in_ch, 3, 3)
        weights.append(w_torch.transpose())
        biases.append(_rand(rng, out)[:, None])
        in_ch = out
    mat = tmp_path / 'vgg_hed_caffe.mat'
    w_cell = np.empty((1, len(weights)), dtype=object)
    b_cell = np.empty((1, len(biases)), dtype=object)
    for k in range(len(weights)):
        w_cell[0, k] = weights[k]
        b_cell[0, k] = biases[k]
    scipy.io.savemat(str(mat), {'weights': w_cell, 'biases': b_cell})

    model = OSVOSVGG()
    x = jnp.zeros((1, 33, 49, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = it.vgg16_trunk_from_caffe(str(mat), variables['params'])
    outs = model.apply({'params': params}, x)
    assert len(outs) == 5
    # placement: our kernel[h,w,i,o] == torch[o,i,h,w]
    w0_torch = weights[0].transpose()
    assert params['stage0_conv0']['kernel'][1, 2, 0, 5] == \
        np.float32(w0_torch[5, 0, 1, 2])


def test_export_resnet_state_dict_round_trip():
    """export_torch is the exact inverse of the importer: a reference
    OSVOS_RESNET state_dict survives import -> export with identical keys
    and bit-identical values (modulo the num_batches_tracked zeros the
    exporter adds for modern-torch strict loads)."""
    from fosvos_tpu.models import export_torch as et

    rng = np.random.RandomState(7)
    sd = _reference_osvos_resnet18_sd(rng)
    variables = it.osvos_resnet_checkpoint_to_variables(sd, resnet_arch(18))
    back = et.osvos_resnet_variables_to_state_dict(variables,
                                                   resnet_arch(18))

    nbt = {k for k in back if k.endswith('num_batches_tracked')}
    assert set(back) - nbt == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    # and our own fresh-init variables round-trip the other way
    model = make_resnet(18)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 33, 49, 3), jnp.float32), train=False)
    v = jax.tree.map(np.asarray, v)
    sd2 = et.osvos_resnet_variables_to_state_dict(v, resnet_arch(18))
    v2 = it.osvos_resnet_checkpoint_to_variables(sd2, resnet_arch(18))
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(a, b)


def test_export_vgg_state_dict_round_trip():
    from fosvos_tpu.models import export_torch as et

    model = OSVOSVGG()
    v = model.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 33, 49, 3), jnp.float32))
    params = jax.tree.map(np.asarray, v['params'])
    sd = et.osvos_vgg_params_to_state_dict(params)
    # reference Sequential indices: stage0 convs at 0/2, stages>0 at 1/3/5
    assert 'stages.0.0.weight' in sd and 'stages.0.2.weight' in sd
    assert 'stages.1.1.weight' in sd and 'stages.4.5.weight' in sd
    assert 'upscale.0.weight' in sd and 'upscale_.3.weight' in sd
    back = it.osvos_vgg_checkpoint_to_params(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(a, b)


def test_save_reference_checkpoint_torch_loadable(tmp_path):
    """save_reference_checkpoint writes a .pth that torch loads as CPU
    tensors under the reference names (network_provider.py:53-57)."""
    import torch
    from fosvos_tpu.models import export_torch as et

    model = make_resnet(18)
    v = jax.tree.map(np.asarray, model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 33, 49, 3), jnp.float32),
        train=False))
    path = tmp_path / 'resnet18_11_epoch-239.pth'
    et.save_reference_checkpoint(str(path), v, model.arch)
    sd = torch.load(str(path), map_location='cpu', weights_only=False)
    assert isinstance(sd['layer_base.0.weight'], torch.Tensor)
    assert sd['layer_base.0.weight'].shape == (64, 3, 7, 7)
    # the migration path accepts what the exporter writes
    v2 = it.osvos_resnet_checkpoint_to_variables(
        {k: t.numpy() for k, t in sd.items()}, model.arch)
    np.testing.assert_array_equal(
        v2['params']['layer_fuse']['kernel'],
        v['params']['layer_fuse']['kernel'])


def test_export_torch_cli(tmp_path):
    """fosvos-export-torch: framework .npz -> reference-layout .pth,
    accepted back by the migration importer."""
    import torch
    from fosvos_tpu.cli import export_torch as cli_mod
    from fosvos_tpu.models import OSVOSResNet
    from fosvos_tpu.runtime import checkpoint

    model = OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=4))
    v = jax.tree.map(np.asarray, model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 48, 3), jnp.float32),
        train=False))
    checkpoint.save(str(tmp_path), 'student', v, model.arch.to_json())

    out = tmp_path / 'student.pth'
    cli_mod.main(['--checkpoint', str(tmp_path / 'student.npz'),
                  '--output', str(out)])
    sd = torch.load(str(out), map_location='cpu', weights_only=False)
    # sde=4 student: widths 64/2**4 = 4
    assert sd['layer_base.0.weight'].shape == (4, 3, 7, 7)
    v2 = it.osvos_resnet_checkpoint_to_variables(
        {k: t.numpy() for k, t in sd.items()}, model.arch)
    np.testing.assert_array_equal(
        v2['params']['base_conv']['kernel'],
        v['params']['base_conv']['kernel'])
