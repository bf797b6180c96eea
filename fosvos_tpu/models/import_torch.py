"""Torch checkpoint importers.

Parity with the reference requires the same pretrained trunks
(``osvos_vgg.py:118-129`` copies torchvision vgg16 convs;
``osvos_resnet.py:168-184`` copies conv/bn weights from torchvision resnets).
torchvision is not importable here, so these functions consume a **state_dict
file** (``torch.save(model.state_dict())`` layout of the torchvision zoo) and
map it into this framework's param pytree. They also convert full reference
OSVOS checkpoints (``network_provider.py:53-63`` .pth files) so existing
trained models can be migrated.

Layout conversions (validated in tests/test_ops.py, tests/test_model_parity.py):
  conv   torch (out,in,kh,kw)  -> flax HWIO  = transpose(2,3,1,0)
  deconv torch (in,out,kh,kw)  -> ours (k,k,out,in) = transpose(2,3,1,0)
  bn     weight/bias/running_mean/running_var -> scale/bias + batch_stats
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from fosvos_tpu.models.arch import ResNetArch, VGGArch

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(sd: Mapping[str, Any], key: str, bias: bool = True) -> Params:
    out = {'kernel': _np(sd[key + '.weight']).transpose(2, 3, 1, 0)}
    if bias and key + '.bias' in sd:
        out['bias'] = _np(sd[key + '.bias'])
    return out


def _deconv(sd: Mapping[str, Any], key: str) -> Params:
    return {'kernel': _np(sd[key + '.weight']).transpose(2, 3, 1, 0)}


def _bn(sd: Mapping[str, Any], key: str) -> Tuple[Params, Params]:
    params = {'scale': _np(sd[key + '.weight']),
              'bias': _np(sd[key + '.bias'])}
    stats = {'mean': _np(sd[key + '.running_mean']),
             'var': _np(sd[key + '.running_var'])}
    return params, stats


def load_state_dict(path: str) -> Dict[str, Any]:
    """Load a ``.pth`` state_dict (CPU map), reference network_provider.py:57."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=False)
    if hasattr(sd, 'state_dict'):  # whole-module save (network_provider.py:63)
        sd = sd.state_dict()
    return dict(sd)


def vgg16_trunk_from_torchvision(sd: Mapping[str, Any],
                                 params: Params) -> Params:
    """Copy torchvision vgg16 ``features.*`` convs into our trunk params.

    Mirrors reference ``osvos_vgg.py:118-129``: walk the conv layers of
    ``features`` in order and copy weight+bias into stage convs; side heads
    keep their fresh init.
    """
    conv_keys = sorted(
        {int(k.split('.')[1]) for k in sd
         if k.startswith('features.') and k.endswith('.weight')
         and _np(sd[k]).ndim == 4})
    params = dict(params)
    k = 0
    for i, widths in enumerate(VGGArch().stages):
        for j in range(len(widths)):
            fk = f'features.{conv_keys[k]}'
            params[f'stage{i}_conv{j}'] = {
                'kernel': _np(sd[fk + '.weight']).transpose(2, 3, 1, 0),
                'bias': _np(sd[fk + '.bias']),
            }
            k += 1
    return params


def vgg16_trunk_from_caffe(mat_path: str, params: Params) -> Params:
    """Caffe HED-VGG trunk import (reference ``osvos_vgg.py:139-153``,
    ``pretrained=2``): a ``vgg_hed_caffe.mat`` with 'weights'/'biases' cell
    arrays, one per conv in trunk order; weights stored transposed (caffe
    (out,in,kh,kw) saved so ``.transpose()`` yields torch layout; one more
    transpose to our HWIO).
    """
    import scipy.io
    caffe = scipy.io.loadmat(mat_path)
    params = dict(params)
    k = 0
    for i, widths in enumerate(VGGArch().stages):
        for j in range(len(widths)):
            w = np.asarray(caffe['weights'][0][k]).transpose()
            b = np.asarray(caffe['biases'][0][k])[:, 0]
            params[f'stage{i}_conv{j}'] = {
                'kernel': w.transpose(2, 3, 1, 0).astype(np.float32),
                'bias': b.astype(np.float32),
            }
            k += 1
    return params


def resnet_trunk_from_torchvision(sd: Mapping[str, Any], arch: ResNetArch,
                                  params: Params,
                                  batch_stats: Params) -> Tuple[Params, Params]:
    """Copy torchvision resnet trunk into our params/batch_stats.

    Mirrors reference ``osvos_resnet.py:168-184`` (conv1/bn1 + layer1..4).
    Only valid for scale_down_exponent == 0 (same widths as the zoo model).
    """
    if arch.side_input_widths[0] != 64:
        raise ValueError('pretrained import requires unscaled widths')
    params, batch_stats = dict(params), dict(batch_stats)

    params['base_conv'] = _conv(sd, 'conv1', bias=False)
    p, s = _bn(sd, 'bn1')
    params['base_bn'], batch_stats['base_bn'] = p, s

    n_convs = {'basic': 2, 'bottleneck': 3}[arch.block]
    for i, stage in enumerate(arch.stages):
        for j in range(len(stage)):
            src = f'layer{i + 1}.{j}'
            dst = f'stage{i}_block{j}'
            bp: Params = {}
            bs: Params = {}
            for c in range(1, n_convs + 1):
                bp[f'conv{c}'] = _conv(sd, f'{src}.conv{c}', bias=False)
                p, s = _bn(sd, f'{src}.bn{c}')
                bp[f'bn{c}'], bs[f'bn{c}'] = p, s
            if f'{src}.downsample.0.weight' in sd:
                bp['downsample_conv'] = _conv(sd, f'{src}.downsample.0',
                                              bias=False)
                p, s = _bn(sd, f'{src}.downsample.1')
                bp['downsample_bn'], bs['downsample_bn'] = p, s
            params[dst] = {**params[dst], **bp}
            batch_stats[dst] = {**batch_stats.get(dst, {}), **bs}
    return params, batch_stats


def osvos_resnet_trunk_to_params(sd: Mapping[str, Any], arch: ResNetArch
                                 ) -> Tuple[Params, Params]:
    """Map a reference OSVOS_RESNET state_dict's TRUNK (``layer_base.{0,1}``
    + ``layer_stages.{i}.{j}.*``, osvos_resnet.py:29-32) to our
    params/batch_stats subtrees. Split out of the full converter because the
    trunk is the only importable part of the reference's bottleneck
    versions — its resnet50+ side heads are mis-wired (side_prep in_channels
    ignore block.expansion, osvos_resnet.py:25-27,135, so the full forward
    crashes; pinned by tools/make_golden_reference.py)."""
    params: Params = {}
    stats: Params = {}

    params['base_conv'] = _conv(sd, 'layer_base.0', bias=False)
    p, s = _bn(sd, 'layer_base.1')
    params['base_bn'], stats['base_bn'] = p, s

    n_convs = {'basic': 2, 'bottleneck': 3}[arch.block]
    for i, stage in enumerate(arch.stages):
        for j in range(len(stage)):
            src = f'layer_stages.{i}.{j}'
            bp: Params = {}
            bs: Params = {}
            for c in range(1, n_convs + 1):
                bp[f'conv{c}'] = _conv(sd, f'{src}.conv{c}', bias=False)
                p, s = _bn(sd, f'{src}.bn{c}')
                bp[f'bn{c}'], bs[f'bn{c}'] = p, s
            if f'{src}.downsample.0.weight' in sd:
                bp['downsample_conv'] = _conv(sd, f'{src}.downsample.0',
                                              bias=False)
                p, s = _bn(sd, f'{src}.downsample.1')
                bp['downsample_bn'], bs['downsample_bn'] = p, s
            params[f'stage{i}_block{j}'] = bp
            stats[f'stage{i}_block{j}'] = bs
    return params, stats


def osvos_resnet_checkpoint_to_variables(sd: Mapping[str, Any],
                                         arch: ResNetArch) -> Dict[str, Params]:
    """Convert a full reference OSVOS_RESNET state_dict to our variables.

    Reference module names (osvos_resnet.py:29-36): ``layer_base.{0,1}``,
    ``layer_stages.{i}.{j}.{conv1,bn1,conv2,bn2,downsample.{0,1}}``,
    ``side_prep.{i}``, ``upscale_side_prep.{i}``, ``score_dsn.{i}``,
    ``upscale_score_dsn.{i}``, ``layer_fuse``.
    """
    params, stats = osvos_resnet_trunk_to_params(sd, arch)

    for i in range(4):
        params[f'head{i}'] = {
            'side_prep': _conv(sd, f'side_prep.{i}'),
            'upscale_side_prep': _deconv(sd, f'upscale_side_prep.{i}'),
            'score_dsn': _conv(sd, f'score_dsn.{i}'),
            'upscale_score_dsn': _deconv(sd, f'upscale_score_dsn.{i}'),
        }
    params['layer_fuse'] = _conv(sd, 'layer_fuse')
    return {'params': params, 'batch_stats': stats}


def osvos_vgg_checkpoint_to_params(sd: Mapping[str, Any]) -> Params:
    """Convert a full reference OSVOS_VGG state_dict to our params.

    Reference names (osvos_vgg.py:50-56): ``stages.{i}.{k}`` Sequential with
    convs at even indices (conv,relu pairs; pools shift indices in stages>0),
    ``side_prep.{i}``, ``score_dsn.{i}``, ``upscale.{i}``, ``upscale_.{i}``,
    ``fuse``.
    """
    params: Params = {}
    for i, widths in enumerate(VGGArch().stages):
        conv_idxs = sorted(
            int(k.split('.')[2]) for k in sd
            if k.startswith(f'stages.{i}.') and k.endswith('.weight'))
        assert len(conv_idxs) == len(widths), (i, conv_idxs)
        for j, idx in enumerate(conv_idxs):
            params[f'stage{i}_conv{j}'] = _conv(sd, f'stages.{i}.{idx}')
    for i in range(4):
        params[f'head{i + 1}'] = {
            'side_prep': _conv(sd, f'side_prep.{i}'),
            'upscale_side_prep': _deconv(sd, f'upscale.{i}'),
            'score_dsn': _conv(sd, f'score_dsn.{i}'),
            'upscale_score_dsn': _deconv(sd, f'upscale_.{i}'),
        }
    params['fuse'] = _conv(sd, 'fuse')
    return params
