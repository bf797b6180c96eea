"""Torch checkpoint exporters — the inverse of ``import_torch``.

Lets a reference user round-trip: models trained/adapted/served in this
framework export to ``state_dict`` ``.pth`` files with the reference's
module names, so the original PyTorch code (``network_provider.py:53-63``
loads, ``run_webcam.py:43-62`` serves) can load them unchanged — useful
for A/B-ing against the reference implementation or migrating back.

Layout conversions (exact inverses of ``import_torch``, which is
parity-tested against torch in tests/test_ops.py, test_model_parity.py):
  conv   flax HWIO (kh,kw,in,out) -> torch (out,in,kh,kw) = transpose(3,2,0,1)
  deconv ours (k,k,out,in)        -> torch (in,out,kh,kw) = transpose(3,2,0,1)
  bn     scale/bias + batch_stats -> weight/bias/running_mean/running_var
         (+ ``num_batches_tracked`` zeros for modern-torch strict loads)

Round-trip identity is tested in tests/test_import_torch.py:
``import(export(variables)) == variables`` bit-for-bit.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from fosvos_tpu.models.arch import ResNetArch, VGGArch

Params = Dict[str, Any]


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _conv(out: Dict[str, np.ndarray], key: str, p: Mapping[str, Any]
          ) -> None:
    out[key + '.weight'] = _np(p['kernel']).transpose(3, 2, 0, 1)
    if 'bias' in p:
        out[key + '.bias'] = _np(p['bias'])


def _deconv(out: Dict[str, np.ndarray], key: str, p: Mapping[str, Any]
            ) -> None:
    out[key + '.weight'] = _np(p['kernel']).transpose(3, 2, 0, 1)


def _bn(out: Dict[str, np.ndarray], key: str, p: Mapping[str, Any],
        stats: Mapping[str, Any]) -> None:
    out[key + '.weight'] = _np(p['scale'])
    out[key + '.bias'] = _np(p['bias'])
    out[key + '.running_mean'] = _np(stats['mean'])
    out[key + '.running_var'] = _np(stats['var'])
    out[key + '.num_batches_tracked'] = np.zeros((), np.int64)


def osvos_resnet_variables_to_state_dict(variables: Mapping[str, Params],
                                         arch: ResNetArch
                                         ) -> Dict[str, np.ndarray]:
    """Our OSVOS-ResNet variables -> reference ``OSVOS_RESNET`` state_dict
    (module names per ``osvos_resnet.py:29-36``: ``layer_base.{0,1}``,
    ``layer_stages.{i}.{j}.*``, ``side_prep.{i}``,
    ``upscale_side_prep.{i}``, ``score_dsn.{i}``,
    ``upscale_score_dsn.{i}``, ``layer_fuse``)."""
    params = variables['params']
    stats = variables.get('batch_stats', {})
    sd: Dict[str, np.ndarray] = {}

    _conv(sd, 'layer_base.0', params['base_conv'])
    _bn(sd, 'layer_base.1', params['base_bn'], stats['base_bn'])

    n_convs = {'basic': 2, 'bottleneck': 3}[arch.block]
    for i, stage in enumerate(arch.stages):
        for j in range(len(stage)):
            bp = params[f'stage{i}_block{j}']
            bs = stats[f'stage{i}_block{j}']
            dst = f'layer_stages.{i}.{j}'
            for c in range(1, n_convs + 1):
                _conv(sd, f'{dst}.conv{c}', bp[f'conv{c}'])
                _bn(sd, f'{dst}.bn{c}', bp[f'bn{c}'], bs[f'bn{c}'])
            if 'downsample_conv' in bp:
                _conv(sd, f'{dst}.downsample.0', bp['downsample_conv'])
                _bn(sd, f'{dst}.downsample.1', bp['downsample_bn'],
                    bs['downsample_bn'])

    for i in range(4):
        hp = params[f'head{i}']
        _conv(sd, f'side_prep.{i}', hp['side_prep'])
        _deconv(sd, f'upscale_side_prep.{i}', hp['upscale_side_prep'])
        _conv(sd, f'score_dsn.{i}', hp['score_dsn'])
        _deconv(sd, f'upscale_score_dsn.{i}', hp['upscale_score_dsn'])
    _conv(sd, 'layer_fuse', params['layer_fuse'])
    return sd


def osvos_vgg_params_to_state_dict(params: Params
                                   ) -> Dict[str, np.ndarray]:
    """Our OSVOS-VGG params -> reference ``OSVOS_VGG`` state_dict.

    Sequential indices reproduce ``_make_layers_osvos``
    (``osvos_vgg.py:85-95``): stage 0 is [conv, relu]*2 (convs at 0, 2);
    stages 1-4 lead with a ceil-mode maxpool (convs at 1, 3, 5). Heads are
    ``side_prep.{i}`` / ``score_dsn.{i}`` / ``upscale.{i}`` (16ch) /
    ``upscale_.{i}`` (1ch) / ``fuse`` (``osvos_vgg.py:50-56``).
    """
    sd: Dict[str, np.ndarray] = {}
    for i, widths in enumerate(VGGArch().stages):
        base = 0 if i == 0 else 1   # stages > 0 lead with the maxpool
        for j in range(len(widths)):
            _conv(sd, f'stages.{i}.{base + 2 * j}',
                  params[f'stage{i}_conv{j}'])
    for i in range(4):
        hp = params[f'head{i + 1}']
        _conv(sd, f'side_prep.{i}', hp['side_prep'])
        _deconv(sd, f'upscale.{i}', hp['upscale_side_prep'])
        _conv(sd, f'score_dsn.{i}', hp['score_dsn'])
        _deconv(sd, f'upscale_.{i}', hp['upscale_score_dsn'])
    _conv(sd, 'fuse', params['fuse'])
    return sd


def save_reference_checkpoint(path: str, variables: Mapping[str, Params],
                              arch) -> None:
    """Write a ``.pth`` the reference's ``load_model``
    (``network_provider.py:53-57``) can consume: a state_dict of torch CPU
    tensors under the reference module names."""
    import torch
    if isinstance(arch, VGGArch):
        sd = osvos_vgg_params_to_state_dict(variables['params'])
    else:
        sd = osvos_resnet_variables_to_state_dict(variables, arch)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
