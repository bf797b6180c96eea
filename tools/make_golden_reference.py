"""Generate tests/fixtures/golden_reference.npz from the ACTUAL reference.

Runs the reference's own forward passes (``/root/reference/src/networks/
osvos_vgg.py:61-83``, ``osvos_resnet.py:42-72``) under torch CPU with
deterministic weights (``tests/golden_weights.py``) and records the output
maps. The committed npz lets ``tests/test_golden_reference.py`` assert our
flax models reproduce the reference implementation itself — not a
spec-rebuilt stand-in — without needing torch-side reference code at test
time. Run once (and after any upstream reference change):

    python tools/make_golden_reference.py

Environment shims (this image has no torchvision and the reference's
``config/mypath.py`` is a user-created file that does not exist):

* ``torchvision.models.resnet.BasicBlock`` is stubbed with the standard
  residual block (torchvision 0.2 layout: conv3x3-bn-relu-conv3x3-bn +
  identity/downsample, attribute names ``conv1/bn1/conv2/bn2/downsample``
  — the names matter, they define the state_dict keys our importer maps).
  The zoo constructors (``vgg16``/``resnet18``/...) are never called with
  ``pretrained=0``/``False``, so they are inert placeholders.
* ``config.mypath.Path`` is an empty placeholder (only used by the caffe
  loading path, not taken here).

Only fixture OUTPUTS are committed; no reference code is copied.
"""
import json
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.golden_weights import (build_state_dict, checksums,  # noqa: E402
                                  golden_input)


class _BasicBlock(nn.Module):
    """torchvision 0.2 BasicBlock (the reference pins torch 0.4 /
    torchvision 0.2, reference README.md:8-11): used structurally by
    OSVOS_RESNET._make_layer; only the module/attribute layout matters here
    because all weights are overwritten before the forward."""
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, kernel_size=3,
                               stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, kernel_size=3, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _Bottleneck(nn.Module):
    """torchvision Bottleneck (1x1 -> 3x3(stride) -> 1x1, expansion 4).

    Stride placement: torchvision's ResNet was ported from fb.resnet.torch,
    which documents deviating from the original Caffe ResNet by putting the
    stride in the 3x3 conv ("ResNet v1.5"); the torchvision pretrained
    resnet50 weights published in 2017 (torch 0.4 / torchvision 0.2 era,
    the reference's pin) still load into today's definition and reproduce
    their original accuracy, so the topology — stride on conv2 — has never
    changed. Attribute names conv1/bn1/conv2/bn2/conv3/bn3/downsample are
    the state_dict contract."""
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, kernel_size=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, kernel_size=3, stride=stride,
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, kernel_size=1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _install_shims():
    import logging

    # colorlog isn't installed; the reference's util/logger.py only needs
    # these three names and we don't care about pretty output here
    cl = types.ModuleType('colorlog')

    class _Fmt(logging.Formatter):
        def __init__(self, fmt, *a, **k):
            super().__init__('%(levelname)s [%(name)s] %(message)s')

    cl.ColoredFormatter = _Fmt
    cl.StreamHandler = logging.StreamHandler
    cl.getLogger = logging.getLogger
    sys.modules['colorlog'] = cl

    tv = types.ModuleType('torchvision')
    tvm = types.ModuleType('torchvision.models')
    tvr = types.ModuleType('torchvision.models.resnet')
    tvr.BasicBlock = _BasicBlock
    tvr.Bottleneck = _Bottleneck
    for name in ('resnet18', 'resnet34', 'resnet50', 'resnet101',
                 'resnet152', 'vgg16'):
        setattr(tvm, name, None)   # only called with pretrained truthy
    tvm.resnet = tvr
    tv.models = tvm
    sys.modules.update({'torchvision': tv, 'torchvision.models': tvm,
                        'torchvision.models.resnet': tvr})

    mypath = types.ModuleType('config.mypath')

    class Path:                    # placeholder; caffe path not taken
        pass

    mypath.Path = Path
    sys.modules['config.mypath'] = mypath
    sys.path.insert(0, '/root/reference/src')


def _load_golden_weights(module: nn.Module, family: str):
    """Overwrite every parameter/buffer with its deterministic array and
    return the [(key, shape), ...] manifest."""
    manifest = []
    sd = module.state_dict()
    for key, tensor in sd.items():
        if key.endswith('num_batches_tracked'):
            continue
        manifest.append((key, list(tensor.shape)))
    new_sd = build_state_dict(family, manifest)
    with torch.no_grad():
        for key, arr in new_sd.items():
            sd[key].copy_(torch.from_numpy(arr))
    module.load_state_dict(sd)
    return manifest, new_sd


def main():
    _install_shims()
    from networks.osvos_vgg import OSVOS_VGG
    from networks.osvos_resnet import OSVOS_RESNET

    x = golden_input()
    tx = torch.from_numpy(x)
    out = {'input': x}

    vgg = OSVOS_VGG(pretrained=0)
    manifest, sd = _load_golden_weights(vgg, 'vgg16')
    out['vgg16/manifest'] = json.dumps(manifest)
    out['vgg16/checksums'] = checksums(sd, manifest)
    vgg.eval()
    with torch.no_grad():
        outs = vgg(tx)
    assert len(outs) == 5
    for i, o in enumerate(outs):
        o = o.numpy()
        assert np.isfinite(o).all()
        out[f'vgg16/out{i}'] = o
    print('vgg16: 5 outputs,', out['vgg16/out4'].shape,
          'peak', max(float(np.abs(out[f"vgg16/out{i}"]).max())
                      for i in range(5)))

    # full forwards for every BasicBlock topology the pipelines serve:
    # resnet18/34 (zoo) and the width-multiplier student the whole
    # mimic/prune story rides on (scale_down_exponent,
    # osvos_resnet.py:25-27; reference mimic sweeps sde 0..6)
    resnet_cases = [('resnet18', dict(version=18)),
                    ('resnet34', dict(version=34)),
                    ('resnet18sde3', dict(version=18,
                                          scale_down_exponent=3))]
    for family, kwargs in resnet_cases:
        net = OSVOS_RESNET(pretrained=False, **kwargs)
        manifest, sd = _load_golden_weights(net, family)
        out[f'{family}/manifest'] = json.dumps(manifest)
        out[f'{family}/checksums'] = checksums(sd, manifest)
        net.eval()                 # BN running stats (from the fixture)
        with torch.no_grad():
            outs = net(tx)
        for i, o in enumerate(outs):
            o = o.numpy()
            assert np.isfinite(o).all()
            out[f'{family}/out_eval{i}'] = o
        # the reference never calls net.eval() at test time
        # (experiment_helper.py:20-64), so inference actually runs
        # train-mode BN (batch statistics) — pin that mode too
        net.train()
        with torch.no_grad():
            outs = net(tx)
        for i, o in enumerate(outs):
            o = o.numpy()
            assert np.isfinite(o).all()
            out[f'{family}/out_train{i}'] = o
        print(f'{family}: 5+5 outputs,', out[f'{family}/out_eval4'].shape)

    # resnet50 (Bottleneck): the reference's FULL forward is broken for
    # every bottleneck version — _make_osvos_layers wires side_prep with
    # in_channels = [64,128,256,512] (osvos_resnet.py:25-27,135) while the
    # bottleneck stages emit planes * expansion = [256,512,1024,2048]
    # (osvos_resnet.py:111-117), so side_prep[0] crashes on its 256-channel
    # input. Pin the TRUNK (layer_base + 4 stages — internally consistent)
    # and record the crash so the defect is a checked fact, not a claim.
    net = OSVOS_RESNET(pretrained=False, version=50)
    manifest, sd = _load_golden_weights(net, 'resnet50')
    out['resnet50/manifest'] = json.dumps(manifest)
    out['resnet50/checksums'] = checksums(sd, manifest)
    net.eval()
    with torch.no_grad():
        try:
            net(tx)
            raise AssertionError(
                'reference resnet50 full forward unexpectedly succeeded — '
                'retire the trunk-only fixture and pin the full outputs')
        except RuntimeError as e:
            out['resnet50/full_forward_error'] = str(e)
        h = net.layer_base(tx)
        for i, stage in enumerate(net.layer_stages):
            h = stage(h)
            o = h.numpy()
            assert np.isfinite(o).all()
            out[f'resnet50/trunk_eval{i}'] = o
    print('resnet50: trunk stages,',
          [out[f'resnet50/trunk_eval{i}'].shape for i in range(4)],
          '| full forward crashes as expected:',
          out['resnet50/full_forward_error'][:60], '...')

    dest = os.path.join(REPO, 'tests', 'fixtures', 'golden_reference.npz')
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    print('wrote', dest, f'{os.path.getsize(dest) / 1024:.0f} KiB')


if __name__ == '__main__':
    main()
