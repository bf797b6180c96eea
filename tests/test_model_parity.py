"""End-to-end numerical parity: fosvos_tpu models vs torch reference topology.

Builds the OSVOS architectures directly in torch.nn (from the published spec:
reference ``osvos_vgg.py:17-95`` / ``osvos_resnet.py:15-150``), loads
*our* randomly-initialized parameters into the torch modules, and asserts the
forward passes agree. This pins down conv/deconv layout conversion, ceil-mode
pooling, BN semantics, and center-crop offsets in one shot.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fosvos_tpu.core import ops
from fosvos_tpu.models import OSVOSVGG, make_resnet


def to_torch_conv(conv: tnn.Conv2d, p):
    conv.weight.data = torch.as_tensor(
        np.asarray(p['kernel']).transpose(3, 2, 0, 1))
    if conv.bias is not None:
        conv.bias.data = torch.as_tensor(np.asarray(p['bias']))


def to_torch_deconv(deconv: tnn.ConvTranspose2d, p):
    # ours (k,k,out,in) -> torch (in,out,k,k)
    deconv.weight.data = torch.as_tensor(
        np.asarray(p['kernel']).transpose(3, 2, 0, 1))


def to_torch_bn(bn: tnn.BatchNorm2d, p, stats):
    bn.weight.data = torch.as_tensor(np.asarray(p['scale']))
    bn.bias.data = torch.as_tensor(np.asarray(p['bias']))
    bn.running_mean.data = torch.as_tensor(np.asarray(stats['mean']))
    bn.running_var.data = torch.as_tensor(np.asarray(stats['var']))


def torch_center_crop(x, height, width):
    crop_h = torch.FloatTensor([x.size()[2]]).sub(height).div(-2)
    crop_w = torch.FloatTensor([x.size()[3]]).sub(width).div(-2)
    return F.pad(x, [crop_w.ceil().int()[0], crop_w.floor().int()[0],
                     crop_h.ceil().int()[0], crop_h.floor().int()[0]])


class TorchSideHead(tnn.Module):
    def __init__(self, in_ch, prep_ch, n_out, k, s):
        super().__init__()
        self.side_prep = tnn.Conv2d(in_ch, prep_ch, 3, padding=1)
        self.upscale = tnn.ConvTranspose2d(prep_ch, prep_ch, k, stride=s,
                                           bias=False)
        self.score_dsn = tnn.Conv2d(prep_ch, n_out, 1)
        self.upscale_ = tnn.ConvTranspose2d(n_out, n_out, k, stride=s,
                                            bias=False)

    def forward(self, x, h, w):
        prep = self.side_prep(x)
        side = torch_center_crop(self.upscale(prep), h, w)
        so = torch_center_crop(self.upscale_(self.score_dsn(prep)), h, w)
        return side, so

    def load(self, hp):
        to_torch_conv(self.side_prep, hp['side_prep'])
        to_torch_deconv(self.upscale, hp['upscale_side_prep'])
        to_torch_conv(self.score_dsn, hp['score_dsn'])
        to_torch_deconv(self.upscale_, hp['upscale_score_dsn'])


def test_vgg_forward_parity():
    x = np.random.RandomState(0).randn(1, 65, 97, 3).astype(np.float32) * 50

    model = OSVOSVGG()
    variables = model.init(jax.random.PRNGKey(42), jnp.asarray(x))
    outs_jax = model.apply(variables, jnp.asarray(x))
    params = variables['params']

    # torch build (spec: osvos_vgg.py:20-24,42-56,85-95)
    cfg = [(64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
           (512, 512, 512)]
    in_ch = [3, 64, 128, 256, 512]
    stages, heads = [], []
    for i, widths in enumerate(cfg):
        convs = []
        c = in_ch[i]
        for w in widths:
            convs.append(tnn.Conv2d(c, w, 3, padding=1))
            c = w
        stages.append(convs)
        if i > 0:
            heads.append(TorchSideHead(widths[-1], 16, 1, 2 ** (1 + i), 2 ** i))
    fuse = tnn.Conv2d(64, 1, 1)

    for i, convs in enumerate(stages):
        for j, conv in enumerate(convs):
            to_torch_conv(conv, params[f'stage{i}_conv{j}'])
    for i, head in enumerate(heads):
        head.load(params[f'head{i + 1}'])
    to_torch_conv(fuse, params['fuse'])

    with torch.no_grad():
        t = torch.as_tensor(x).permute(0, 3, 1, 2)
        h, w = t.shape[2], t.shape[3]
        for j, conv in enumerate(stages[0]):
            t = F.relu(conv(t))
        side, side_out = [], []
        for i in range(1, 5):
            t = F.max_pool2d(t, 2, 2, ceil_mode=True)
            for conv in stages[i]:
                t = F.relu(conv(t))
            s, so = heads[i - 1](t, h, w)
            side.append(s)
            side_out.append(so)
        fused = fuse(torch.cat(side, dim=1))
        side_out.append(fused)

    for got, want in zip(outs_jax, side_out):
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


class TorchBasicBlock(tnn.Module):
    def __init__(self, in_ch, mid, out, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, mid, 3, stride=stride, padding=1,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, out, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or in_ch != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)

    def load(self, bp, bs):
        to_torch_conv(self.conv1, bp['conv1'])
        to_torch_bn(self.bn1, bp['bn1'], bs['bn1'])
        to_torch_conv(self.conv2, bp['conv2'])
        to_torch_bn(self.bn2, bp['bn2'], bs['bn2'])
        if self.downsample is not None:
            to_torch_conv(self.downsample[0], bp['downsample_conv'])
            to_torch_bn(self.downsample[1], bp['downsample_bn'],
                        bs['downsample_bn'])


def _build_and_load_torch_resnet18(variables):
    params, stats = variables['params'], variables['batch_stats']
    base_conv = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    base_bn = tnn.BatchNorm2d(64)
    to_torch_conv(base_conv, params['base_conv'])
    to_torch_bn(base_bn, params['base_bn'], stats['base_bn'])

    blocks = []
    in_ch = 64
    for i, planes in enumerate([64, 128, 256, 512]):
        for j in range(2):
            stride = (1 if i == 0 else 2) if j == 0 else 1
            blk = TorchBasicBlock(in_ch, planes, planes, stride)
            blk.load(params[f'stage{i}_block{j}'], stats[f'stage{i}_block{j}'])
            blocks.append((i, blk))
            in_ch = planes

    heads = []
    for i, planes in enumerate([64, 128, 256, 512]):
        head = TorchSideHead(planes, 16, 1, 2 ** (3 + i), 2 ** (2 + i))
        head.load(params[f'head{i}'])
        heads.append(head)
    fuse = tnn.Conv2d(64, 1, 1)
    to_torch_conv(fuse, params['layer_fuse'])
    return base_conv, base_bn, blocks, heads, fuse


def _torch_resnet18_forward(x, modules, train):
    base_conv, base_bn, blocks, heads, fuse = modules
    t = torch.as_tensor(x).permute(0, 3, 1, 2)
    h, w = t.shape[2], t.shape[3]
    t = F.max_pool2d(F.relu(base_bn(base_conv(t))), 3, 2, padding=1)
    side, side_out = [], []
    for i in range(4):
        for si, blk in blocks:
            if si == i:
                t = blk(t)
        s, so = heads[i](t, h, w)
        side.append(s)
        side_out.append(so)
    side_out.append(fuse(torch.cat(side, dim=1)))
    return side_out


def test_resnet18_forward_parity_eval():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 65, 97, 3).astype(np.float32) * 50

    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x), train=False)
    # randomize running stats so BN mapping bugs can't hide behind 0/1 stats
    stats = jax.tree.map(
        lambda a: jnp.asarray(np.abs(rng.randn(*a.shape)) + 0.5, a.dtype),
        variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}

    outs_jax = model.apply(variables, jnp.asarray(x), train=False)

    modules = _build_and_load_torch_resnet18(variables)
    for _, m in [(0, modules[0]), (0, modules[1]), (0, modules[4])]:
        m.eval()
    for _, blk in modules[2]:
        blk.eval()
    for head in modules[3]:
        head.eval()
    with torch.no_grad():
        side_out = _torch_resnet18_forward(x, modules, train=False)

    for got, want in zip(outs_jax, side_out):
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


def test_resnet18_train_mode_parity_and_stat_update():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 33, 49, 3).astype(np.float32) * 10

    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(9), jnp.asarray(x), train=False)
    outs_jax, mutated = model.apply(
        variables, jnp.asarray(x), train=True, mutable=['batch_stats'])

    modules = _build_and_load_torch_resnet18(variables)
    side_out = _torch_resnet18_forward(x, modules, train=True)

    for got, want in zip(outs_jax, side_out):
        want = want.detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)

    # running-stat update parity (momentum 0.1, unbiased var) on the stem BN
    base_bn = modules[1]
    np.testing.assert_allclose(
        np.asarray(mutated['batch_stats']['base_bn']['mean']),
        base_bn.running_mean.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated['batch_stats']['base_bn']['var']),
        base_bn.running_var.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_resnet_channel_masks_zero_outputs():
    """Masked channels must be exactly zero at the masked site."""
    x = jnp.asarray(np.random.RandomState(3).randn(1, 33, 49, 3), jnp.float32)
    model = make_resnet(18)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    mask = jnp.ones((64,)).at[:10].set(0.0)
    masks = {'stage0_block0/conv1': mask}
    outs = model.apply(variables, x, train=False, channel_masks=masks)
    # forward still works and produces valid shapes
    assert all(o.shape == (1, 33, 49, 1) for o in outs)


def test_bf16_compute_close_to_fp32():
    """Mixed precision: bf16 compute dtype, fp32 params; outputs must track
    the fp32 model within bf16 tolerance and grads stay fp32."""
    import jax.numpy as jnp
    from fosvos_tpu.models import OSVOSResNet, resnet_arch
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 33, 49, 3).astype(np.float32) * 30)
    arch = resnet_arch(18, scale_down_exponent=3)
    m32 = OSVOSResNet(arch=arch)
    m16 = OSVOSResNet(arch=arch, dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), x, train=False)
    o32 = m32.apply(v, x, train=False)
    o16 = m16.apply(v, x, train=False)
    assert o16[-1].dtype == jnp.bfloat16
    scale = float(jnp.abs(o32[-1]).max()) + 1e-9
    assert float(jnp.abs(o16[-1].astype(jnp.float32) - o32[-1]).max()) \
        / scale < 0.05

    def loss(p):
        outs, _ = m16.apply({'params': p, 'batch_stats': v['batch_stats']},
                            x, train=True, mutable=['batch_stats'])
        return jnp.sum(outs[-1].astype(jnp.float32) ** 2)
    g = jax.grad(loss)(v['params'])
    leaf = jax.tree.leaves(g)[0]
    assert leaf.dtype == jnp.float32
    assert bool(jnp.isfinite(leaf).all())


class TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, w1, w2, out, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, w1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w1)
        self.conv2 = tnn.Conv2d(w1, w2, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(w2)
        self.conv3 = tnn.Conv2d(w2, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or in_ch != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)

    def load(self, bp, bs):
        for c in (1, 2, 3):
            to_torch_conv(getattr(self, f'conv{c}'), bp[f'conv{c}'])
            to_torch_bn(getattr(self, f'bn{c}'), bp[f'bn{c}'], bs[f'bn{c}'])
        if self.downsample is not None:
            to_torch_conv(self.downsample[0], bp['downsample_conv'])
            to_torch_bn(self.downsample[1], bp['downsample_bn'],
                        bs['downsample_bn'])


def test_bottleneck_block_parity():
    """Bottleneck (ResNet-50 family) block vs torch, eval mode."""
    from fosvos_tpu.models.arch import BlockWidths
    from fosvos_tpu.models.resnet import Bottleneck

    rng = np.random.RandomState(6)
    x = rng.randn(1, 17, 23, 32).astype(np.float32) * 5

    blk = Bottleneck(widths=BlockWidths(convs=(8, 8, 32)), stride=2)
    variables = blk.init(jax.random.PRNGKey(3), jnp.asarray(x), False, None,
                         'b')
    stats = jax.tree.map(
        lambda a: jnp.asarray(np.abs(rng.randn(*a.shape)) + 0.5, a.dtype),
        variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': stats}
    got = blk.apply(variables, jnp.asarray(x), False, None, 'b')

    tb = TorchBottleneck(32, 8, 8, 32, stride=2)
    tb.load(variables['params'], variables['batch_stats'])
    tb.eval()
    with torch.no_grad():
        want = tb(torch.as_tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got),
                               want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-5)
