"""OSVOS-ResNet: the Fast-OSVOS re-architecture, TPU-native + width-explicit.

Topology per reference ``osvos_resnet.py:15-150``:

* stem: 7x7 s2 conv (no bias) + BN + ReLU + 3x3 s2 p1 maxpool
* 4 ResNet stages (BasicBlock for 18/34, Bottleneck for 50/101/152),
  stage strides (1, 2, 2, 2)
* each stage feeds a :class:`~fosvos_tpu.models.common.SideHead` with deconv
  ``kernel=2**(3+i), stride=2**(2+i)`` (base layer is already stride-4)
* ``layer_fuse``: 1x1 conv over the 4 concatenated side branches
* forward returns ``[side_out_0..3, fused]``

TPU-first deltas from the reference design:

* widths are an explicit :class:`~fosvos_tpu.models.arch.ResNetArch`
  (mimic ``scale_down_exponent`` AND arbitrary pruned widths are just configs)
* optional ``channel_masks`` zero out channels *in place of* shape-changing
  surgery, so iterative pruning keeps static shapes and one compiled graph;
  the mask is applied post-BN (and post-residual-add for block outputs), which
  is numerically identical to removing the channel for all downstream consumers.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fosvos_tpu.core import ops
from fosvos_tpu.models.arch import BlockWidths, ResNetArch, resnet_arch
from fosvos_tpu.models.common import (FuseParams, SideHead, TorchBatchNorm,
                                      conv_init)

Masks = Optional[Dict[str, jax.Array]]


def _mask(x: jax.Array, masks: Masks, key: str) -> jax.Array:
    if masks is not None and key in masks:
        return x * masks[key].astype(x.dtype)
    return x


class BasicBlock(nn.Module):
    """torchvision BasicBlock with explicit widths.

    conv3x3 -> BN -> ReLU -> conv3x3 -> BN -> (+residual) -> ReLU.
    A 1x1 downsample conv+BN is created when stride != 1 or the residual
    width differs from the block output width — the same rule the reference's
    pruning surgery re-applies after each prune (``prune.py:316-319``).
    """
    widths: BlockWidths
    stride: int = 1
    in_ch: int = 0  # informational; flax infers from input
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, masks: Masks,
                 prefix: str) -> jax.Array:
        mid, out = self.widths.convs
        residual = x

        y = nn.Conv(mid, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype, name='conv1')(x)
        y = TorchBatchNorm(name='bn1')(y, train)
        y = _mask(y, masks, f'{prefix}/conv1')
        y = nn.relu(y)

        y = nn.Conv(out, (3, 3), padding=1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv2')(y)
        y = TorchBatchNorm(name='bn2')(y, train)

        if self.stride != 1 or x.shape[-1] != out or \
                self.widths.force_downsample:
            residual = nn.Conv(out, (1, 1), strides=self.stride, padding=0,
                               use_bias=False, kernel_init=conv_init,
                               dtype=self.dtype,
                               name='downsample_conv')(x)
            residual = TorchBatchNorm(name='downsample_bn')(residual, train)

        y = nn.relu(y + residual)
        return _mask(y, masks, f'{prefix}/out')


class Bottleneck(nn.Module):
    """torchvision Bottleneck with explicit widths (1x1 -> 3x3 -> 1x1)."""
    widths: BlockWidths
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, masks: Masks,
                 prefix: str) -> jax.Array:
        w1, w2, out = self.widths.convs
        residual = x

        y = nn.Conv(w1, (1, 1), padding=0, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv1')(x)
        y = TorchBatchNorm(name='bn1')(y, train)
        y = _mask(y, masks, f'{prefix}/conv1')
        y = nn.relu(y)

        y = nn.Conv(w2, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype, name='conv2')(y)
        y = TorchBatchNorm(name='bn2')(y, train)
        y = _mask(y, masks, f'{prefix}/conv2')
        y = nn.relu(y)

        y = nn.Conv(out, (1, 1), padding=0, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype, name='conv3')(y)
        y = TorchBatchNorm(name='bn3')(y, train)

        if self.stride != 1 or x.shape[-1] != out or \
                self.widths.force_downsample:
            residual = nn.Conv(out, (1, 1), strides=self.stride, padding=0,
                               use_bias=False, kernel_init=conv_init,
                               dtype=self.dtype,
                               name='downsample_conv')(x)
            residual = TorchBatchNorm(name='downsample_bn')(residual, train)

        y = nn.relu(y + residual)
        return _mask(y, masks, f'{prefix}/out')


class OSVOSResNet(nn.Module):
    arch: ResNetArch
    # computation dtype (params stay float32); jnp.bfloat16 halves HBM
    # traffic for training/inference on TPU
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 channel_masks: Masks = None) -> List[jax.Array]:
        arch = self.arch
        if self.dtype is not None:
            x = x.astype(self.dtype)
        out_h, out_w = x.shape[1], x.shape[2]
        block_cls = BasicBlock if arch.block == 'basic' else Bottleneck

        # stem (osvos_resnet.py:90-96). (A space-to-depth rewrite of this
        # conv exists as ops.stem_conv_s2d; A/B on the target TPU showed the
        # XLA lowering is already on par, so the plain conv stays.)
        x = nn.Conv(arch.base_out, (7, 7), strides=2, padding=3,
                    use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                    name='base_conv')(x)
        x = TorchBatchNorm(name='base_bn')(x, train)
        x = _mask(x, channel_masks, 'base')
        x = nn.relu(x)
        x = ops.max_pool_torch(x, 3, 2, 1)

        fuse = FuseParams(len(arch.stages) * arch.side_prep_ch, arch.n_out,
                          name='layer_fuse')
        contribs: List[jax.Array] = []
        side_out: List[jax.Array] = []
        for i, stage in enumerate(arch.stages):
            for j, widths in enumerate(stage):
                stride = arch.stage_strides[i] if j == 0 else 1
                x = block_cls(widths=widths, stride=stride,
                              dtype=self.dtype,
                              name=f'stage{i}_block{j}')(
                    x, train, channel_masks, f'stage{i}_block{j}')

            fw = fuse.kernel[0, 0,
                             i * arch.side_prep_ch:(i + 1) * arch.side_prep_ch]
            c, so = SideHead(in_ch=stage[-1].out,
                             prep_ch=arch.side_prep_ch,
                             n_out=arch.n_out,
                             up_kernel=2 ** (3 + i),
                             up_stride=2 ** (2 + i),
                             dtype=self.dtype,
                             name=f'head{i}')(x, out_h, out_w, fw)
            contribs.append(c)
            side_out.append(so)

        side_out.append(sum(contribs)
                        + fuse.bias.astype(contribs[0].dtype))
        return side_out


def make_resnet(version: int = 18, scale_down_exponent: int = 0,
                dtype=None) -> OSVOSResNet:
    return OSVOSResNet(arch=resnet_arch(version, scale_down_exponent),
                       dtype=dtype)
