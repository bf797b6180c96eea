"""OSVOS-VGG16: the original OSVOS parent network, TPU-native.

Topology per reference ``osvos_vgg.py:17-95``:

* VGG-16 trunk as 5 stages ``[[64,64],[M,128,128],[M,256,256,256],
  [M,512,512,512],[M,512,512,512]]`` with ceil-mode 2x2 maxpool.
* For stages 1..4 a :class:`~fosvos_tpu.models.common.SideHead` whose deconv
  has ``kernel=2**(1+i), stride=2**i``.
* ``fuse``: 1x1 conv over the 4 concatenated 16-channel side branches.
* forward returns ``[side_out_1..4, fused]`` (5 logit maps at input size).

Layout is NHWC; outputs are ``(N, H, W, 1)``.
"""
from __future__ import annotations

from typing import Any, List

import jax
from flax import linen as nn

from fosvos_tpu.core import ops
from fosvos_tpu.models.arch import VGGArch
from fosvos_tpu.models.common import FuseParams, SideHead, conv_init


class OSVOSVGG(nn.Module):
    arch: VGGArch = VGGArch()
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        del train  # VGG variant has no batch norm (osvos_vgg.py:85-95)
        out_h, out_w = x.shape[1], x.shape[2]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        stages = self.arch.stages

        # stage 0: no pool, no side head
        for j, width in enumerate(stages[0]):
            x = nn.Conv(width, (3, 3), padding=1, kernel_init=conv_init,
                        dtype=self.dtype, name=f'stage0_conv{j}')(x)
            x = nn.relu(x)

        prep_ch = self.arch.side_prep_ch
        fuse = FuseParams((len(stages) - 1) * prep_ch, self.arch.n_out,
                          name='fuse')
        contribs: List[jax.Array] = []
        side_out: List[jax.Array] = []
        for i in range(1, len(stages)):
            x = ops.max_pool_ceil(x, 2, 2)
            for j, width in enumerate(stages[i]):
                x = nn.Conv(width, (3, 3), padding=1, kernel_init=conv_init,
                            dtype=self.dtype, name=f'stage{i}_conv{j}')(x)
                x = nn.relu(x)

            fw = fuse.kernel[0, 0, (i - 1) * prep_ch:i * prep_ch]
            c, so = SideHead(in_ch=stages[i][-1],
                             prep_ch=prep_ch,
                             n_out=self.arch.n_out,
                             up_kernel=2 ** (1 + i),
                             up_stride=2 ** i,
                             dtype=self.dtype,
                             name=f'head{i}')(x, out_h, out_w, fw)
            contribs.append(c)
            side_out.append(so)

        side_out.append(sum(contribs)
                        + fuse.bias.astype(contribs[0].dtype))
        return side_out
