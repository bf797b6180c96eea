"""Explicit architecture configs.

The reference encodes architecture implicitly in ``nn.Module`` object graphs
and mutates them during pruning surgery (``prune.py:297-481``), then pickles
whole modules. Here architecture is an explicit, serializable config: pruning
becomes "edit the config + gather the surviving weights", and checkpoints are
always (config JSON, param pytree) — never pickled code.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class BlockWidths:
    """Channel widths of one residual block.

    ``convs``: output width of each conv in the block, in order. For a
    BasicBlock this is ``(mid, out)``; for a Bottleneck ``(w1, w2, out)``.
    The last entry is the block's output width (the residual width).

    ``force_downsample``: pruning can leave a block whose input and output
    widths are equal but whose surviving channel *sets* differ; the residual
    then needs an explicit gather (1x1 downsample) even though the width rule
    wouldn't create one (the reference hits the same case and creates a fresh
    downsample, ``prune.py:369-374``).
    """
    convs: Tuple[int, ...]
    force_downsample: bool = False

    @property
    def out(self) -> int:
        return self.convs[-1]


@dataclasses.dataclass(frozen=True)
class ResNetArch:
    """Width-explicit OSVOS-ResNet architecture.

    Mirrors reference ``osvos_resnet.py:15-150``: a ResNet trunk whose four
    stages each feed a side head (3x3 conv -> 16ch, frozen-bilinear deconv,
    1x1 score conv + deconv) plus a fuse conv. ``scale_down_exponent`` is the
    mimic-student width knob (``osvos_resnet.py:20-27``); arbitrary per-block
    widths support channel-pruned models.
    """
    version: int = 18
    block: str = 'basic'                       # 'basic' | 'bottleneck'
    base_out: int = 64                         # stem conv output width
    stages: Tuple[Tuple[BlockWidths, ...], ...] = ()
    side_prep_ch: int = 16                     # side_prep output channels
    n_out: int = 1                             # mask channels
    scale_down_exponent: int = 0               # bookkeeping for mimic sweeps

    @property
    def stage_strides(self) -> Tuple[int, ...]:
        return (1, 2, 2, 2)

    @property
    def side_input_widths(self) -> Tuple[int, ...]:
        return tuple(stage[-1].out for stage in self.stages)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2)

    @staticmethod
    def from_json(s: str) -> 'ResNetArch':
        d = json.loads(s)
        d['stages'] = tuple(
            tuple(BlockWidths(convs=tuple(b['convs']),
                              force_downsample=b.get('force_downsample',
                                                     False))
                  for b in stage)
            for stage in d['stages'])
        return ResNetArch(**d)


_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                 50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
_BOTTLENECK_VERSIONS = (50, 101, 152)


def resnet_arch(version: int = 18, scale_down_exponent: int = 0,
                n_out: int = 1) -> ResNetArch:
    """Canonical arch for a torchvision-matching ResNet trunk.

    Matches reference ``osvos_resnet.py:74-121``: side input widths
    ``[64,128,256,512] // 2**scale_down_exponent`` (the width multiplier),
    blocks per stage by version.
    """
    if version not in _STAGE_BLOCKS:
        raise ValueError(
            'Invalid version for resnet. Must be one of [18, 34, 50, 101, 152].')
    blocks = _STAGE_BLOCKS[version]
    is_bottleneck = version in _BOTTLENECK_VERSIONS
    expansion = 4 if is_bottleneck else 1
    sde = scale_down_exponent
    planes = [w // (2 ** sde) for w in (64, 128, 256, 512)]

    stages = []
    for stage_idx, n_blocks in enumerate(blocks):
        p = planes[stage_idx]
        stage = []
        for _ in range(n_blocks):
            if is_bottleneck:
                stage.append(BlockWidths(convs=(p, p, p * expansion)))
            else:
                stage.append(BlockWidths(convs=(p, p)))
        stages.append(tuple(stage))

    return ResNetArch(version=version,
                      block='bottleneck' if is_bottleneck else 'basic',
                      base_out=planes[0],
                      stages=tuple(stages),
                      n_out=n_out,
                      scale_down_exponent=sde)


# VGG-16 trunk stage config, reference osvos_vgg.py:20-24 ('M' = ceil maxpool).
VGG_STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)


@dataclasses.dataclass(frozen=True)
class VGGArch:
    stages: Tuple[Tuple[int, ...], ...] = VGG_STAGES
    side_prep_ch: int = 16
    n_out: int = 1

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> 'VGGArch':
        d = json.loads(s)
        d['stages'] = tuple(tuple(st) for st in d['stages'])
        return VGGArch(**d)


def arch_from_json(s: str):
    """Parse a checkpoint's ``.arch.json`` into the matching arch record.

    The two arch families are distinguished by their fields: only
    :class:`ResNetArch` carries ``version``/``block``.
    """
    d = json.loads(s)
    if 'version' in d or 'block' in d:
        return ResNetArch.from_json(s)
    return VGGArch.from_json(s)
