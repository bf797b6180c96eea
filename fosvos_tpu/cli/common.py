"""Shared CLI helpers: the checkpoint -> (variables, arch, model)
resolution contract.

One place for the stem-stripping + ``runtime.checkpoint.load`` +
arch-JSON/``--network`` fallback that fleet/serve/export CLIs all need
(pruned/mimic checkpoints carry their own ``.arch.json``; stock
checkpoints resolve through the ``--network`` flag, mirroring the
reference's explicit constructors in ``run_webcam.py:43-62``).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

from fosvos_tpu.models import (OSVOSResNet, OSVOSVGG, VGGArch,
                               arch_from_json, resnet_arch)
from fosvos_tpu.runtime import checkpoint


def resolve_arch(arch_json: Optional[str], network: str):
    """Arch from a checkpoint's .arch.json, else the stock ``network``."""
    if arch_json is not None:
        return arch_from_json(arch_json)
    if network == 'vgg16':
        return VGGArch()
    return resnet_arch(int(network.replace('resnet', '')))


def model_for_arch(arch):
    return (OSVOSVGG(arch=arch) if isinstance(arch, VGGArch)
            else OSVOSResNet(arch=arch))


def arch_name(arch) -> str:
    """Reference network name for an arch ('vgg16' / 'resnetN') — the
    checkpoint naming contract's model-name field."""
    return 'vgg16' if isinstance(arch, VGGArch) else f'resnet{arch.version}'


def load_checkpoint(path, network: str) -> Tuple[Any, Any]:
    """Load ``path`` (.npz, optional sibling .arch.json) ->
    (variables, arch)."""
    p = Path(path)
    stem = p.name[:-4] if p.name.endswith('.npz') else p.name
    variables, arch_json = checkpoint.load(str(p.parent), stem)
    return variables, resolve_arch(arch_json, network)
