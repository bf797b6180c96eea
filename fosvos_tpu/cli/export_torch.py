"""Export a framework checkpoint back to a reference-compatible ``.pth``.

The inverse of the transparent ``.pth`` migration the providers do on
load: writes a torch ``state_dict`` under the reference's module names
(``models/export_torch.py``), so the original PyTorch code
(``network_provider.py:53-57`` / ``run_webcam.py:43-62``) can load a
model trained, adapted, pruned-to-a-regular-width, or distilled here.

Stock nets and mimic students export losslessly (the reference's
``OSVOS_RESNET(scale_down_exponent=k)`` rebuilds the student topology,
``osvos_resnet.py:20-27``); pruned nets with irregular per-layer widths
have no reference constructor — the state_dict is still written, but
loading it requires the reference's whole-module pickle route, so a
warning is logged.

Usage:
  fosvos-export-torch --checkpoint models/resnet18_11_11_blackswan_epoch-9999.npz \
      --output blackswan.pth [--network resnet18]
"""
from __future__ import annotations

import argparse
from pathlib import Path

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument('--checkpoint', required=True, type=str,
                        help='framework checkpoint (.npz, with optional '
                             '.arch.json next to it)')
    parser.add_argument('--output', required=True, type=str,
                        help='destination .pth path')
    parser.add_argument('--network', default='resnet18', type=str,
                        help='topology for checkpoints without an '
                             '.arch.json')
    args = parser.parse_args(argv)

    from fosvos_tpu.cli.common import load_checkpoint
    from fosvos_tpu.models import VGGArch, resnet_arch
    from fosvos_tpu.models import export_torch

    variables, arch = load_checkpoint(args.checkpoint, args.network)

    if not isinstance(arch, VGGArch):
        canonical = resnet_arch(arch.version, arch.scale_down_exponent,
                                arch.n_out)
        if arch != canonical:
            log.warning('non-canonical (pruned) widths: the reference has '
                        'no state_dict constructor for this topology — '
                        'the .pth is written but only loadable into a '
                        'matching module graph')

    export_torch.save_reference_checkpoint(args.output, variables, arch)
    log.info('exported %s -> %s (reference state_dict layout)',
             args.checkpoint, args.output)


if __name__ == '__main__':
    main()
