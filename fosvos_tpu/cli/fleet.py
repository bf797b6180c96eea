"""Fleet serving CLI: segment many video streams, each with its own
adapted model, in one vmapped dispatch per step.

The reference's multi-stream story is one process per stream
(``run_webcam.py`` + manual job sharding); here the whole fleet is ONE
compiled program (``evaluation/fleet.FleetServer``): params stacked over a
stream axis, weights resident in HBM, per step only S uint8 frames go in
and S uint8 masks come out. On a multi-chip mesh the stream axis shards
communication-free (``--mesh``).

Usage:
  python -m fosvos_tpu.cli.fleet \
      --stream walking.mp4=models/resnet18_11_11_walking_epoch-9999.npz \
      --stream blackswan.mp4=models/resnet18_11_11_blackswan_epoch-9999.npz \
      [--output-dir fleet_out] [--bf16] [--max-frames N] [--mesh]
"""
from __future__ import annotations

import time
from pathlib import Path

import click
import numpy as np

from fosvos_tpu.models import OSVOSResNet, ResNetArch, resnet_arch
from fosvos_tpu.runtime import checkpoint
from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def _load_stream_model(path: str, network: str):
    p = Path(path)
    d, stem = str(p.parent), p.name
    if stem.endswith('.npz'):
        stem = stem[:-4]
    variables, arch_json = checkpoint.load(d, stem)
    if arch_json is not None:
        return variables, ResNetArch.from_json(arch_json)
    if network == 'vgg16':
        return variables, 'vgg16'
    version = int(network.replace('resnet', ''))
    return variables, resnet_arch(version)


@click.command()
@click.option('--stream', 'streams', multiple=True, required=True,
              help='VIDEO=CHECKPOINT.npz (repeatable, one per stream)')
@click.option('--output-dir', type=click.Path(file_okay=False),
              default=None, help='write per-stream mask PNGs here')
@click.option('--network', default='resnet18',
              type=click.Choice(['vgg16', 'resnet18', 'resnet34']),
              help='topology for checkpoints without an .arch.json '
                   '(pruned/mimic checkpoints carry their own)')
@click.option('--bf16', is_flag=True, default=False)
@click.option('--mesh', 'use_mesh', is_flag=True, default=False,
              help="shard streams over a 'seq' device mesh")
@click.option('--max-frames', type=int, default=None)
@click.option('--loop/--no-loop', default=False,
              help='restart streams at EOF (otherwise stop at the first)')
def main(streams, network, output_dir, bf16, use_mesh, max_frames, loop):
    import cv2
    from fosvos_tpu.evaluation import fleet

    videos, var_list, archs = [], [], []
    for spec in streams:
        video, _, ckpt_path = spec.partition('=')
        if not ckpt_path:
            raise click.UsageError(f'--stream {spec!r}: expected '
                                   'VIDEO=CHECKPOINT')
        videos.append(video)
        variables, arch = _load_stream_model(ckpt_path, network)
        var_list.append(variables)
        archs.append(arch)
    if any(a != archs[0] for a in archs[1:]):
        raise click.UsageError('all fleet checkpoints must share one '
                               'topology (widths differ); run mixed-arch '
                               'fleets as separate processes')
    if archs[0] == 'vgg16':
        from fosvos_tpu.models import OSVOSVGG
        model = OSVOSVGG()
    else:
        model = OSVOSResNet(arch=archs[0])

    mesh = None
    if use_mesh:
        from fosvos_tpu.parallel import make_mesh
        mesh = make_mesh(('seq',))
    server = fleet.FleetServer(model, bf16=bf16, mesh=mesh)
    stacked = server.put_weights(var_list)

    caps = [cv2.VideoCapture(v) for v in videos]
    for v, c in zip(videos, caps):
        if not c.isOpened():
            raise click.UsageError(f'cannot open video {v!r}')
    names = [Path(v).stem or f'stream{k}' for k, v in enumerate(videos)]
    out_dirs = None
    if output_dir is not None:
        out_dirs = [Path(output_dir) / n for n in names]
        for d in out_dirs:
            d.mkdir(parents=True, exist_ok=True)

    n, t0 = 0, time.perf_counter()
    while max_frames is None or n < max_frames:
        frames = []
        for c in caps:
            ok, frame = c.read()
            if not ok and loop:
                c.set(cv2.CAP_PROP_POS_FRAMES, 0)
                ok, frame = c.read()
            if not ok:
                frames = None
                break
            frames.append(frame)
        if frames is None:
            break
        masks = server.segment(stacked, np.stack(frames))
        if out_dirs is not None:
            for d, m in zip(out_dirs, masks):
                cv2.imwrite(str(d / f'{n:05d}.png'), m)
        n += 1
        if n % 10 == 0:
            fps = n * len(caps) / (time.perf_counter() - t0)
            log.info('fleet: %d steps, %.1f frames/s aggregate over %d '
                     'streams', n, fps, len(caps))
    dt = time.perf_counter() - t0
    log.info('fleet done: %d steps x %d streams in %.2fs (%.1f frames/s '
             'aggregate)', n, len(caps), dt, n * len(caps) / max(dt, 1e-9))
    for c in caps:
        c.release()


if __name__ == '__main__':
    main()
