"""Fleet serving CLI: segment many video streams, each with its own
adapted model, in one compiled dispatch per step (an unrolled scan over
the stacked params — vmap was measured and rejected, see
``evaluation/fleet.py``).

The reference's multi-stream story is one process per stream
(``run_webcam.py`` + manual job sharding); here the whole fleet is ONE
compiled program (``evaluation/fleet.FleetServer``): params stacked over a
stream axis, weights resident in HBM, per step only S uint8 frames go in
and S uint8 masks come out. On a multi-chip mesh the stream axis shards
communication-free (``--mesh``). A mixed-topology fleet (e.g. some streams
pruned or width-scaled students) runs one compiled program per distinct
arch, streams grouped automatically. ``--int8`` serves every group with
PTQ convs, each stream self-calibrated on its first frame.

``--elastic`` serves mixed-length videos: a stream leaves the fleet at its
own EOF (freeing its weight slot) and the rest keep going from the next
bucketed program — no recompile, no re-upload (``evaluation/elastic.py``).

Usage:
  python -m fosvos_tpu.cli.fleet \
      --stream walking.mp4=models/resnet18_11_11_walking_epoch-9999.npz \
      --stream blackswan.mp4=models/resnet18_11_11_blackswan_epoch-9999.npz \
      [--output-dir fleet_out] [--bf16] [--int8] [--max-frames N] [--mesh] \
      [--elastic]
"""
from __future__ import annotations

import time
from pathlib import Path

import click
import numpy as np

from fosvos_tpu.cli.common import (load_checkpoint as _load_stream_model,
                                   model_for_arch as _model_for_arch)
from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


@click.command()
@click.option('--stream', 'streams', multiple=True, required=True,
              help='VIDEO=CHECKPOINT.npz (repeatable, one per stream)')
@click.option('--output-dir', type=click.Path(file_okay=False),
              default=None, help='write per-stream mask PNGs here')
@click.option('--network', default='resnet18',
              type=click.Choice(['vgg16', 'resnet18', 'resnet34', 'resnet50',
                                 'resnet101', 'resnet152']),
              help='topology for checkpoints without an .arch.json '
                   '(pruned/mimic checkpoints carry their own)')
@click.option('--bf16', is_flag=True, default=False)
@click.option('--int8', is_flag=True, default=False,
              help='int8 PTQ serving; each stream self-calibrates on its '
                   'first frame')
@click.option('--mesh', 'use_mesh', is_flag=True, default=False,
              help="shard streams over a 'seq' device mesh")
@click.option('--max-frames', type=int, default=None)
@click.option('--loop/--no-loop', default=False,
              help='restart streams at EOF (otherwise stop at the first)')
@click.option('--elastic', is_flag=True, default=False,
              help='streams leave the fleet at their own EOF instead of '
                   'stopping everyone (evaluation/elastic.py: bucketed '
                   'programs, no recompile as the fleet shrinks)')
def main(streams, network, output_dir, bf16, int8, use_mesh, max_frames,
         loop, elastic):
    import cv2
    from fosvos_tpu.evaluation import fleet

    if elastic and loop:
        raise click.UsageError('--elastic is pointless with --loop '
                               '(looping streams never end)')

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

    # one compiled fleet program per distinct topology: streams of the same
    # arch fuse into one unrolled scan; a mixed fleet dispatches one program
    # per group each step (arch records are frozen dataclasses -> hashable)
    group_order, group_idx = [], {}
    for k, a in enumerate(archs):
        if a not in group_idx:
            group_idx[a] = len(group_order)
            group_order.append(a)
    groups = [[k for k, a in enumerate(archs) if a == g] for g in group_order]
    if use_mesh and len(groups) > 1:
        raise click.UsageError(
            'a mixed-arch fleet cannot shard over one --mesh (each topology '
            'is its own program); run per-arch fleets as separate processes')

    mesh = None
    if use_mesh:
        from fosvos_tpu.parallel import make_mesh
        mesh = make_mesh(('seq',))

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

    if elastic:
        _serve_elastic(caps, names, out_dirs, var_list, group_order, groups,
                       bf16, int8, mesh, max_frames)
        return

    servers, stackeds = [], []
    for arch, idx in zip(group_order, groups):
        server = fleet.FleetServer(_model_for_arch(arch), bf16=bf16,
                                   int8=int8, mesh=mesh)
        servers.append(server)
        stackeds.append(server.put_weights([var_list[k] for k in idx]))
    if len(groups) > 1:
        log.info('mixed-arch fleet: %d topology groups %s',
                 len(groups), [len(i) for i in groups])

    # serve loop, double-buffered (the run_webcam/serve pattern): dispatch
    # step n async, then — while the device runs — fence + write step n-1's
    # masks and decode step n+1's frames. Depth is exactly one step: _flush
    # always fences, so the host never runs ahead of the device queue.
    def _flush(pending) -> None:
        step_no, futs = pending
        fetched = [np.asarray(f) for f in futs]
        if out_dirs is None:
            return
        masks = [None] * len(caps)
        for group_masks, idx in zip(fetched, groups):
            for k, m in zip(idx, group_masks):
                masks[k] = m
        for d, m in zip(out_dirs, masks):
            cv2.imwrite(str(d / f'{step_no:05d}.png'), m)

    n, pending, t0 = 0, None, time.perf_counter()
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
        futs = [server.segment_async(stacked,
                                     np.stack([frames[k] for k in idx]))
                for server, stacked, idx in zip(servers, stackeds, groups)]
        if pending is not None:    # overlapped with the in-flight dispatch
            _flush(pending)
        pending = (n, futs)
        n += 1
        if n % 10 == 0:
            fps = n * len(caps) / (time.perf_counter() - t0)
            log.info('fleet: %d steps, %.1f frames/s aggregate over %d '
                     'streams', n, fps, len(caps))
    if pending is not None:
        _flush(pending)
    dt = time.perf_counter() - t0
    log.info('fleet done: %d steps x %d streams in %.2fs (%.1f frames/s '
             'aggregate)', n, len(caps), dt, n * len(caps) / max(dt, 1e-9))
    for c in caps:
        c.release()


def _serve_elastic(caps, names, out_dirs, var_list, group_order, groups,
                   bf16, int8, mesh, max_frames):
    """Elastic serve loop: each stream leaves the fleet at its own EOF.

    One :class:`evaluation.elastic.ElasticFleet` per arch group; a stream
    whose video ends frees its slot and the group keeps serving from the
    next (smaller) bucket — no recompile, no weight re-upload.
    """
    import cv2
    from fosvos_tpu.evaluation import elastic as elastic_mod

    # prime every stream with its first frame (also the int8 calibration
    # frame, matching the static fleet's self-calibration contract)
    cur = []
    for name, c in zip(names, caps):
        ok, frame = c.read()
        if not ok:
            raise click.UsageError(f'cannot read a frame from {name!r}')
        cur.append(frame)

    fleets = []
    for arch, idx in zip(group_order, groups):
        cap_n = len(idx)
        if mesh is not None:  # capacity must tile the 'seq' axis
            q = mesh.shape['seq']
            cap_n = -(-cap_n // q) * q
        ef = elastic_mod.ElasticFleet(_model_for_arch(arch), capacity=cap_n,
                                      bf16=bf16, int8=int8, mesh=mesh)
        slot_to_stream = {}
        for k in idx:
            slot = ef.add(var_list[k],
                          calib_frame=cur[k] if int8 else None)
            slot_to_stream[slot] = k
        fleets.append((ef, slot_to_stream))

    # double-buffered like the static loop: dispatch every group's step n
    # async, flush step n-1's masks and decode step n+1's frames while the
    # device runs. EOF churn issued mid-flight is safe — each group's
    # on-device gather snapshotted its active slots (parity-tested in
    # tests/test_evaluation.py).
    def _flush(pending) -> None:
        for writes, fut in pending:
            fetched = np.asarray(fut)
            if out_dirs is None:
                continue
            for (k, frame_no), m in zip(writes, fetched):
                cv2.imwrite(str(out_dirs[k] / f'{frame_no:05d}.png'), m)

    counts = [0] * len(caps)
    n, total, pending, t0 = 0, 0, None, time.perf_counter()
    while (any(s for _, s in fleets)
           and (max_frames is None or n < max_frames)):
        batch = []
        for ef, slot_to_stream in fleets:
            if not slot_to_stream:
                continue
            order = ef.active_slots
            fut = ef.segment_async(
                np.stack([cur[slot_to_stream[s]] for s in order]))
            writes = []
            for s in order:
                k = slot_to_stream[s]
                writes.append((k, counts[k]))
                counts[k] += 1
                total += 1
            batch.append((writes, fut))
        n += 1
        if pending is not None:    # overlapped with the in-flight dispatch
            _flush(pending)
        # advance each live stream; EOF -> the stream leaves its fleet
        for ef, slot_to_stream in fleets:
            for s in list(slot_to_stream):
                k = slot_to_stream[s]
                ok, frame = caps[k].read()
                if ok:
                    cur[k] = frame
                else:
                    ef.remove(s)
                    del slot_to_stream[s]
                    log.info('stream %s ended after %d frames; %d streams '
                             'remain', names[k], counts[k],
                             sum(len(s2) for _, s2 in fleets))
        pending = batch
        if n % 10 == 0:
            fps = total / (time.perf_counter() - t0)
            log.info('elastic fleet: %d steps, %.1f frames/s aggregate, '
                     '%d live streams', n, fps,
                     sum(len(s2) for _, s2 in fleets))
    if pending is not None:
        _flush(pending)
    dt = time.perf_counter() - t0
    log.info('elastic fleet done: %d frames over %d streams in %.2fs '
             '(%.1f frames/s aggregate)', total, len(caps), dt,
             total / max(dt, 1e-9))
    for c in caps:
        c.release()


if __name__ == '__main__':
    main()
