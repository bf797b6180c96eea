"""Adapt-and-serve CLI: one command from raw videos + first-frame
annotations to live multi-stream segmentation.

The reference needs three manual steps per video — ``train_online.py`` to
adapt the parent to the first annotated frame
(``/root/reference/src/train_online.py:23-50``), copying the checkpoint,
then one ``run_webcam.py`` process per stream. This CLI drives
:class:`evaluation.service.VOSService` instead: every ``--stream
VIDEO=FIRST_MASK.png`` joins the service (the compiled one-shot adaptation
— seconds on-chip for the full 10k-step reference budget; a cohort of
joins fans out over a ``'seq'`` mesh when chips allow), then all live
streams are served in one fleet dispatch per step, each stream leaving at
its own EOF without recompiles (``evaluation/elastic.py``).

Usage:
  fosvos-serve --parent models/resnet18_11_epoch-239.npz \\
      --stream swan.mp4=swan_frame0_mask.png \\
      --stream goat.mp4=goat_frame0_mask.png \\
      [--n-epochs 10000] [--bf16 | --int8 | --qat-int8] [--mesh] \\
      [--output-dir out] [--export-dir models] [--max-frames N]
"""
from __future__ import annotations

import time
from pathlib import Path

import click
import numpy as np

from fosvos_tpu.cli.common import arch_name, load_checkpoint, model_for_arch
from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


@click.command()
@click.option('--parent', required=True, type=click.Path(exists=True),
              help='offline-trained parent checkpoint (.npz) every '
                   'stream adapts from')
@click.option('--stream', 'streams', multiple=True, required=True,
              help='VIDEO=FIRST_MASK.png (repeatable; the mask annotates '
                   "the video's first frame)")
@click.option('--network', default='resnet18',
              type=click.Choice(['vgg16', 'resnet18', 'resnet34',
                                 'resnet50', 'resnet101', 'resnet152']),
              help='topology for parents without an .arch.json')
@click.option('--n-epochs', type=int, default=10000, show_default=True,
              help='adaptation step budget per join (reference: '
                   'train_online.py:147)')
@click.option('--avg-grad-every-n', type=int, default=5, show_default=True)
@click.option('--augment/--no-augment', default=True,
              help='adapt over the flip + multi-scale schedule')
@click.option('--bf16', is_flag=True, default=False,
              help='bf16 serving and bf16-activation adaptation (params/'
                   'optimizer/loss stay fp32, like train-online --bf16)')
@click.option('--int8', is_flag=True, default=False,
              help='int8 PTQ serving; streams self-calibrate on their '
                   'first frame')
@click.option('--qat-int8', is_flag=True, default=False,
              help='quantization-aware joins: adapt through the int8 '
                   'serving numerics (implies --int8)')
@click.option('--mesh', 'use_mesh', is_flag=True, default=False,
              help="shard serving (and cohort joins) over a 'seq' mesh")
@click.option('--capacity', type=int, default=None,
              help='fleet slot count (default: stream count, rounded up '
                   "to the mesh's 'seq' axis)")
@click.option('--output-dir', type=click.Path(file_okay=False),
              default=None, help='write per-stream mask PNGs here')
@click.option('--export-dir', type=click.Path(file_okay=False),
              default=None,
              help='persist each adapted model under the reference '
                   'checkpoint naming when its stream ends')
@click.option('--max-frames', type=int, default=None,
              help='stop after N serve steps (default: every stream EOF)')
@click.option('--seed', type=int, default=0, show_default=True)
def main(parent, streams, network, n_epochs, avg_grad_every_n, augment,
         bf16, int8, qat_int8, use_mesh, capacity, output_dir, export_dir,
         max_frames, seed):
    import cv2
    import jax
    from fosvos_tpu.evaluation.service import VOSService

    parent_vars, arch = load_checkpoint(parent, network)
    model = model_for_arch(arch)
    net_name = arch_name(arch)   # honest export naming for VGG/mimic parents
    parent_vars = jax.tree.map(np.asarray, parent_vars)

    videos, mask_paths = [], []
    for spec in streams:
        video, _, mask_path = spec.partition('=')
        if not mask_path:
            raise click.UsageError(f'--stream {spec!r}: expected '
                                   'VIDEO=FIRST_MASK.png')
        videos.append(video)
        mask_paths.append(mask_path)
    names = [Path(v).stem or f'stream{k}' for k, v in enumerate(videos)]
    dup = {n for n in names if names.count(n) > 1}
    if dup:   # paths sharing a basename would clobber each other's masks
        names = [f'{n}-{k}' if n in dup else n
                 for k, n in enumerate(names)]
        log.info('duplicate stream basenames %s disambiguated by index',
                 sorted(dup))

    caps = [cv2.VideoCapture(v) for v in videos]
    first_frames = []
    for v, c in zip(videos, caps):
        if not c.isOpened():
            raise click.UsageError(f'cannot open video {v!r}')
        ok, frame = c.read()
        if not ok:
            raise click.UsageError(f'cannot read a frame from {v!r}')
        first_frames.append(frame)
    first_masks = []
    for mp in mask_paths:
        m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        if m is None:
            raise click.UsageError(f'cannot read mask {mp!r}')
        first_masks.append(m)
    h, w = first_frames[0].shape[:2]
    for k, (f, m) in enumerate(zip(first_frames, first_masks)):
        if f.shape[:2] != (h, w) or m.shape != (h, w):
            raise click.UsageError(
                f'stream {names[k]!r}: frame {f.shape[:2]} / mask '
                f'{m.shape} do not match the fleet size {(h, w)}')

    mesh = None
    if use_mesh:
        from fosvos_tpu.parallel import make_mesh
        mesh = make_mesh(('seq',))
    cap_n = capacity if capacity is not None else len(videos)
    if mesh is not None:
        q = mesh.shape['seq']
        cap_n = -(-cap_n // q) * q

    svc = VOSService(model, parent_vars, capacity=cap_n,
                     n_epochs=n_epochs, avg_grad_every_n=avg_grad_every_n,
                     augment=augment, bf16=bf16, adapt_bf16=bf16,
                     int8=int8, qat_int8=qat_int8, mesh=mesh)

    t0 = time.perf_counter()
    slots, _ = svc.join_many(np.stack(first_frames),
                             np.stack(first_masks), seed=seed)
    log.info('adapted %d streams in %.1fs (%d steps each)',
             len(slots), time.perf_counter() - t0, n_epochs)
    slot_to_stream = {s: k for k, s in enumerate(slots)}

    out_dirs = None
    if output_dir is not None:
        out_dirs = [Path(output_dir) / n for n in names]
        for d in out_dirs:
            d.mkdir(parents=True, exist_ok=True)

    def _retire(slot: int) -> None:
        k = slot_to_stream[slot]
        if export_dir is not None:
            stem = svc.export_slot(slot, export_dir, net_name,
                                   sequence=names[k],
                                   epoch=n_epochs - 1)
            log.info('exported %s -> %s/%s.npz', names[k], export_dir,
                     stem)
        svc.leave(slot)
        del slot_to_stream[slot]
        log.info('stream %s ended after %d frames; %d streams remain',
                 names[k], counts[k], len(slot_to_stream))

    # serve loop, double-buffered: dispatch step k async, then — while the
    # device runs — write step k-1's masks to disk and decode step k+1's
    # frames (EOF retires the stream's slot; elastic — no recompile, the
    # rest keep going). Same overlap pattern as cli/run_webcam.py; on this
    # one-core host the decode+imwrite time is fully hidden.
    def _flush(pending) -> None:
        writes, fut = pending
        for (k, frame_no), m in zip(writes, np.asarray(fut)):
            if out_dirs is not None:
                cv2.imwrite(str(out_dirs[k] / f'{frame_no:05d}.png'), m)

    cur = list(first_frames)
    counts = [0] * len(videos)
    pending = None
    n, total, t1 = 0, 0, time.perf_counter()
    while slot_to_stream and (max_frames is None or n < max_frames):
        order = [s for s in svc.active_slots if s in slot_to_stream]
        fut = svc.segment_async(np.stack([cur[slot_to_stream[s]]
                                          for s in order]))
        writes = []
        for s in order:
            k = slot_to_stream[s]
            writes.append((k, counts[k]))
            counts[k] += 1
            total += 1
        n += 1
        if pending is not None:     # overlapped with the in-flight dispatch
            _flush(pending)
        for s in list(slot_to_stream):
            k = slot_to_stream[s]
            ok, frame = caps[k].read()
            if ok:
                cur[k] = frame
            else:
                _retire(s)
        pending = (writes, fut)
        if n % 10 == 0:
            fps = total / (time.perf_counter() - t1)
            log.info('serve: %d steps, %.1f frames/s aggregate, %d live '
                     'streams', n, fps, len(slot_to_stream))
    if pending is not None:
        _flush(pending)
    for s in list(slot_to_stream):   # --max-frames stop: still export
        _retire(s)
    dt = time.perf_counter() - t1
    log.info('serve done: %d masks over %d streams in %.2fs '
             '(%.1f frames/s aggregate)', total, len(videos), dt,
             total / max(dt, 1e-9))
    for c in caps:
        c.release()


if __name__ == '__main__':
    main()
