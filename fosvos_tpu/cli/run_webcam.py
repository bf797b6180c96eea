"""Streaming webcam/video inference — reference ``src/run_webcam.py``.

The serving path: per frame, {mean-subtract, forward, sigmoid, 0.5 threshold}
run as ONE jitted function so each frame costs a single host->device->host
round trip (the reference does preprocess and sigmoid on host,
``run_webcam.py:84,110-115``). Overlay compositing stays on host for display.

Usage: python -m fosvos_tpu.cli.run_webcam --variant resnet --version 18
       [--model-path models/resnet18.npz|.pth] [--video file.mp4]
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import click
import numpy as np

from fosvos_tpu.data.davis import DAVIS_MEAN_BGR
from fosvos_tpu.models import (OSVOSResNet, OSVOSVGG, VGGArch,
                               arch_from_json, resnet_arch)
from fosvos_tpu.models import import_torch
from fosvos_tpu.runtime import checkpoint
from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)

mean_value = np.array(DAVIS_MEAN_BGR, dtype=np.float32)


def get_network(variant: str, version: Optional[int],
                model_path: Optional[str], path_models: str = 'models'):
    """Model + variables per variant (reference run_webcam.py:43-62).
    Pruned/mimic topologies reload from arch JSON — no pickled modules."""
    import jax
    import jax.numpy as jnp

    if variant == 'vgg':
        model = OSVOSVGG()
        default = Path(path_models) / 'vgg16'
    elif variant == 'resnet':
        version = version if version in (18, 34, 50, 101, 152) else 18
        model = OSVOSResNet(arch=resnet_arch(version))
        default = Path(path_models) / f'resnet{version}'
    elif variant in ('prune', 'mimic'):
        default = Path(path_models) / f'{variant}_{version}'
        model = None  # arch comes from the checkpoint JSON
    else:
        raise ValueError(variant)

    path = Path(model_path) if model_path else default
    if str(path).endswith('.pth'):
        sd = import_torch.load_state_dict(str(path))
        if variant == 'vgg':
            variables = {'params':
                         import_torch.osvos_vgg_checkpoint_to_params(sd)}
        else:
            variables = import_torch.osvos_resnet_checkpoint_to_variables(
                sd, model.arch)
    else:
        d, stem = str(path.parent), path.name
        if stem.endswith('.npz'):
            stem = stem[:-4]
        variables, arch_json = checkpoint.load(d, stem)
        if model is None:
            if arch_json is None:
                raise ValueError(f'{path}: pruned/mimic checkpoint needs '
                                 'an .arch.json next to the .npz')
            arch = arch_from_json(arch_json)
            model = (OSVOSVGG(arch=arch) if isinstance(arch, VGGArch)
                     else OSVOSResNet(arch=arch))
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables


def make_segment_fn(model, variables, boolean_mask: bool,
                    bf16: bool = False, int8: bool = False,
                    fold_bn: bool = False):
    """(submit, fetch) pair for the jitted segmentation step.

    ``submit(frame_u8)`` enqueues one frame and returns a device future;
    ``fetch(fut)`` blocks and returns the numpy prediction. Splitting the
    two lets the streaming loop double-buffer: frame k executes on device
    while frame k-1's result crosses the link back — behind a high-latency
    tunnel this hides a full round trip per frame.

    ``bf16`` runs the trunk in bfloat16 (the TPU serving precision; masks
    thresholded at 0.5 are insensitive to it, fp32 stays the default for
    strict parity). ``int8`` serves post-training-quantized convs
    (``compress/quantize.py``), self-calibrating on the first frame.
    """
    import jax
    import jax.numpy as jnp

    from fosvos_tpu.compress import foldbn

    mean = jnp.asarray(mean_value)
    if fold_bn:
        # fold BNs into the conv kernels ahead of time (compress/foldbn.py;
        # folded_apply below is a no-op for trees without the collection)
        variables = foldbn.fold(model, variables)
    if bf16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32
            else a, variables)
    variables = jax.device_put(variables)

    def to_prob(outs):
        prob = jax.nn.sigmoid(outs[-1][0, ..., 0].astype(jnp.float32))
        if boolean_mask:
            prob = (prob >= 0.5).astype(jnp.float32)
        return prob

    def preprocess(frame_u8):
        x = frame_u8.astype(jnp.float32) - mean
        return x.astype(jnp.bfloat16) if bf16 else x

    if int8:
        from fosvos_tpu.compress import quantize
        state = {}

        @jax.jit
        def segment_q(variables, qtree, frame_u8):
            x = preprocess(frame_u8)
            return to_prob(foldbn.folded_apply(
                model, variables, x[None],
                apply_fn=lambda v, xx, **kw: quantize.quantized_apply(
                    model, v, qtree, xx, **kw)))

        def submit(frame_u8):
            if 'qtree' not in state:  # calibrate on the first live frame
                qp = quantize.build_qparams(
                    model, variables, [np.asarray(frame_u8)[None]],
                    preprocess=preprocess)
                state['qtree'] = jax.device_put(qp.tree())
            return segment_q(variables, state['qtree'], frame_u8)

        return submit, lambda fut: np.asarray(fut)

    @jax.jit
    def segment(frame_u8):
        return to_prob(foldbn.folded_apply(
            model, variables, preprocess(frame_u8)[None], train=False))

    return segment, lambda fut: np.asarray(fut)


def perform_overlay(input_img, prediction, overlay_alpha, overlay_color):
    """Additive color overlay (reference run_webcam.py:118-133)."""
    color_index = {'r': 2, 'g': 1, 'b': 0}[overlay_color]
    mask = np.zeros(input_img.shape, dtype=float)
    mask[..., color_index] = 255
    output = input_img + overlay_alpha * mask * prediction[..., np.newaxis]
    output[output > 255] = 255
    return output.astype('uint8')


@click.command()
@click.option('--variant', '-var',
              type=click.Choice(['vgg', 'resnet', 'prune', 'mimic']),
              default='resnet')
@click.option('--version', '-ver', type=int, default=None)
@click.option('--webcam', '-wc', type=int, default=0)
@click.option('--video', type=str, default=None,
              help='video file instead of a camera')
@click.option('--model-path', type=str, default=None)
@click.option('--mirror/--no-mirror', '-m/-nm', default=True)
@click.option('--use-network/--no-network', '-n/-nn', default=True)
@click.option('--overlay/--no-overlay', '-o/-no', default=True)
@click.option('--boolean-mask/--no-boolean-mask', '-bm/-nbm', default=True)
@click.option('--overlay-color', '-oc', type=click.Choice(['r', 'g', 'b']),
              default='r')
@click.option('--overlay-alpha', '-oa', type=float, default=1.0)
@click.option('--headless', is_flag=True, default=False,
              help='no display window; log FPS only')
@click.option('--max-frames', type=int, default=None)
@click.option('--bf16', is_flag=True, default=False,
              help='bfloat16 trunk (TPU serving precision)')
@click.option('--int8', is_flag=True, default=False,
              help='int8 post-training-quantized convs (calibrates on the '
                   'first frame)')
@click.option('--fold-bn', is_flag=True, default=False,
              help='fold BatchNorms into conv kernels (compress/foldbn.py; '
                   'faster serving, float rounding shifts slightly)')
@click.option('--pipeline/--no-pipeline', default=True, show_default=True,
              help='double-buffer: segment frame k on device while frame '
                   "k-1's result returns (display lags one frame; hides the "
                   'host<->device round trip)')
def main(variant, version, webcam, video, model_path, mirror, use_network,
         overlay, boolean_mask, overlay_color, overlay_alpha, headless,
         max_frames, bf16, int8, fold_bn, pipeline):
    import cv2

    submit = fetch = None
    if use_network:
        model, variables = get_network(variant, version, model_path)
        submit, fetch = make_segment_fn(model, variables, boolean_mask,
                                        bf16=bf16, int8=int8,
                                        fold_bn=fold_bn)

    last_shown = [None]

    def show(img, pred, start_time):
        if pred is not None:
            img = (perform_overlay(img, pred, overlay_alpha, overlay_color)
                   if overlay else (pred * 255).astype('uint8'))
        if not headless:
            cv2.imshow(variant, img)
            if cv2.waitKey(1) == 27:
                return False
        # throughput (display-to-display), correct in both pipeline modes;
        # per-frame latency additionally logged when it differs (pipelining
        # trades one frame of display lag for throughput)
        now = time.time()
        if last_shown[0] is not None:
            log.info('FPS: {0:0.1f}'.format(
                1.0 / max(now - last_shown[0], 1e-6)))
        else:
            log.info('FPS: {0:0.1f}'.format(
                1.0 / max(now - start_time, 1e-6)))
        last_shown[0] = now
        return True

    cam = cv2.VideoCapture(video if video else webcam)
    n = 0
    in_flight = None   # (img, device future, start_time) when pipelining
    while True:
        start_time = time.time()
        ret_val, img = cam.read()
        if not ret_val:
            break
        if mirror:
            img = cv2.flip(img, 1)
        if submit is None:
            if not show(img, None, start_time):
                break
        elif pipeline:
            fut = submit(img)             # enqueue frame k (async dispatch)
            if in_flight is not None:
                prev_img, prev_fut, prev_t = in_flight
                if not show(prev_img, fetch(prev_fut), prev_t):
                    in_flight = None
                    break
            in_flight = (img, fut, start_time)
        else:
            if not show(img, fetch(submit(img)), start_time):
                break
        n += 1
        if max_frames is not None and n >= max_frames:
            break
    if in_flight is not None:
        prev_img, prev_fut, prev_t = in_flight
        show(prev_img, fetch(prev_fut), prev_t)
    cam.release()
    if not headless:
        cv2.destroyAllWindows()


if __name__ == '__main__':
    main()
