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
from fosvos_tpu.models import OSVOSResNet, OSVOSVGG, ResNetArch, resnet_arch
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
        version = 34 if version == 34 else 18
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
            model = OSVOSResNet(arch=ResNetArch.from_json(arch_json))
    variables = jax.tree.map(jnp.asarray, variables)
    return model, variables


def make_segment_fn(model, variables, boolean_mask: bool):
    import jax
    import jax.numpy as jnp

    mean = jnp.asarray(mean_value)

    @jax.jit
    def segment(frame_u8):
        x = frame_u8.astype(jnp.float32) - mean
        outs = model.apply(variables, x[None], train=False)
        prob = jax.nn.sigmoid(outs[-1][0, ..., 0])
        if boolean_mask:
            prob = (prob >= 0.5).astype(jnp.float32)
        return prob

    return lambda frame: np.asarray(segment(frame))


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
def main(variant, version, webcam, video, model_path, mirror, use_network,
         overlay, boolean_mask, overlay_color, overlay_alpha, headless,
         max_frames):
    import cv2

    segment = None
    if use_network:
        model, variables = get_network(variant, version, model_path)
        segment = make_segment_fn(model, variables, boolean_mask)

    cam = cv2.VideoCapture(video if video else webcam)
    n = 0
    while True:
        start_time = time.time()
        ret_val, img = cam.read()
        if not ret_val:
            break
        if mirror:
            img = cv2.flip(img, 1)
        if segment is not None:
            pred = segment(img)
            img = (perform_overlay(img, pred, overlay_alpha, overlay_color)
                   if overlay else (pred * 255).astype('uint8'))
        if not headless:
            cv2.imshow(variant, img)
            if cv2.waitKey(1) == 27:
                break
        log.info('FPS: {0:0.1f}'.format(1.0 / (time.time() - start_time)))
        n += 1
        if max_frames is not None and n >= max_frames:
            break
    cam.release()
    if not headless:
        cv2.destroyAllWindows()


if __name__ == '__main__':
    main()
