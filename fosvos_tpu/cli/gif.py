"""Results-PNG directories -> gif/mp4 — reference
``src/playground/gif_generator.py`` (16 fps, per sequence x variant, for the
prune/mimic sweeps)."""
from __future__ import annotations

from pathlib import Path

import click
import numpy as np

from fosvos_tpu.data.davis import TRAIN_SEQUENCES, VAL_SEQUENCES

sequences_all = sorted(set(TRAIN_SEQUENCES + VAL_SEQUENCES))


def convert_to_rgb(image: np.ndarray) -> np.ndarray:
    if image.ndim == 2:
        return np.repeat(image[:, :, None], 3, axis=2)
    return image


def dir_to_images(path: Path):
    import imageio
    files = sorted(map(str, path.iterdir()))
    return [convert_to_rgb(np.asarray(imageio.imread(f))) for f in files]


def generate_gif(path_input: Path, path_output_file: Path,
                 output_format: str, fps: int = 16) -> None:
    if path_output_file.exists():
        return
    try:
        import imageio
        files = dir_to_images(path_input)
        if output_format == 'gif':
            imageio.mimsave(str(path_output_file), files, fps=fps)
        elif output_format == 'mp4':
            from moviepy.editor import ImageSequenceClip
            ImageSequenceClip(files, fps=fps).write_videofile(
                str(path_output_file), fps=fps)
        else:
            raise ValueError('Unknown format: ' + output_format)
    except Exception as e:  # noqa: BLE001 — parity with reference behavior
        print('Skipped', str(path_output_file), 'because', str(e))


@click.command()
@click.option('--path-base-input', type=str, default='results/resnet18/11')
@click.option('--path-base-output', type=str, default='results/gifs')
@click.option('--output-format', type=click.Choice(['gif', 'mp4']),
              default='gif')
@click.option('--mode', type=click.Choice(['prune', 'mimic']),
              default='prune')
def convert_folder(path_base_input, path_base_output, output_format, mode):
    path_base_input = Path(path_base_input) / mode
    path_base_output = Path(path_base_output) / mode
    for sequence_name in sequences_all:
        path_output = path_base_output / sequence_name
        path_output.mkdir(parents=True, exist_ok=True)
        for path_variant in sorted(path_base_input.iterdir()):
            if mode == 'mimic':
                path_input = path_variant / '300' / sequence_name
            else:
                path_input = path_variant / sequence_name
            if path_input.exists():
                generate_gif(path_input,
                             path_output / (path_variant.name + '.'
                                            + output_format),
                             output_format)


if __name__ == '__main__':
    convert_folder()
