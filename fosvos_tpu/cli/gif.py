"""Render result-mask directories as gif/mp4 animations.

Capability parity with the reference's ``src/playground/gif_generator.py``
(results-PNG dirs -> 16 fps animations for eyeballing prune/mimic sweeps),
re-designed for this framework's results contract: instead of hardcoding one
model/variant root and per-mode directory quirks, ``convert-folder`` walks an
arbitrary results tree (the ``results/<model>/<variant>/.../<seq>/<frame>.png``
layout written by ``fosvos_tpu.evaluation.experiment``) and renders one
animation per leaf image directory, mirroring the tree under the output root.
"""
from __future__ import annotations

from pathlib import Path
from typing import Iterator, List

import click
import numpy as np

IMAGE_SUFFIXES = ('.png', '.jpg', '.jpeg')


def convert_to_rgb(image: np.ndarray) -> np.ndarray:
    if image.ndim == 2:
        return np.repeat(image[:, :, None], 3, axis=2)
    return image


def dir_to_images(path: Path) -> List[np.ndarray]:
    import imageio
    files = sorted(p for p in path.iterdir()
                   if p.suffix.lower() in IMAGE_SUFFIXES)
    return [convert_to_rgb(np.asarray(imageio.imread(str(f))))
            for f in files]


def generate_gif(path_input: Path, path_output_file: Path,
                 output_format: str, fps: int = 16,
                 overwrite: bool = False) -> bool:
    """Render one directory of frames; returns True if a file was written."""
    if path_output_file.exists() and not overwrite:
        return False
    try:
        import imageio
        frames = dir_to_images(path_input)
        if not frames:
            return False
        if output_format == 'gif':
            imageio.mimsave(str(path_output_file), frames,
                            duration=1000.0 / fps)
        elif output_format == 'mp4':
            from moviepy.editor import ImageSequenceClip
            ImageSequenceClip(frames, fps=fps).write_videofile(
                str(path_output_file), fps=fps, logger=None)
        else:
            raise ValueError('Unknown format: ' + output_format)
        return True
    except Exception as e:  # noqa: BLE001 — skip-and-continue over a sweep
        print('Skipped', str(path_output_file), 'because', str(e))
        return False


def iter_frame_dirs(root: Path) -> Iterator[Path]:
    """Yield every directory under ``root`` that directly contains frames."""
    if any(p.suffix.lower() in IMAGE_SUFFIXES for p in root.iterdir()
           if p.is_file()):
        yield root
    for child in sorted(p for p in root.iterdir() if p.is_dir()):
        yield from iter_frame_dirs(child)


@click.command()
@click.option('--results-dir', type=click.Path(exists=True, file_okay=False),
              default='results', show_default=True,
              help='Root of a results tree (any depth of '
                   'model/variant/sequence directories).')
@click.option('--output-dir', type=click.Path(file_okay=False), default=None,
              help='Output root; the input tree structure is mirrored here '
                   '[default: <results-dir>/../gifs].')
@click.option('--output-format', type=click.Choice(['gif', 'mp4']),
              default='gif', show_default=True)
@click.option('--fps', type=int, default=16, show_default=True)
@click.option('--overwrite/--no-overwrite', default=False, show_default=True)
def convert_folder(results_dir, output_dir, output_format, fps, overwrite):
    """Render every frame directory under RESULTS-DIR as an animation."""
    results_dir = Path(results_dir)
    output_dir = (Path(output_dir) if output_dir is not None
                  else results_dir.parent / 'gifs')
    n_written = 0
    for frame_dir in iter_frame_dirs(results_dir):
        rel = frame_dir.relative_to(results_dir)
        out_file = output_dir / rel.parent / f'{rel.name}.{output_format}'
        out_file.parent.mkdir(parents=True, exist_ok=True)
        if generate_gif(frame_dir, out_file, output_format, fps=fps,
                        overwrite=overwrite):
            n_written += 1
    click.echo(f'wrote {n_written} {output_format} file(s) to {output_dir}')


if __name__ == '__main__':
    convert_folder()
