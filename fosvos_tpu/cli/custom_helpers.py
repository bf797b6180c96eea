"""Personal-dataset preparation CLI — reference ``src/custom_helpers.py``.

Commands: ``mean`` (per-channel dataset mean), ``filter`` (mask out
foreground), ``overlay`` (composite foregrounds onto backgrounds with random
scale/position into a synthetic train set).
"""
from __future__ import annotations

import itertools
from pathlib import Path

import click
import numpy as np

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


@click.group()
@click.option('--dataset-dir', '-d', type=click.Path(file_okay=False),
              required=True)
@click.pass_context
def cli(ctx: click.core.Context, dataset_dir: str) -> None:
    ctx.obj['dataset_dir'] = dataset_dir


@cli.command()
@click.pass_context
def mean(ctx: click.core.Context) -> None:
    """Per-channel BGR mean over background+source (custom_helpers.py:22-44)."""
    import cv2
    dataset_dir = Path(ctx.obj['dataset_dir'])
    total = np.zeros(3)
    n_images = 0
    for directory in ['background', 'source']:
        for file in sorted((dataset_dir / directory).iterdir()):
            image = cv2.imread(str(file))
            total += image.reshape(-1, 3).mean(axis=0)
            n_images += 1
    total /= max(n_images, 1)
    log.info('Calculated mean: {}'.format(str(total)))
    click.echo(str(total))


@cli.command()
@click.pass_context
def filter(ctx: click.core.Context) -> None:
    """Extract foreground pixels via annotations (custom_helpers.py:48-66)."""
    import cv2
    dataset_dir = Path(ctx.obj['dataset_dir'])
    source_path = dataset_dir / 'source'
    annotations_path = dataset_dir / 'foreground_annotations'
    foreground_path = dataset_dir / 'foreground'
    foreground_path.mkdir(exist_ok=True)
    for annotation_file in sorted(annotations_path.iterdir()):
        annotation_image = cv2.imread(str(annotation_file))
        color_file_name = annotation_file.stem + '.jpg'
        source_image = cv2.imread(str(source_path / color_file_name))
        foreground_image = np.where(annotation_image >= 1, source_image,
                                    annotation_image)
        cv2.imwrite(str(foreground_path / color_file_name), foreground_image)


@cli.command()
@click.option('--seed', type=int, default=None)
@click.pass_context
def overlay(ctx: click.core.Context, seed) -> None:
    """Composite foregrounds onto backgrounds with random scale/position
    (custom_helpers.py:70-112)."""
    import cv2
    rng = np.random.RandomState(seed)
    dataset_dir = Path(ctx.obj['dataset_dir'])
    background_path = dataset_dir / 'background'
    foreground_path = dataset_dir / 'foreground'
    foreground_annotations_path = dataset_dir / 'foreground_annotations'
    output_path = dataset_dir / 'images'
    output_path.mkdir(exist_ok=True)
    output_annotations_path = dataset_dir / 'annotations'
    output_annotations_path.mkdir(exist_ok=True)

    pairs = list(itertools.product(sorted(background_path.iterdir()),
                                   sorted(foreground_path.iterdir()),
                                   range(3)))
    for index, (background_file, foreground_file, _) in enumerate(pairs):
        background_image = cv2.imread(str(background_file))
        foreground_image = cv2.imread(str(foreground_file))
        annotation_file = (foreground_annotations_path
                           / f'{foreground_file.stem}.png')
        annotation_image = cv2.imread(str(annotation_file))

        # reference draw: 1 - ranf()/1.5 (custom_helpers.py:84); ranf is
        # gone from modern numpy's RandomState — random_sample is the
        # identical generator call
        scale_factor = 1 - rng.random_sample() / 1.5
        out_ann = cv2.resize(annotation_image, dsize=(0, 0), fx=scale_factor,
                             fy=scale_factor, interpolation=cv2.INTER_AREA)
        cv2.imwrite(str(output_annotations_path / f'{index}.png'), out_ann)

        fg = cv2.resize(foreground_image, dsize=(0, 0), fx=scale_factor,
                        fy=scale_factor, interpolation=cv2.INTER_AREA)
        fg_h, fg_w = fg.shape[:2]
        # uniform placement keeping the scaled foreground fully in frame
        # (draw order: x then y, for seeded reproducibility)
        left = rng.randint(0, background_image.shape[1] - fg_w)
        top = rng.randint(0, background_image.shape[0] - fg_h)

        # vectorized alpha blend, per-pixel alpha = annotation intensity
        alpha = (out_ann.astype(np.float64) / 255).mean(axis=2,
                                                        keepdims=True)
        region = background_image[top:top + fg_h, left:left + fg_w]
        background_image[top:top + fg_h, left:left + fg_w] = \
            alpha * fg + (1.0 - alpha) * region
        cv2.imwrite(str(output_path / f'{index}.jpg'), background_image)


def main():
    cli(obj={})


if __name__ == '__main__':
    main()
