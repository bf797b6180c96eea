"""Reporting CLI: comparison plots and side-by-side sequence videos.

The command-line surface of ``fosvos_tpu.evaluation.report`` — replaces the
by-hand cells of the reference's eval notebook (``src/eval/
visualizations.ipynb``): cells 4-5/27/28 (bars, per-sequence, quality-vs-
speed) via ``plots``; cells 29-34 (side-by-side sequence videos) via
``compare``.
"""
from __future__ import annotations

from pathlib import Path

import click


@click.group()
def cli():
    """Render comparison reports from evaluation outputs."""


@cli.command()
@click.option('--metrics', 'metrics_specs', multiple=True, required=True,
              help='LABEL=path/to/metrics.yml (repeatable)')
@click.option('--output-dir', type=click.Path(file_okay=False),
              default='reports', show_default=True)
def plots(metrics_specs, output_dir):
    """J/F bar chart + per-sequence breakdown from metrics YAMLs."""
    from fosvos_tpu.evaluation import report

    paths = dict(s.split('=', 1) for s in metrics_specs)
    docs = report.load_metrics(paths)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    report.plot_model_comparison(docs, str(out / 'model_comparison.png'))
    for name, doc in docs.items():
        report.plot_per_sequence(doc, str(out / f'per_sequence_{name}.png'))
    click.echo(f'wrote plots to {out}')


@cli.command()
@click.option('--frames-dir', type=click.Path(exists=True, file_okay=False),
              required=True, help='JPEG frames of the sequence '
              '(e.g. DAVIS/JPEGImages/480p/<seq>)')
@click.option('--masks', 'mask_specs', multiple=True, required=True,
              help='LABEL=results/<model>/.../<seq> (repeatable)')
@click.option('--output', type=click.Path(dir_okay=False), required=True,
              help='output .gif or .mp4')
@click.option('--fps', type=int, default=16, show_default=True)
def compare(frames_dir, mask_specs, output, fps):
    """Side-by-side overlay video across models (notebook cells 29-34)."""
    from fosvos_tpu.evaluation import report

    mask_dirs = dict(s.split('=', 1) for s in mask_specs)
    Path(output).parent.mkdir(parents=True, exist_ok=True)
    report.render_video_grid(frames_dir, mask_dirs, output, fps=fps)
    click.echo(f'wrote {output}')


if __name__ == '__main__':
    cli()
