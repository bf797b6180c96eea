"""Result reporting — the in-repo replacement for the reference's eval
notebook (``src/eval/visualizations.ipynb``): per-model J/F bar charts,
per-sequence breakdowns, and the quality-vs-speed scatter, rendered to PNG
from the YAMLs written by ``cli/evaluate.py`` and speed JSONs.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def load_metrics(paths: Dict[str, str]) -> Dict[str, dict]:
    """{model name -> metrics.yml path} -> parsed docs."""
    import yaml
    return {name: yaml.safe_load(Path(p).read_text())
            for name, p in paths.items()}


def plot_model_comparison(metrics: Dict[str, dict], out_path: str,
                          keys=('J_mean', 'F_mean')) -> str:
    """Grouped bar chart of dataset-level J/F per model (notebook cells 4-5)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np

    names = list(metrics)
    x = np.arange(len(names))
    width = 0.8 / len(keys)
    fig, ax = plt.subplots(figsize=(max(6, 1.2 * len(names)), 4))
    for k, key in enumerate(keys):
        vals = [metrics[n]['dataset'][key] for n in names]
        ax.bar(x + k * width, vals, width, label=key)
    ax.set_xticks(x + width * (len(keys) - 1) / 2)
    ax.set_xticklabels(names, rotation=30, ha='right')
    ax.set_ylim(0, 1)
    ax.legend()
    ax.set_title('DAVIS-2016 quality')
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    log.info('Wrote %s', out_path)
    return out_path


def plot_per_sequence(metrics_doc: dict, out_path: str,
                      key: str = 'J') -> str:
    """Per-sequence mean bars for one model (notebook cell 27)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    seqs = sorted(metrics_doc['sequences'])
    vals = [metrics_doc['sequences'][s][key]['mean'] for s in seqs]
    fig, ax = plt.subplots(figsize=(max(8, 0.45 * len(seqs)), 4))
    ax.bar(range(len(seqs)), vals)
    ax.set_xticks(range(len(seqs)))
    ax.set_xticklabels(seqs, rotation=60, ha='right')
    ax.set_ylim(0, 1)
    ax.set_title(f'{key} mean per sequence')
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    log.info('Wrote %s', out_path)
    return out_path


def render_video_grid(frames_dir: str, model_mask_dirs: Dict[str, str],
                      out_path: str, fps: int = 16,
                      threshold: float = 0.5) -> str:
    """Side-by-side comparison video of one sequence across models —
    the reference notebook's video grids (``visualizations.ipynb`` cells
    29-34, moviepy clips_array over results dirs).

    ``frames_dir``: the sequence's JPEG frames; ``model_mask_dirs``:
    {label -> directory of that model's mask PNGs for the same sequence}.
    Layout: the raw frame first, then one overlay panel per model, each
    captioned; written as gif or mp4 by extension.
    """
    import cv2
    import numpy as np

    from fosvos_tpu.data.helpers import overlay_mask

    frame_files = sorted(Path(frames_dir).glob('*.jpg'))
    if not frame_files:
        raise ValueError(f'no frames in {frames_dir}')

    def caption(panel: np.ndarray, text: str) -> np.ndarray:
        bar = np.zeros((18, panel.shape[1], 3), panel.dtype)
        cv2.putText(bar, text, (4, 13), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    (255, 255, 255), 1, cv2.LINE_AA)
        return np.concatenate([bar, panel], axis=0)

    grid_frames = []
    for f in frame_files:
        frame = cv2.imread(str(f))
        panels = [caption(frame, 'input')]
        for label, d in model_mask_dirs.items():
            mask_path = Path(d) / (f.stem + '.png')
            mask = cv2.imread(str(mask_path), 0)
            if mask is None:
                mask = np.zeros(frame.shape[:2], np.uint8)
            ma = mask.astype(np.float32) / 255.0 >= threshold
            over = overlay_mask(frame.astype(np.float32) / 255.0, ma,
                                color=np.array([0, 0, 255]) / 255.0)
            panels.append(caption(
                np.clip(over * 255.0, 0, 255).astype(np.uint8), label))
        grid = np.concatenate(panels, axis=1)
        grid_frames.append(cv2.cvtColor(grid, cv2.COLOR_BGR2RGB))

    import imageio
    if str(out_path).endswith('.gif'):
        imageio.mimsave(out_path, grid_frames, duration=1000.0 / fps)
    else:
        imageio.mimsave(out_path, grid_frames, fps=fps)
    log.info('Wrote %s (%d frames, %d panels)', out_path, len(grid_frames),
             1 + len(model_mask_dirs))
    return out_path


def plot_quality_vs_speed(points: Dict[str, dict], out_path: str) -> str:
    """Scatter of J_mean vs fps per model variant (notebook cell 28's
    metric-vs-speed view). ``points``: name -> {'j_mean': x, 'fps': y}."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4.5))
    for name, p in points.items():
        ax.scatter(p['fps'], p['j_mean'])
        ax.annotate(name, (p['fps'], p['j_mean']), fontsize=8,
                    xytext=(4, 4), textcoords='offset points')
    ax.set_xlabel('throughput (frames/s)')
    ax.set_ylabel('J mean')
    ax.set_title('quality vs speed')
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    log.info('Wrote %s', out_path)
    return out_path
