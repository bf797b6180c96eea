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
