"""DAVIS J&F evaluation CLI.

The reference scores masks with the *external* ``fperazzi/davis-2017``
toolkit and reads its YAMLs in a notebook (``src/eval/README.md``,
``src/eval/visualizations.ipynb``). Here the evaluator is in-repo
(``fosvos_tpu.evaluation.metrics``); this CLI walks a results directory of
predicted mask PNGs, scores them against the DAVIS annotations, and writes a
toolkit-style YAML.

Usage: python -m fosvos_tpu.cli.evaluate --results-dir results/resnet18/11/11
           [--db-root-dir ...] [--threshold 0.5] [--output metrics.yml]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from fosvos_tpu.config.paths import Paths
from fosvos_tpu.data.davis import DAVIS2016
from fosvos_tpu.evaluation import metrics
from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def load_sequence_masks(results_dir: Path, seq: str, names,
                        threshold: float) -> list:
    import cv2
    masks = []
    for name in names:
        p = results_dir / seq / f'{name}.png'
        m = cv2.imread(str(p), 0)
        if m is None:
            raise FileNotFoundError(p)
        masks.append(m.astype(np.float32) / 255.0 >= threshold)
    return masks


def evaluate_results(results_dir: str, db_root_dir: str,
                     threshold: float = 0.5) -> metrics.DatasetEval:
    results_dir = Path(results_dir)
    db = DAVIS2016(mode='test', db_root_dir=db_root_dir)
    per_sequence = {}
    for seq in db.sequence_names:
        if not (results_dir / seq).exists():
            log.warning('No results for sequence %s, skipping', seq)
            continue
        seq_db = DAVIS2016(mode='test', db_root_dir=db_root_dir)
        idxs = [i for i, s in enumerate(seq_db.samples) if s.seq_name == seq]
        anns, names = [], []
        import cv2
        for i in idxs:
            s = seq_db.samples[i]
            ann = cv2.imread(s.label_path, 0)
            anns.append(ann.astype(np.float32) / max(ann.max(), 1) >= 0.5)
            names.append(s.fname)
        segs = load_sequence_masks(results_dir, seq, names, threshold)
        per_sequence[seq] = metrics.evaluate_sequence(anns, segs)
        log.info('%s: J %.4f F %.4f', seq, per_sequence[seq].j.mean,
                 per_sequence[seq].f.mean)
    return metrics.DatasetEval(per_sequence=per_sequence)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--results-dir', required=True, type=str)
    parser.add_argument('--db-root-dir', default=None, type=str)
    parser.add_argument('--threshold', default=0.5, type=float)
    parser.add_argument('--output', default=None, type=str)
    args = parser.parse_args(argv)

    ev = evaluate_results(args.results_dir,
                          args.db_root_dir or Paths.db_root_dir(),
                          args.threshold)
    if not ev.per_sequence:
        log.error('no sequences evaluated: %s has no per-sequence mask '
                  'directories matching the dataset', args.results_dir)
        raise SystemExit(2)
    summary = ev.summary()
    for k, v in summary.items():
        log.info('%s: %.4f', k, v)

    if args.output:
        import yaml
        doc = {'dataset': summary,
               'sequences': {
                   seq: {'J': {'mean': s.j.mean, 'recall': s.j.recall,
                               'decay': s.j.decay},
                         'F': {'mean': s.f.mean, 'recall': s.f.recall,
                               'decay': s.f.decay}}
                   for seq, s in ev.per_sequence.items()}}
        Path(args.output).write_text(yaml.dump(doc, default_flow_style=False))
        log.info('Wrote %s', args.output)


if __name__ == '__main__':
    main()
