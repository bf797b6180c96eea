"""In-repo DAVIS J&F evaluator.

The reference outsources quality metrics to the external ``fperazzi/davis-2017``
toolkit (``src/eval/README.md:2-3``) and only visualizes the resulting YAMLs.
Here the evaluator is part of the framework, implementing the published
DAVIS-2016 benchmark definitions (Perazzi et al., CVPR'16):

* **J** — region similarity: intersection-over-union per frame.
* **F** — contour accuracy: boundary precision/recall with a tolerance of
  ``bound_th`` (0.008 of the image diagonal), boundaries matched via
  morphological dilation.
* statistics per sequence: mean **M**, recall **O** (fraction of frames
  > 0.5), decay **D** (first-quartile mean minus last-quartile mean), with
  first and last frames excluded as in the toolkit.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import numpy as np


def iou(annotation: np.ndarray, segmentation: np.ndarray) -> float:
    """Region similarity J for one frame. Empty-vs-empty scores 1."""
    ann = np.asarray(annotation).astype(bool)
    seg = np.asarray(segmentation).astype(bool)
    union = np.logical_or(ann, seg).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(ann, seg).sum() / union)


def _boundary_map(seg: np.ndarray) -> np.ndarray:
    """Binary boundary map: pixels of the mask whose 4-neighborhood leaves it."""
    from scipy.ndimage import binary_erosion
    seg = np.asarray(seg).astype(bool)
    if not seg.any():
        return np.zeros_like(seg)
    er = binary_erosion(seg, structure=np.array(
        [[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool), border_value=0)
    return seg & ~er


def _disk(radius: int) -> np.ndarray:
    if radius < 1:
        return np.ones((1, 1), bool)
    y, x = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y) <= radius * radius


def f_boundary(annotation: np.ndarray, segmentation: np.ndarray,
               bound_th: float = 0.008) -> float:
    """Contour accuracy F for one frame."""
    from scipy.ndimage import binary_dilation
    fg = _boundary_map(segmentation)
    gt = _boundary_map(annotation)

    n_fg, n_gt = fg.sum(), gt.sum()
    if n_fg == 0 and n_gt == 0:
        return 1.0
    if n_fg == 0 or n_gt == 0:
        return 0.0

    bound_pix = int(np.ceil(bound_th * np.linalg.norm(annotation.shape)))
    selem = _disk(bound_pix)
    fg_dil = binary_dilation(fg, selem)
    gt_dil = binary_dilation(gt, selem)

    precision = (fg & gt_dil).sum() / n_fg
    recall = (gt & fg_dil).sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


@dataclasses.dataclass
class SequenceStats:
    mean: float
    recall: float
    decay: float
    per_frame: np.ndarray


def db_statistics(per_frame: np.ndarray) -> SequenceStats:
    """DAVIS per-sequence statistics (toolkit ``db_statistics`` semantics)."""
    v = np.asarray(per_frame, np.float64)
    M = float(np.nanmean(v))
    core = v[1:-1] if len(v) > 2 else v
    O = float(np.nanmean(core > 0.5))
    n_bins = 4
    ids = np.round(np.linspace(1, len(v), n_bins + 1) + 1e-10) - 1
    ids = ids.astype(int)
    bins = [v[ids[i]:ids[i + 1] + 1] for i in range(n_bins)]
    D = float(np.nanmean(bins[0]) - np.nanmean(bins[3]))
    return SequenceStats(mean=M, recall=O, decay=D, per_frame=v)


@dataclasses.dataclass
class SequenceEval:
    j: SequenceStats
    f: SequenceStats


def evaluate_sequence(annotations: Sequence[np.ndarray],
                      segmentations: Sequence[np.ndarray],
                      skip_first_last: bool = True) -> SequenceEval:
    """J&F over one sequence of binary masks.

    The DAVIS protocol excludes the first frame (it is the given annotation)
    and the last frame from per-frame statistics; pass the full sequence and
    leave ``skip_first_last`` on for benchmark-comparable numbers.
    """
    assert len(annotations) == len(segmentations)
    idxs = range(len(annotations))
    if skip_first_last and len(annotations) > 2:
        idxs = range(1, len(annotations) - 1)
    js, fs = [], []
    for i in idxs:
        js.append(iou(annotations[i], segmentations[i]))
        fs.append(f_boundary(annotations[i], segmentations[i]))
    return SequenceEval(j=db_statistics(np.asarray(js)),
                        f=db_statistics(np.asarray(fs)))


@dataclasses.dataclass
class DatasetEval:
    per_sequence: Dict[str, SequenceEval]

    @property
    def j_mean(self) -> float:
        return float(np.mean([s.j.mean for s in self.per_sequence.values()]))

    @property
    def f_mean(self) -> float:
        return float(np.mean([s.f.mean for s in self.per_sequence.values()]))

    def summary(self) -> Dict[str, float]:
        vals = self.per_sequence.values()
        return {
            'J_mean': self.j_mean,
            'J_recall': float(np.mean([s.j.recall for s in vals])),
            'J_decay': float(np.mean([s.j.decay for s in vals])),
            'F_mean': self.f_mean,
            'F_recall': float(np.mean([s.f.recall for s in vals])),
            'F_decay': float(np.mean([s.f.decay for s in vals])),
        }
