"""In-repo DAVIS J&F evaluator.

The reference outsources quality metrics to the external ``fperazzi/davis-2017``
toolkit (``src/eval/README.md:2-3``) and only visualizes the resulting YAMLs.
Here the evaluator is part of the framework, implementing the published
DAVIS-2016 benchmark definitions (Perazzi et al., CVPR'16):

* **J** — region similarity: intersection-over-union per frame.
* **F** — contour accuracy: boundary precision/recall with a tolerance of
  ``bound_th`` (0.008 of the image diagonal); boundaries extracted with the
  toolkit's ``seg2bmap`` convention and matched via disk dilation, exactly
  like the toolkit's ``db_eval_boundary``.
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


def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """Boundary map with the davis-2017 toolkit's ``seg2bmap`` semantics
    (``python/lib/davis/measures/f_boundary.py``, David Martin's BSDS
    convention): a pixel is boundary iff its value differs from its east,
    south, or south-east neighbour — i.e. transitions are marked on *both*
    sides, at pixel-pair granularity. The last row considers only its east
    diff and the last column only its south diff (the toolkit's edge
    handling); the corner is never boundary.

    (The toolkit also supports resampling the map to a different
    width/height; DAVIS masks are evaluated at native resolution, so that
    branch does not apply.)
    """
    seg = np.asarray(seg).astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def _disk(radius: int) -> np.ndarray:
    if radius < 1:
        return np.ones((1, 1), bool)
    y, x = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y) <= radius * radius


def f_boundary(annotation: np.ndarray, segmentation: np.ndarray,
               bound_th: float = 0.008) -> float:
    """Contour accuracy F for one frame, matching the davis-2017 toolkit's
    ``db_eval_boundary``: seg2bmap boundaries on both masks, dilated by a
    disk of radius ceil(bound_th * image diagonal); precision over the
    predicted boundary, recall over the GT boundary."""
    from scipy.ndimage import binary_dilation
    fg = seg2bmap(segmentation)
    gt = seg2bmap(annotation)

    n_fg, n_gt = fg.sum(), gt.sum()
    # toolkit zero cases: one side empty -> (p, r) = (1, 0) or (0, 1) -> F=0
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
    """DAVIS per-sequence statistics over *evaluated* frames.

    Toolkit semantics, settled against the two public evaluator generations
    (both quoted verbatim and executed in
    ``tests/test_evaluation.py::TestToolkitStatSemantics``):

    * **davis2017-evaluation** (the current official scorer,
      ``davis2017/utils.py::db_statistics``): NO in-function trim — its
      caller (``evaluation.py``, semi-supervised task) pre-trims the
      first/last frames (``all_gt_masks[:, 1:-1]``) before computing
      per-frame values. This function matches it EXACTLY: the caller
      (:func:`evaluate_sequence`) trims once, and mean/recall/decay here
      all see frames ``1..N-2``.
    * **fperazzi/davis (2016) and its davis-2017 fork** (what the reference
      ran, ``src/eval/README.md:2-3``): the caller passes the FULL
      per-frame array and ``db_statistics`` trims ``[1:-1]`` in-function
      for recall and the decay bins — but its MEAN spans the full array,
      first (= the given annotation, trivially near-1) and last frames
      included. Recall/decay are therefore identical between the two
      generations; only the mean differs. :func:`evaluate_sequence`
      exposes ``toolkit='davis2016'`` to reproduce that full-span mean
      when comparing against YAMLs produced by the reference's fork.

    (An earlier revision re-trimmed here on top of the caller's trim — an
    off-by-two on recall for short sequences; pinned by a hand-computed
    example in ``tests/test_evaluation.py``.)
    """
    v = np.asarray(per_frame, np.float64)
    M = float(np.nanmean(v))
    O = float(np.nanmean(v > 0.5))
    n_bins = 4
    ids = np.round(np.linspace(1, len(v), n_bins + 1) + 1e-10) - 1
    # int, not the toolkits' uint8 (which silently overflows past 255
    # frames; DAVIS sequences are <= ~104 so the numbers cannot differ)
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
                      skip_first_last: bool = True,
                      toolkit: str = 'davis2017') -> SequenceEval:
    """J&F over one sequence of binary masks.

    The DAVIS protocol excludes the first frame (it is the given annotation)
    and the last frame from per-frame statistics; pass the full sequence and
    leave ``skip_first_last`` on for benchmark-comparable numbers.

    ``toolkit`` selects which public evaluator's *mean* semantics to match
    (recall/decay are identical between them — see :func:`db_statistics`):

    * ``'davis2017'`` (default): mean over the trimmed frames ``1..N-2``,
      like the official davis2017-evaluation scorer.
    * ``'davis2016'``: mean over ALL frames including first/last, like the
      fperazzi/davis toolkit the reference's YAMLs came from — its
      ``db_statistics`` trims only recall/decay in-function while
      ``np.nanmean(per_frame_values)`` spans the full array.
    """
    if toolkit not in ('davis2017', 'davis2016'):
        raise ValueError(f'unknown toolkit {toolkit!r}')
    assert len(annotations) == len(segmentations)
    n = len(annotations)
    trim = skip_first_last and n > 2
    # davis2016 full-span means need the end frames evaluated even when
    # the core statistics trim them
    need_ends = (not trim) or toolkit == 'davis2016'
    idxs = range(n) if need_ends else range(1, n - 1)
    js, fs = {}, {}
    for i in idxs:
        js[i] = iou(annotations[i], segmentations[i])
        fs[i] = f_boundary(annotations[i], segmentations[i])
    core = [i for i in js if not trim or 0 < i < n - 1]
    j = db_statistics(np.asarray([js[i] for i in core]))
    f = db_statistics(np.asarray([fs[i] for i in core]))
    if toolkit == 'davis2016' and trim:
        j = dataclasses.replace(
            j, mean=float(np.nanmean([js[i] for i in sorted(js)])))
        f = dataclasses.replace(
            f, mean=float(np.nanmean([fs[i] for i in sorted(fs)])))
    return SequenceEval(j=j, f=f)


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
