"""DAVIS-2016 dataset, TPU-first.

Reproduces the reference data contract (``src/dataloaders/davis_2016.py``):

* index from ``ImageSets/480p/{train,val,trainval}.txt`` whose lines are
  ``/JPEGImages/480p/<seq>/<frame>.jpg /Annotations/480p/<seq>/<frame>.png``
  (``davis_2016.py:52-70``)
* one-shot semantics when ``seq_name`` is given (``davis_2016.py:72-83``):
  only the *first* frame keeps its annotation; ``mode='train'`` keeps only
  that first frame, ``mode='test'`` keeps all frames (GT on frame 0 only)
* decode BGR (cv2 convention), float32, mean subtraction
  ``(104.00699, 116.66877, 122.67892)`` (``davis_2016.py:28,127-128``),
  GT normalized to [0,1] by its max (``davis_2016.py:131-132``)

Design delta: the dataset is an index + batch materializer, not a torch
``Dataset``; whole sequences are loaded as dense ``(T, H, W, C)`` arrays so
training/eval loops are single device_put + jitted scans instead of a
per-frame host loop.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

# Reference mean (BGR order, matching cv2.imread), davis_2016.py:28.
DAVIS_MEAN_BGR = (104.00699, 116.66877, 122.67892)

# DAVIS-2016 val sequences, reference train_online.py:166-168.
VAL_SEQUENCES = [
    'blackswan', 'bmx-trees', 'breakdance', 'camel', 'car-roundabout',
    'car-shadow', 'cows', 'dance-twirl', 'dog', 'drift-chicane',
    'drift-straight', 'goat', 'horsejump-high', 'kite-surf', 'libby',
    'motocross-jump', 'paragliding-launch', 'parkour', 'scooter-black',
    'soapbox',
]

# reference train_online.py:170-174
TRAIN_SEQUENCES = [
    'bear', 'bmx-bumps', 'boat', 'breakdance-flare', 'bus', 'car-turn',
    'dance-jump', 'dog-agility', 'drift-turn', 'elephant', 'flamingo', 'hike',
    'hockey', 'horsejump-low', 'kite-walk', 'lucia', 'mallard-fly',
    'mallard-water', 'motocross-bumps', 'motorbike', 'paragliding', 'rhino',
    'rollerblade', 'scooter-gray', 'soccerball', 'stroller', 'surf', 'swing',
    'tennis', 'train',
]


def _imread_bgr(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img


def _imread_gray(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, 0)
    if img is None:
        raise FileNotFoundError(path)
    return img


@dataclasses.dataclass
class Sample:
    """One frame record: paths + metadata; label may be None (unannotated)."""
    seq_name: str
    fname: str
    image_path: str
    label_path: Optional[str]


class DAVIS2016:
    """Index of DAVIS-2016 frames with the reference's one-shot filtering."""

    def __init__(self, mode: str = 'train',
                 db_root_dir: str = '',
                 input_res: Optional[Tuple[int, int]] = None,
                 meanval: Sequence[float] = DAVIS_MEAN_BGR,
                 seq_name: Optional[str] = None):
        self.mode = mode.lower()
        self.db_root_dir = str(db_root_dir)
        self.input_res = input_res
        self.meanval = tuple(meanval)
        self.seq_name = seq_name

        mode_fname = {'train': 'train', 'test': 'val'}
        if self.mode not in mode_fname:
            raise ValueError(
                "Mode {} does not exist. Must be one of ['train', 'test']"
                .format(mode))
        fname = 'trainval' if seq_name is not None else mode_fname[self.mode]

        sequences_file = (Path(self.db_root_dir) / 'ImageSets' / '480p'
                          / (fname + '.txt'))
        samples: List[Sample] = []
        with open(sequences_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                img_rel, lab_rel = parts[0], parts[1]
                pieces = img_rel.strip('/').split('/')
                samples.append(Sample(
                    seq_name=pieces[-2],
                    fname=pieces[-1].split('.')[0],
                    image_path=str(Path(self.db_root_dir).joinpath(*pieces)),
                    label_path=str(Path(self.db_root_dir).joinpath(
                        *lab_rel.strip('/').split('/'))),
                ))

        if seq_name is not None:
            samples = [s for s in samples if s.seq_name == seq_name]
            if not samples:
                raise ValueError(f'unknown sequence {seq_name!r}')
            # only the first frame keeps its GT (davis_2016.py:76-77)
            for k, s in enumerate(samples):
                if k > 0:
                    s.label_path = None
            if self.mode == 'train':
                samples = samples[:1]

        self.samples = samples

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def sequence_names(self) -> List[str]:
        seen, out = set(), []
        for s in self.samples:
            if s.seq_name not in seen:
                seen.add(s.seq_name)
                out.append(s.seq_name)
        return out

    def make_raw_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Load one (image, gt) pair as raw uint8 (BGR image, mask).

        The TPU-native transfer format: mean subtraction and gt max-
        normalization (davis_2016.py:127-132) run on device
        (``train.offline.OfflineTrainer(device_preprocess=True)``), so the
        host->device link carries 4x less than float32.
        """
        import cv2
        s = self.samples[idx]
        img = _imread_bgr(s.image_path)
        label = _imread_gray(s.label_path) if s.label_path else None
        if self.input_res is not None:
            h, w = self.input_res
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
            if label is not None:
                label = cv2.resize(label, (w, h),
                                   interpolation=cv2.INTER_NEAREST)
        if label is None:
            label = np.zeros(img.shape[:2], np.uint8)
        return img, label

    def make_img_gt_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Load one (image, gt) pair, reference davis_2016.py:111-134."""
        import cv2
        s = self.samples[idx]
        img = _imread_bgr(s.image_path)
        label = _imread_gray(s.label_path) if s.label_path else None

        if self.input_res is not None:
            h, w = self.input_res
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
            if label is not None:
                label = cv2.resize(label, (w, h),
                                   interpolation=cv2.INTER_NEAREST)

        img = img.astype(np.float32) - np.asarray(self.meanval, np.float32)

        if label is not None:
            gt = label.astype(np.float32)
            gt = gt / max(float(gt.max()), 1e-8)
        else:
            gt = np.zeros(img.shape[:2], np.float32)
        return img, gt

    def __getitem__(self, idx: int) -> dict:
        img, gt = self.make_img_gt_pair(idx)
        s = self.samples[idx]
        return {'image': img, 'gt': gt, 'seq_name': s.seq_name,
                'fname': s.fname}

    def get_img_size(self) -> List[int]:
        return list(_imread_bgr(self.samples[0].image_path).shape[:2])

    def load_sequence(self, seq_name: Optional[str] = None, raw: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        """Materialize a whole sequence as dense arrays.

        Returns ``(images (T,H,W,3), gts (T,H,W), frame names)``. With
        ``raw=False``: float32, mean-subtracted images and max-normalized
        gts (the reference contract, davis_2016.py:127-132). With
        ``raw=True``: uint8 BGR images and uint8 masks — the TPU-native
        transfer format (4x fewer bytes over the host->device link; mean
        subtraction / normalization then run on device, see
        ``evaluation.experiment.InferenceEngine``).

        This is the TPU-native unit of work: one device_put, then jitted
        batched inference over T.
        """
        idxs = [i for i, s in enumerate(self.samples)
                if seq_name is None or s.seq_name == seq_name]
        if not idxs:
            raise ValueError(f'unknown sequence {seq_name!r}')
        loader = self.make_raw_pair if raw else self.make_img_gt_pair
        imgs, gts, names = [], [], []
        for i in idxs:
            img, gt = loader(i)
            imgs.append(img)
            gts.append(gt)
            names.append(self.samples[i].fname)
        return np.stack(imgs), np.stack(gts), names
