"""Synthetic DAVIS-2016 fixture generator.

The reference has no hermetic test data (its smoke blocks read the real 2GB
DAVIS tree, ``davis_2016.py:142-164``). Per SURVEY.md §4 we generate a tiny
on-disk dataset with the exact DAVIS directory/index contract
(``JPEGImages/480p``, ``Annotations/480p``, ``ImageSets/480p/*.txt``) so every
pipeline — offline train, online fine-tune, prune, mimic, eval — runs
end-to-end in tests without the real dataset.

Scenes are moving bright squares/disks on textured backgrounds, so a few
fine-tune steps measurably improve IoU.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np


def _draw_frame(h: int, w: int, t: int, kind: int,
                rng: np.random.RandomState) -> Tuple[np.ndarray, np.ndarray]:
    img = (rng.randint(0, 60, size=(h, w, 3))).astype(np.uint8)
    # slow-moving object
    cy = int(h * 0.3 + 0.04 * t * h) % (h - h // 4)
    cx = int(w * 0.2 + 0.06 * t * w) % (w - w // 4)
    oh, ow = h // 4, w // 5
    mask = np.zeros((h, w), np.uint8)
    if kind % 2 == 0:
        mask[cy:cy + oh, cx:cx + ow] = 255
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        r = min(oh, ow) // 2
        mask[(yy - cy - oh // 2) ** 2 + (xx - cx - ow // 2) ** 2 <= r * r] = 255
    color = np.array([200 + 5 * (kind % 8), 180, 150], np.uint8)
    img[mask > 0] = color
    return img, mask


def generate(root: str, sequences: Optional[Sequence[str]] = None,
             n_frames: int = 4, size: Tuple[int, int] = (64, 96),
             val_sequences: Optional[Sequence[str]] = None,
             seed: int = 0) -> str:
    """Write a synthetic DAVIS-2016 tree under ``root`` and return it.

    ``sequences`` default: 2 train ('synth-bear', 'synth-bus') and
    ``val_sequences`` default: 2 val ('synth-swan', 'synth-goat').
    """
    import cv2
    rng = np.random.RandomState(seed)
    if sequences is None:
        sequences = ['synth-bear', 'synth-bus']
    if val_sequences is None:
        val_sequences = ['synth-swan', 'synth-goat']

    root_p = Path(root)
    h, w = size
    lines = {'train': [], 'val': []}

    for split, seqs in (('train', sequences), ('val', val_sequences)):
        for k, seq in enumerate(seqs):
            img_dir = root_p / 'JPEGImages' / '480p' / seq
            ann_dir = root_p / 'Annotations' / '480p' / seq
            img_dir.mkdir(parents=True, exist_ok=True)
            ann_dir.mkdir(parents=True, exist_ok=True)
            for t in range(n_frames):
                img, mask = _draw_frame(h, w, t, k + (0 if split == 'train'
                                                      else 1), rng)
                cv2.imwrite(str(img_dir / f'{t:05d}.jpg'), img)
                cv2.imwrite(str(ann_dir / f'{t:05d}.png'), mask)
                lines[split].append(
                    f'/JPEGImages/480p/{seq}/{t:05d}.jpg '
                    f'/Annotations/480p/{seq}/{t:05d}.png ')

    sets_dir = root_p / 'ImageSets' / '480p'
    sets_dir.mkdir(parents=True, exist_ok=True)
    (sets_dir / 'train.txt').write_text('\n'.join(lines['train']) + '\n')
    (sets_dir / 'val.txt').write_text('\n'.join(lines['val']) + '\n')
    (sets_dir / 'trainval.txt').write_text(
        '\n'.join(lines['train'] + lines['val']) + '\n')
    return str(root_p)
