"""Augmentation, reproducing reference ``src/dataloaders/custom_transforms.py``.

Two tiers, by design:

* **Host tier** (numpy/cv2): geometric transforms that change the array shape
  (random Resize to scales {0.5, 0.8, 1}, ScaleNRotate) — exactly the
  reference semantics, applied before device transfer.
* **Device tier** (jnp, shape-preserving): horizontal flip, usable *inside* a
  jitted train step so e.g. the online fine-tune scan can re-augment the
  resident frame every step with zero host round-trips.

The reference's canonical train pipeline is Compose[RandomHorizontalFlip,
Resize([0.5, 0.8, 1]), ToTensor] (``io_helper.py:62-70``; ScaleNRotate is
defined but commented out there). ToTensor/HWC→CHW does not apply: this
framework is NHWC end-to-end.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

Sample = Dict[str, np.ndarray]
_SKIP = ('fname', 'seq_name')

# reference io_helper.py:66 / custom_transforms.py:69
TRAIN_SCALES = (0.5, 0.8, 1.0)


def random_horizontal_flip(sample: Sample, rng: np.random.RandomState) -> Sample:
    """p=0.5 horizontal flip of every array field (custom_transforms.py:95-109)."""
    if rng.rand() < 0.5:
        sample = {k: (v if k in _SKIP else np.ascontiguousarray(v[:, ::-1]))
                  for k, v in sample.items()}
    return sample


def resize(sample: Sample, scale: float) -> Sample:
    """Deterministic rescale: cubic for images, nearest for masks
    (custom_transforms.py:72-92)."""
    import cv2
    if scale == 1.0:
        return sample
    out = {}
    for k, v in sample.items():
        if k in _SKIP:
            out[k] = v
            continue
        interp = cv2.INTER_NEAREST if v.ndim == 2 else cv2.INTER_CUBIC
        out[k] = cv2.resize(v, None, fx=scale, fy=scale, interpolation=interp)
    return out


def random_resize(sample: Sample, rng: np.random.RandomState,
                  scales: Sequence[float] = TRAIN_SCALES) -> Sample:
    return resize(sample, scales[rng.randint(0, len(scales))])


def scale_n_rotate(sample: Sample, rng: np.random.RandomState,
                   rots: Tuple[float, float] = (-30, 30),
                   scales: Tuple[float, float] = (.75, 1.25)) -> Sample:
    """Random affine zoom+rotation (custom_transforms.py:7-60).

    Shape-preserving (warpAffine to the same canvas); renormalizes into
    [0, 1]-ish range exactly like the reference (min-shift, max-divide).
    """
    import cv2
    rot = (rots[1] - rots[0]) * rng.rand() - (rots[1] - rots[0]) / 2
    sc = (scales[1] - scales[0]) * rng.rand() - (scales[1] - scales[0]) / 2 + 1
    out = {}
    for k, v in sample.items():
        if k in _SKIP:
            out[k] = v
            continue
        h, w = v.shape[:2]
        M = cv2.getRotationMatrix2D((w / 2, h / 2), rot, sc)
        flag = cv2.INTER_NEAREST if v.ndim == 2 else cv2.INTER_CUBIC
        t = cv2.warpAffine(v, M, (w, h), flags=flag)
        if t.min() < 0.0:
            t = t - t.min()
        if t.max() > 1.0:
            t = t / t.max()
        out[k] = t
    return out


def train_augment(sample: Sample, rng: np.random.RandomState,
                  scales: Sequence[float] = TRAIN_SCALES,
                  use_scale_n_rotate: bool = False) -> Sample:
    """The reference train pipeline (io_helper.py:62-70)."""
    sample = random_horizontal_flip(sample, rng)
    if use_scale_n_rotate:
        sample = scale_n_rotate(sample, rng)
    sample = random_resize(sample, rng, scales)
    return sample


# ---------------------------------------------------------------------------
# Device tier
# ---------------------------------------------------------------------------

def device_flip(images, gts, flip):
    """Shape-preserving horizontal flip inside jit.

    ``images``/``gts`` are NHWC (gts typically (N,H,W,1)); ``flip`` is a
    scalar or per-sample (N,) 0/1 array. Used by the online fine-tune scan to
    re-sample augmentation per step with the frame resident in HBM.
    """
    import jax.numpy as jnp
    flip = jnp.reshape(jnp.asarray(flip), (-1, 1, 1, 1)) != 0
    images = jnp.where(flip, jnp.flip(images, axis=2), images)
    gts = jnp.where(flip, jnp.flip(gts, axis=2), gts)
    return images, gts


def scale_buckets(n_steps: int, rng: np.random.RandomState,
                  scales: Sequence[float] = TRAIN_SCALES):
    """Pre-sample per-step flips and group steps into per-scale buckets.

    XLA needs static shapes, so instead of the reference's per-step random
    shape (custom_transforms.py:72-92 inside a Python loop), we assign each
    scale a **deterministic share** of the n_steps (uniform split, remainder
    to the first scales) and draw only the flips randomly. Scale counts over
    10k uniform draws concentrate to n/k anyway; fixing them exactly makes
    every bucket's scan length a function of n_steps alone, so the compiled
    scans are reused across sequences and seeds (one compile per scale for a
    whole 20-sequence sweep).

    Returns list of (scale, flips-array) with sum(len(flips)) == n_steps.
    """
    k = len(scales)
    out = []
    for i, scale in enumerate(scales):
        n = n_steps // k + (1 if i < n_steps % k else 0)
        if n:
            out.append((scale, (rng.rand(n) < 0.5).astype(np.int32)))
    return out
