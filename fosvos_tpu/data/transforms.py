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


def augmented_frame_stream(dataset, rng: np.random.RandomState):
    """Seeded, shuffled flip+multi-scale stream of (1,H,W,C)/(1,H,W,1)
    batches — the reference train-loader contract (``io_helper.py:62-70``)
    shared by the prune (ranking/fine-tune) and mimic (distillation) CLIs.

    A fresh epoch permutation is drawn from ``rng`` each call; call again
    for the next epoch."""
    for i in np.random.RandomState(rng.randint(2 ** 31)) \
            .permutation(len(dataset)):
        img, gt = dataset.make_img_gt_pair(int(i))
        s = train_augment({'image': img, 'gt': gt}, rng)
        yield s['image'][None], s['gt'][None, ..., None]


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


def scale_schedule(n_steps: int, rng: np.random.RandomState,
                   scales: Sequence[float] = TRAIN_SCALES,
                   chunk_steps: int = 50, align: int = 1):
    """Chunk an adaptation budget into interleaved per-scale scan segments.

    XLA needs static shapes, so instead of the reference's per-step random
    shape (custom_transforms.py:72-92 inside a Python loop), steps are cut
    into fixed-length chunks, chunks are assigned to scales round-robin
    (each scale gets an equal share, like the expected count of n/k uniform
    draws), and the chunk order is shuffled. Each scale's compiled scan is
    reused for all of its chunks, so a 10k-step adaptation still costs one
    compile per scale — but scales *interleave* at chunk granularity rather
    than running lowest-to-highest, matching the reference's uniform
    per-step scale draw with no curriculum (measured on-chip: the sequential
    curriculum converged to a 30x worse one-shot loss). chunk_steps=50 means
    scales mix every 50 steps; keep it a multiple of avg_grad_every_n so
    accumulation windows never straddle a shape change.

    Flip augmentation is NOT pre-sampled here: flips are drawn on device
    inside the compiled scans (jax PRNG threaded through the scan carry), so
    a chunk dispatch moves zero bytes over the host->device link — behind a
    high-latency tunnel, per-chunk host transfers would dominate wall-clock.

    With ``align > 1`` (the batched-window online mode) every chunk length is
    rounded to a multiple of ``align`` = the gradient-accumulation window, and
    any remainder steps are appended as one final short chunk — so at most the
    very last accumulation window of the run is partial, exactly like the
    reference's trailing ``n_steps % avg_grad_every_n`` micro-steps whose
    accumulated gradients never reach an optimizer step.

    Returns a list of (scale, n_chunk_steps) with sum(n) == n_steps.
    """
    k = len(scales)
    # small budgets still see every scale: shrink chunks so >= k chunks
    # exist (with align > 1 chunks cannot shrink below one accumulation
    # window, so a budget under k*align covers only the first ceil(n/align)
    # scales of the cycle — which starts at the NATIVE scale, so the
    # full-resolution frame is always trained first)
    chunk_steps = max(1, min(chunk_steps, n_steps // k))
    if align > 1:
        chunk_steps = max(align, chunk_steps - chunk_steps % align)
    n_chunks, rem = divmod(n_steps, chunk_steps)
    sizes = [chunk_steps] * n_chunks
    # cycle scales native-resolution-first (reversed declaration order);
    # shares stay equal to within one chunk for any budget
    cycle = lambda i: scales[(k - 1 - i) % k]
    tail = []
    if rem:
        if align > 1:
            tail = [(cycle(n_chunks), rem)]
        else:
            sizes.append(rem)
    out = [(cycle(i), n) for i, n in enumerate(sizes)]
    rng.shuffle(out)
    return out + tail
