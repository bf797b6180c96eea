"""Visualization/geometry helpers — reference ``src/dataloaders/helpers.py``.

Numpy-native (tensors here are already NHWC numpy/jax arrays, so the
reference's torch->numpy ``tens2image`` transpose becomes a squeeze).
"""
from __future__ import annotations

import random
from typing import List

import numpy as np


def tens2image(im) -> np.ndarray:
    """Squeeze a (1,H,W,C)/(H,W,C)/(H,W,1) array to displayable HW[C]."""
    tmp = np.squeeze(np.asarray(im))
    return tmp


def overlay_mask(im: np.ndarray, ma: np.ndarray,
                 color=np.array([255, 0, 0]) / 255.0) -> np.ndarray:
    """Blend mask over image + draw its contour (helpers.py:15-36)."""
    import cv2
    assert np.max(im) <= 1.0
    ma = ma.astype(bool)
    im = im.astype(np.float32)

    alpha = 0.5
    fg = im * alpha + np.ones(im.shape) * (1 - alpha) * color

    bg = im.copy()
    bg[ma == 1] = fg[ma == 1]

    contours = cv2.findContours(ma.astype(np.uint8), cv2.RETR_TREE,
                                cv2.CHAIN_APPROX_SIMPLE)[-2:]
    cv2.drawContours(bg, contours[0], -1, (0.0, 0.0, 0.0), 1)
    return bg


def point_in_segmentation(seg: np.ndarray, thres: float = .5) -> List[int]:
    """Random representative point where the distance transform exceeds
    thres * max (helpers.py:39-54)."""
    from scipy.ndimage import distance_transform_edt
    dt = distance_transform_edt(seg)
    dt = dt > thres * dt.max()
    inds_y, inds_x = np.where(dt > 0)
    pix_id = random.randint(0, len(inds_y) - 1)
    return [int(inds_x[pix_id]), int(inds_y[pix_id])]


def im_normalize(im: np.ndarray) -> np.ndarray:
    return (im - im.min()) / max((im.max() - im.min()), 1e-8)


def make_gaussian(size, sigma: float = 10, center=None) -> np.ndarray:
    """Square gaussian kernel (helpers.py:81-98)."""
    x = np.arange(0, size[1], 1, float)
    y = np.arange(0, size[0], 1, float)[:, np.newaxis]
    if center is None:
        x0 = y0 = size[0] // 2
    else:
        x0, y0 = center[0], center[1]
    return np.exp(-4 * np.log(2) * ((x - x0) ** 2 + (y - y0) ** 2)
                  / sigma ** 2)


def make_gt(img: np.ndarray, labels, sigma: float = 10) -> np.ndarray:
    h, w = img.shape[:2]
    return make_gaussian((h, w), sigma, labels)


def overlay_mask_tool(img: np.ndarray, mask: np.ndarray,
                      transparency: float = 1.0) -> np.ndarray:
    """Per-channel overlay of an HxWx3 mask (helpers.py:127-141)."""
    im_over = np.ndarray(img.shape)
    for c in range(3):
        im_over[:, :, c] = ((1 - mask[:, :, c]) * img[:, :, c]
                            + mask[:, :, c] * (transparency
                                               + (1 - transparency)
                                               * img[:, :, c]))
    return im_over
