"""Core OSVOS math ops, TPU-first.

Pure jnp/lax functions (no framework state) implementing the math core of the
reference's ``src/layers/osvos_layers.py``:

* :func:`class_balanced_cross_entropy_loss` — reference ``osvos_layers.py:17-44``
* :func:`center_crop`                       — reference ``osvos_layers.py:47-54``
* :func:`upsample_filt` / bilinear kernels  — reference ``osvos_layers.py:57-81``
* :func:`conv_transpose` (torch ``ConvTranspose2d`` semantics, padding=0)
* :func:`max_pool_ceil` / :func:`max_pool_torch` (torch ceil-mode / padded pooling)

All image tensors are **NHWC** (TPU-native layout); the reference uses NCHW.
Shapes are static at trace time, so the reference's dynamic negative-``F.pad``
center crop becomes a static slice, and ceil-mode pooling becomes a
``reduce_window`` with precomputed -inf edge padding.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def logit(x):
    """Numpy-domain logit, matching reference ``osvos_layers.py:9-10``."""
    return np.log(x / (1 - x + 1e-08) + 1e-08)


def sigmoid_np(x):
    """Numpy sigmoid, matching reference ``osvos_layers.py:13-14``."""
    return 1 / (1 + np.exp(-x))


def class_balanced_cross_entropy_loss(output: jax.Array,
                                      label: jax.Array,
                                      size_average: bool = True) -> jax.Array:
    """Class-balanced BCE on logits.

    Exact port of the numerically-stable formulation at reference
    ``osvos_layers.py:17-44``:

    * pixel labels are ``label >= 0.5``
    * ``loss_val = out*(labels - [out>=0]) - log(1 + exp(out - 2*out*[out>=0]))``
      (the stable logits-BCE; equals ``-softplus(-|out|) + out*(labels-[out>=0])``)
    * ``final = n_neg/n_tot * sum(pos_losses) + n_pos/n_tot * sum(neg_losses)``
    * ``size_average`` divides by the total element count
      (``N*C*H*W`` in the reference, ``label.size`` here — identical value).

    Works on any layout; ``output``/``label`` must broadcast to a common shape.
    """
    output = output.astype(jnp.float32)
    label = label.astype(jnp.float32)

    labels = (label >= 0.5).astype(jnp.float32)

    num_labels_pos = jnp.sum(labels)
    num_labels_neg = jnp.sum(1.0 - labels)
    num_total = num_labels_pos + num_labels_neg

    output_gt_zero = (output >= 0).astype(jnp.float32)
    # log1p is a strictly more accurate evaluation of the reference's
    # log(1 + exp(.)); the argument is always <= 0 so exp() cannot overflow.
    loss_val = output * (labels - output_gt_zero) - jnp.log1p(
        jnp.exp(output - 2.0 * output * output_gt_zero))

    loss_pos = jnp.sum(-labels * loss_val)
    loss_neg = jnp.sum(-(1.0 - labels) * loss_val)

    final_loss = (num_labels_neg / num_total * loss_pos
                  + num_labels_pos / num_total * loss_neg)

    if size_average:
        final_loss = final_loss / float(label.size)

    return final_loss


def class_balanced_cross_entropy_loss_masked(output: jax.Array,
                                             label: jax.Array,
                                             valid: jax.Array,
                                             size_average: bool = True) -> jax.Array:
    """CB-BCE restricted to ``valid`` pixels (for padded multi-scale batches).

    Extension of the reference loss for TPU static-shape batching: pixels with
    ``valid == 0`` contribute nothing to either class count or loss sum. With
    an all-ones mask this is bit-identical to
    :func:`class_balanced_cross_entropy_loss` except for the ``size_average``
    denominator, which uses the *valid* pixel count.
    """
    output = output.astype(jnp.float32)
    label = label.astype(jnp.float32)
    valid = valid.astype(jnp.float32)

    labels = (label >= 0.5).astype(jnp.float32) * valid

    num_labels_pos = jnp.sum(labels)
    num_labels_neg = jnp.sum((1.0 - labels) * valid)
    num_total = num_labels_pos + num_labels_neg

    output_gt_zero = (output >= 0).astype(jnp.float32)
    loss_val = output * (labels - output_gt_zero) - jnp.log1p(
        jnp.exp(output - 2.0 * output * output_gt_zero))
    loss_val = loss_val * valid

    loss_pos = jnp.sum(-labels * loss_val)
    loss_neg = jnp.sum(-(1.0 - labels) * valid * loss_val)

    final_loss = (num_labels_neg / jnp.maximum(num_total, 1.0) * loss_pos
                  + num_labels_pos / jnp.maximum(num_total, 1.0) * loss_neg)

    if size_average:
        final_loss = final_loss / jnp.maximum(jnp.sum(valid), 1.0)

    return final_loss


def center_crop(x: jax.Array, height: int, width: int) -> jax.Array:
    """Center-crop an NHWC tensor to (height, width).

    The reference (``osvos_layers.py:47-54``) crops via negative ``F.pad``
    with ceil/floor asymmetry: for excess ``e = H - height`` it removes
    ``floor(e/2)`` rows from the top and ``ceil(e/2)`` from the bottom.
    With static shapes this is a static slice starting at ``e // 2`` —
    matching the reference to the pixel.
    """
    h, w = x.shape[1], x.shape[2]
    dh, dw = h - height, w - width
    if dh < 0 or dw < 0:
        raise ValueError(
            f'center_crop target ({height},{width}) larger than input ({h},{w})')
    if dh == 0 and dw == 0:
        return x
    return lax.slice(
        x,
        (0, dh // 2, dw // 2, 0),
        (x.shape[0], dh // 2 + height, dw // 2 + width, x.shape[3]),
    )


def upsample_filt(size: int) -> np.ndarray:
    """Bilinear upsampling filter, exact port of ``osvos_layers.py:57-65``."""
    factor = (size + 1) // 2
    if size % 2 == 1:
        center = factor - 1
    else:
        center = factor - 0.5
    og = np.ogrid[:size, :size]
    return ((1 - abs(og[0] - center) / factor)
            * (1 - abs(og[1] - center) / factor))


def bilinear_deconv_kernel(channels: int, size: int,
                           dtype=np.float32) -> np.ndarray:
    """Per-channel-identity bilinear kernel for a transposed conv.

    Equivalent to the reference's ``interp_surgery`` (``osvos_layers.py:70-81``)
    which writes ``upsample_filt`` into the diagonal of a square
    ``ConvTranspose2d`` weight. Returned in this framework's deconv kernel
    layout ``(kh, kw, out_ch, in_ch)`` (see :func:`conv_transpose`); the
    bilinear filter is flip-symmetric so layout conventions cannot skew it.
    """
    filt = upsample_filt(size).astype(dtype)
    w = np.zeros((size, size, channels, channels), dtype=dtype)
    for c in range(channels):
        w[:, :, c, c] = filt
    return w


def conv_transpose(x: jax.Array, kernel: jax.Array, stride: int) -> jax.Array:
    """2-D transposed convolution with torch ``ConvTranspose2d`` semantics.

    ``padding=0``, ``output_padding=0``, ``bias=None`` — exactly the
    configuration used for every OSVOS upscale layer
    (``osvos_vgg.py:47-48``, ``osvos_resnet.py:137-145``):
    output spatial size ``(H-1)*stride + k``.

    Args:
      x: NHWC input.
      kernel: ``(kh, kw, out_ch, in_ch)`` — i.e. the torch deconv weight
        ``(in, out, kh, kw)`` transposed by ``(2, 3, 1, 0)``. We use
        ``transpose_kernel=True`` so the op is the true gradient-of-conv,
        matching torch bit-for-bit (validated in tests against torch CPU).
      stride: spatial stride (same in H and W).
    """
    return lax.conv_transpose(
        x, kernel,
        strides=(stride, stride),
        padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        transpose_kernel=True,
    )


def upsample_bilinear_deconv(x: jax.Array, kernel: jax.Array,
                             stride: int, out_h: int, out_w: int) -> jax.Array:
    """Fused (deconv → center-crop) side-output upsampling.

    The reference composes ``ConvTranspose2d`` then ``center_crop``
    (``osvos_vgg.py:71-78``). Because the crop is a static slice, XLA fuses
    the pair into one pad-and-conv; we keep them as one call site so every
    model shares identical semantics.
    """
    y = conv_transpose(x, kernel, stride)
    return center_crop(y, out_h, out_w)


def _max_pool(x: jax.Array, window: int, stride: int,
              pad: Tuple[Tuple[int, int], Tuple[int, int]]) -> jax.Array:
    if x.dtype == jnp.float32 or x.dtype == jnp.bfloat16:
        init = -jnp.inf
    else:
        init = jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0),) + pad + ((0, 0),),
    )


def max_pool_ceil(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """Max pool with torch ``ceil_mode=True`` and no padding.

    Matches ``nn.MaxPool2d(kernel_size=2, stride=2, ceil_mode=True)`` used by
    the VGG trunk (``osvos_vgg.py:90``): output ``ceil(H/stride)``. Achieved by
    right-padding with -inf so every output window exists. (With ceil_mode and
    zero padding torch never emits a window starting inside padding, so this
    is exact.)
    """
    h, w = x.shape[1], x.shape[2]
    out_h = -(-max(h - window, 0) // stride) + 1
    out_w = -(-max(w - window, 0) // stride) + 1
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    return _max_pool(x, window, stride, ((0, pad_h), (0, pad_w)))


def max_pool_torch(x: jax.Array, window: int = 3, stride: int = 2,
                   padding: int = 1) -> jax.Array:
    """Max pool with torch floor-mode symmetric padding.

    Matches ``nn.MaxPool2d(kernel_size=3, stride=2, padding=1)`` used by the
    ResNet base layer (``osvos_resnet.py:95``); torch pads with -inf, so
    reduce_window with -inf edge padding is exact.
    """
    h, w = x.shape[1], x.shape[2]
    out_h = (h + 2 * padding - window) // stride + 1
    out_w = (w + 2 * padding - window) // stride + 1
    # trim right padding so no window starts past the last valid position
    pad_h_hi = (out_h - 1) * stride + window - h - padding
    pad_w_hi = (out_w - 1) * stride + window - w - padding
    return _max_pool(x, window, stride,
                     ((padding, max(pad_h_hi, 0)), (padding, max(pad_w_hi, 0))))


def deconv_output_size(in_size: int, stride: int, kernel: int) -> int:
    """torch ConvTranspose2d output size with padding=0."""
    return (in_size - 1) * stride + kernel


def conv2d(x: jax.Array, kernel: jax.Array, stride: int = 1,
           padding: int = 0) -> jax.Array:
    """Plain 2-D conv (cross-correlation), torch ``Conv2d`` semantics, NHWC.

    ``kernel`` layout ``(kh, kw, in_ch, out_ch)`` (HWIO) — i.e. the torch
    weight ``(out, in, kh, kw)`` transposed by ``(2, 3, 1, 0)``.
    """
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
