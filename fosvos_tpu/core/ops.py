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

from typing import Tuple

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
        ``(in, out, kh, kw)`` transposed by ``(2, 3, 1, 0)``.
      stride: spatial stride (same in H and W).

    Every OSVOS deconv satisfies ``k == 2*stride`` (VGG ``2^(1+i)/2^i``,
    ResNet ``2^(3+i)/2^(2+i)``); for that case we use a **kernel-segregated
    (pixel-shuffle) lowering**: output phase (ry, rx) of the transposed conv
    touches exactly the kernel taps congruent to it mod ``stride``, so the
    whole op is one dense 2x2 conv producing ``s^2 * out_ch`` channels
    followed by a depth-to-space interleave. This is (a) exactly torch's
    ``ConvTranspose2d`` (validated bit-level in tests/test_ops.py), (b) free
    of input dilation — which both wastes (s^2-1)/s^2 of the MXU multiplies
    on zeros and is mis-lowered by the current TPU backend for
    stride-indivisible widths like 854 — and (c) a single MXU-shaped matmul.

    A generic input-dilated path covers k != 2*stride.
    """
    k = kernel.shape[0]
    if stride > 1 and k == 2 * stride:
        return _deconv_pixel_shuffle(x, kernel, stride)
    # generic gradient-of-conv path:
    # (kh,kw,out,in) -> HWIO with I=deconv-in, O=deconv-out, spatially flipped
    rhs = jnp.flip(jnp.swapaxes(kernel, 2, 3), axis=(0, 1))
    return lax.conv_general_dilated(
        x, rhs,
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )


def deconv_phase_map(x: jax.Array, kernel: jax.Array, s: int) -> jax.Array:
    """The kernel-segregated 2x2 conv of the pixel-shuffle deconv lowering
    WITHOUT the depth-to-space interleave: returns the phase map
    ``(N, hp, wp, s*s*co)`` where full-res pixel ``(a*s + r1, b*s + r2)`` of
    channel ``c`` lives at ``[n, a, b, (r1*s + r2)*co + c]``.

    Exposed separately so a fused mask-head tail can consume the phase maps
    of several side heads and emit one full-resolution sum directly — the
    per-head depth-to-space materializations are the serving tail's HBM
    cost. The Pallas kernel built on this was measured SLOWER than the XLA
    composition and retired (``tools/bench_fused_heads_retirement.py``,
    BENCHMARKS.md "Pallas kernels: measured and retired").
    """
    kh, kw, co, ci = kernel.shape
    assert kh == kw == 2 * s
    w = kernel.reshape(2, s, 2, s, co, ci)
    # conv offset d' relates to derivation's d by d = 1 - d': flip taps
    w = jnp.flip(w, axis=(0, 2))
    w = w.transpose(0, 2, 5, 1, 3, 4).reshape(2, 2, ci, s * s * co)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def depth_to_space_phases(y: jax.Array, s: int, co: int) -> jax.Array:
    """Interleave a ``(N, hp, wp, s*s*co)`` phase map back to
    ``(N, hp*s, wp*s, co)`` full resolution."""
    n, hp, wp, _ = y.shape
    y = y.reshape(n, hp, wp, s, s, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, hp * s, wp * s, co)


def _deconv_pixel_shuffle(x: jax.Array, kernel: jax.Array,
                          s: int) -> jax.Array:
    """Transposed conv with k == 2s as dense 2x2 conv + depth-to-space.

    Derivation: ``y[q*s + r] = sum_{d in {0,1}} x[q - d] * w[d*s + r]`` per
    spatial dim, so phase r needs taps {w[r], w[s+r]} — a 2-tap conv over x
    (left-padded by 1). All s^2 phases stack into the output channel dim and
    interleave back via reshape/transpose.
    """
    co = kernel.shape[2]
    return depth_to_space_phases(deconv_phase_map(x, kernel, s), s, co)


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


def stem_conv_s2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """7x7 stride-2 pad-3 conv via space-to-depth — numerically identical,
    MXU-friendly.

    A stride-2 conv on a 3-channel image contracts over only 3*49 values per
    output and leaves the systolic array mostly idle (channels pad to the
    128-lane tile). Rearranging 2x2 input pixels into channels turns it into
    a stride-1 4x4 conv over 12 channels — the standard TPU ResNet-stem
    rewrite. Exactness: tests/test_ops.py::test_stem_conv_s2d_matches_plain.

    Args:
      x: (N, H, W, C) input.
      kernel: (7, 7, C, out) HWIO weights of the equivalent plain conv.
    """
    n, h, w, c = x.shape
    kh, kw, _, out_ch = kernel.shape
    assert kh == 7 and kw == 7, 'stem rewrite is specific to k=7, s=2, p=3'
    xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hp, wp = xpad.shape[1], xpad.shape[2]
    xpad = jnp.pad(xpad, ((0, 0), (0, hp % 2), (0, wp % 2), (0, 0)))
    hp, wp = xpad.shape[1], xpad.shape[2]
    xs = (xpad.reshape(n, hp // 2, 2, wp // 2, 2, c)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(n, hp // 2, wp // 2, 4 * c))
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    kp = (k8.reshape(4, 2, 4, 2, c, out_ch)
          .transpose(0, 2, 1, 3, 4, 5)
          .reshape(4, 4, 4 * c, out_ch))
    y = lax.conv_general_dilated(
        xs, kp, (1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    oh = (h + 6 - 7) // 2 + 1
    ow = (w + 6 - 7) // 2 + 1
    return y[:, :oh, :ow]


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
