"""Shared flax modules: torch-semantics BatchNorm, deconv upsampling, side heads.

These reproduce the exact numerics of the torch layers the reference composes
(``osvos_vgg.py``, ``osvos_resnet.py``) while staying idiomatic flax/XLA:
NHWC layout, static-shape center crops, and frozen bilinear deconvs whose
weights live in the param tree (so the optimizer's zero-lr group contract from
``network_provider.py:118-120`` carries over unchanged).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fosvos_tpu.core import ops

# Conv weight init used everywhere in the reference: N(0, 0.001), zero bias
# (osvos_vgg.py:99-102, osvos_resnet.py:153-157).
conv_init = nn.initializers.normal(stddev=0.001)


# torch's BatchNorm2d default momentum; the single source of truth for the
# whole model zoo (train.online.window_step_fns replays running-stat EMAs
# from one-update results and must agree with this value)
BN_MOMENTUM = 0.1


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch semantics.

    torch defaults: eps=1e-5, momentum=0.1 (``new = 0.9*old + 0.1*batch``),
    normalization uses the *biased* batch variance while running-variance
    updates use the *unbiased* estimator — flax's BatchNorm updates with the
    biased one, so we implement it directly.
    """
    momentum: float = BN_MOMENTUM
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))

        if train:
            n = x.size // c
            mean = jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2))
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32) - mean), axis=(0, 1, 2))
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class FuseParams(nn.Module):
    """Holds the fuse 1x1 conv weights (reference ``osvos_vgg.py:56`` /
    ``osvos_resnet.py:148``) with the standard ``{kernel, bias}`` tree, but
    the conv itself is computed distributed across the side heads (fuse
    contraction — see :class:`SideHead`)."""
    in_ch: int
    n_out: int

    def setup(self):
        self.kernel = self.param('kernel', conv_init,
                                 (1, 1, self.in_ch, self.n_out))
        self.bias = self.param('bias', nn.initializers.zeros, (self.n_out,))


def _bilinear_deconv_init(out_ch: int, in_ch: int, size: int):
    """Init for deconv kernels: per-channel bilinear on the diagonal,
    zeros elsewhere — the reference's interp_surgery (osvos_layers.py:70-81),
    generalized to non-square channel counts (zeros beyond the diagonal)."""
    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (size, size, out_ch, in_ch)
        filt = ops.upsample_filt(size).astype(np.float32)
        w = np.zeros(shape, np.float32)
        for c in range(min(out_ch, in_ch)):
            w[:, :, c, c] = filt
        return jnp.asarray(w, dtype)
    return init


class Deconv(nn.Module):
    """Transposed conv with torch ``ConvTranspose2d(padding=0, bias=False)``
    semantics; kernel layout ``(k, k, out, in)`` (see ops.conv_transpose).

    Initialized to frozen bilinear interpolation. The weight is a regular
    param — "frozen" is enforced by the zero-lr optimizer group, exactly as
    in the reference (``network_provider.py:118-120``). setup-style so the
    kernel can also be *read* without applying the op (fuse contraction in
    :class:`SideHead`).
    """
    in_ch: int
    out_ch: int
    kernel_size: int
    stride: int

    def setup(self):
        self.kernel = self.param(
            'kernel',
            _bilinear_deconv_init(self.out_ch, self.in_ch, self.kernel_size),
            (self.kernel_size, self.kernel_size, self.out_ch, self.in_ch))

    def __call__(self, x: jax.Array) -> jax.Array:
        return ops.conv_transpose(x, self.kernel.astype(x.dtype), self.stride)


class SideHead(nn.Module):
    """One OSVOS side output head.

    Reference semantics (osvos_vgg.py:42-48,69-78 / osvos_resnet.py:123-150):
    side_prep 3x3 conv -> {upscale deconv (16ch) -> crop} feeding the fuse
    1x1 conv, and {score_dsn 1x1 conv -> upscale deconv (1ch) -> crop} as the
    deep-supervision output.

    TPU-critical rewrite: the 16-channel full-resolution side map exists only
    as input to the fuse 1x1 conv, so the head takes this stage's slice of the
    fuse kernel and **contracts it into the deconv's output channels**:

        crop(deconv_K(prep)) @ Wf  ==  crop(deconv_{K~}(prep)),
        K~[h,w,:,i] = sum_c K[h,w,c,i] * Wf[c]

    — an identity for any (also trained) deconv weights. The (N,480,854,16)
    per-head map (420 MB at batch 16) is never materialized; each head emits
    its 1-channel fuse contribution directly. Measured: the four side heads
    drop from ~90% of inference time to near-noise.

    Returns ``(fuse_contribution (N,H,W,n_out), side_out (N,H,W,n_out))``.
    """
    in_ch: int
    prep_ch: int
    n_out: int
    up_kernel: int
    up_stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, out_h: int, out_w: int,
                 fuse_weights: jax.Array):
        side_prep = nn.Conv(self.prep_ch, (3, 3), padding=1,
                            kernel_init=conv_init, dtype=self.dtype,
                            name='side_prep')(x)

        k = self.up_kernel
        deconv16 = Deconv(self.prep_ch, self.prep_ch, k, self.up_stride,
                          name='upscale_side_prep')
        kernel16 = deconv16.kernel  # param only; full-width op never runs
        fw = fuse_weights.reshape(self.prep_ch, self.n_out)
        contracted = jnp.einsum('hwoi,on->hwni', kernel16.astype(jnp.float32),
                                fw.astype(jnp.float32)).astype(x.dtype)
        fuse_contrib = ops.center_crop(
            ops.conv_transpose(side_prep, contracted, self.up_stride),
            out_h, out_w)

        score = nn.Conv(self.n_out, (1, 1), padding=0,
                        kernel_init=conv_init, dtype=self.dtype,
                        name='score_dsn')(side_prep)
        up_ = Deconv(self.n_out, self.n_out, k,
                     self.up_stride, name='upscale_score_dsn')(score)
        side_out = ops.center_crop(up_, out_h, out_w)

        return fuse_contrib, side_out
