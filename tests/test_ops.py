"""Torch-parity tests for fosvos_tpu.core.ops.

torch (CPU) is available in the environment, so every op is validated
directly against the semantics the reference relies on
(``/root/reference/src/layers/osvos_layers.py``), without copying its code.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fosvos_tpu.core import ops


def _torch_cb_loss(output, label, size_average=True):
    """Reference formula (osvos_layers.py:17-44) evaluated with torch."""
    output = torch.as_tensor(output, dtype=torch.float32)
    label = torch.as_tensor(label, dtype=torch.float32)
    labels = torch.ge(label, 0.5).float()
    num_pos = torch.sum(labels)
    num_neg = torch.sum(1.0 - labels)
    num_total = num_pos + num_neg
    out_gt_zero = torch.ge(output, 0).float()
    loss_val = torch.mul(output, (labels - out_gt_zero)) - torch.log(
        1 + torch.exp(output - 2 * torch.mul(output, out_gt_zero)))
    loss_pos = torch.sum(-torch.mul(labels, loss_val))
    loss_neg = torch.sum(-torch.mul(1.0 - labels, loss_val))
    final = num_neg / num_total * loss_pos + num_pos / num_total * loss_neg
    if size_average:
        final = final / label.numel()
    return final.item()


@pytest.mark.parametrize('size_average', [True, False])
def test_class_balanced_bce_matches_torch(size_average):
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 33, 57, 1).astype(np.float32) * 8
    label = (rng.rand(2, 33, 57, 1) > 0.7).astype(np.float32)
    got = float(ops.class_balanced_cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(label), size_average=size_average))
    want = _torch_cb_loss(logits, label, size_average=size_average)
    assert got == pytest.approx(want, rel=1e-5)


def test_class_balanced_bce_soft_labels():
    # reference thresholds soft GT at 0.5 (osvos_layers.py:26)
    rng = np.random.RandomState(1)
    logits = rng.randn(1, 16, 16, 1).astype(np.float32)
    label = rng.rand(1, 16, 16, 1).astype(np.float32)
    got = float(ops.class_balanced_cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(label)))
    want = _torch_cb_loss(logits, label)
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_loss_equals_unmasked_with_full_mask():
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 24, 24, 1).astype(np.float32)
    label = (rng.rand(1, 24, 24, 1) > 0.5).astype(np.float32)
    full = jnp.ones_like(jnp.asarray(label))
    a = float(ops.class_balanced_cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(label), size_average=False))
    b = float(ops.class_balanced_cross_entropy_loss_masked(
        jnp.asarray(logits), jnp.asarray(label), full, size_average=False))
    assert a == pytest.approx(b, rel=1e-6)


def test_masked_loss_ignores_padding():
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 16, 16, 1).astype(np.float32)
    label = (rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32)
    # pad to 24x24 with garbage; mask marks the valid 16x16 region
    logits_p = np.full((1, 24, 24, 1), 99.0, np.float32)
    label_p = np.zeros((1, 24, 24, 1), np.float32)
    valid = np.zeros((1, 24, 24, 1), np.float32)
    logits_p[:, :16, :16] = logits
    label_p[:, :16, :16] = label
    valid[:, :16, :16] = 1.0
    a = float(ops.class_balanced_cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(label), size_average=False))
    b = float(ops.class_balanced_cross_entropy_loss_masked(
        jnp.asarray(logits_p), jnp.asarray(label_p), jnp.asarray(valid),
        size_average=False))
    assert a == pytest.approx(b, rel=1e-5)


@pytest.mark.parametrize('hw,target', [
    ((37, 53), (32, 48)),   # odd excess both dims
    ((40, 54), (32, 48)),   # even excess
    ((33, 48), (32, 48)),   # one-dim crop only
    ((480, 854), (480, 854)),  # no-op
])
def test_center_crop_matches_torch(hw, target):
    rng = np.random.RandomState(4)
    x = rng.randn(2, hw[0], hw[1], 3).astype(np.float32)
    got = np.asarray(ops.center_crop(jnp.asarray(x), *target))

    # torch reference: negative F.pad with ceil/floor (osvos_layers.py:47-54)
    xt = torch.as_tensor(x).permute(0, 3, 1, 2)
    crop_h = torch.FloatTensor([xt.size()[2]]).sub(target[0]).div(-2)
    crop_w = torch.FloatTensor([xt.size()[3]]).sub(target[1]).div(-2)
    want = F.pad(xt, [
        crop_w.ceil().int()[0], crop_w.floor().int()[0],
        crop_h.ceil().int()[0], crop_h.floor().int()[0],
    ]).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('size', [2, 3, 4, 8, 16, 32])
def test_upsample_filt_matches_reference_formula(size):
    # independent recomputation of the bilinear filter
    factor = (size + 1) // 2
    center = factor - 1 if size % 2 == 1 else factor - 0.5
    want = np.empty((size, size))
    for i in range(size):
        for j in range(size):
            want[i, j] = ((1 - abs(i - center) / factor)
                          * (1 - abs(j - center) / factor))
    np.testing.assert_allclose(ops.upsample_filt(size), want)


@pytest.mark.parametrize('cin,cout,k,s', [
    (1, 1, 4, 2),     # score_dsn upscale, VGG stage 1
    (16, 16, 8, 4),   # side_prep upscale, ResNet stage 0
    (16, 16, 16, 8),
    (3, 5, 6, 2),     # non-square channel counts, trained deconv case
])
def test_conv_transpose_matches_torch(cin, cout, k, s):
    rng = np.random.RandomState(5)
    x = rng.randn(2, 9, 11, cin).astype(np.float32)
    w_torch = rng.randn(cin, cout, k, k).astype(np.float32)

    want = F.conv_transpose2d(
        torch.as_tensor(x).permute(0, 3, 1, 2),
        torch.as_tensor(w_torch), stride=s,
    ).permute(0, 2, 3, 1).numpy()

    w_jax = jnp.asarray(w_torch.transpose(2, 3, 1, 0))  # (kh,kw,out,in)
    got = np.asarray(ops.conv_transpose(jnp.asarray(x), w_jax, s))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bilinear_deconv_kernel_is_identity_interpolation():
    """Upsampling a constant image with the bilinear deconv reproduces it
    in the center-cropped interior (the defining property of the
    interp_surgery weights, osvos_layers.py:68-81)."""
    c, s = 16, 4
    k = 2 * s
    x = jnp.ones((1, 10, 12, c), jnp.float32)
    w = jnp.asarray(ops.bilinear_deconv_kernel(c, k))
    y = ops.upsample_bilinear_deconv(x, w, s, 10 * s, 12 * s)
    assert y.shape == (1, 40, 48, c)
    interior = np.asarray(y)[:, s:-s, s:-s, :]
    np.testing.assert_allclose(interior, 1.0, rtol=1e-5)


@pytest.mark.parametrize('h,w', [(480, 854), (427, 61), (13, 13), (2, 2)])
def test_max_pool_ceil_matches_torch(h, w):
    rng = np.random.RandomState(6)
    x = rng.randn(1, h, w, 4).astype(np.float32)
    want = F.max_pool2d(torch.as_tensor(x).permute(0, 3, 1, 2),
                        kernel_size=2, stride=2, ceil_mode=True)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.max_pool_ceil(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('h,w', [(240, 427), (17, 31), (8, 8)])
def test_max_pool_torch_matches_torch(h, w):
    rng = np.random.RandomState(7)
    x = rng.randn(1, h, w, 4).astype(np.float32)
    want = F.max_pool2d(torch.as_tensor(x).permute(0, 3, 1, 2),
                        kernel_size=3, stride=2, padding=1)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.max_pool_torch(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('stride,padding', [(1, 1), (2, 3), (1, 0)])
def test_conv2d_matches_torch(stride, padding):
    rng = np.random.RandomState(8)
    k = 2 * padding + 1 if padding else 1
    x = rng.randn(2, 20, 24, 3).astype(np.float32)
    w_torch = rng.randn(8, 3, k, k).astype(np.float32)
    want = F.conv2d(torch.as_tensor(x).permute(0, 3, 1, 2),
                    torch.as_tensor(w_torch), stride=stride, padding=padding)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.conv2d(
        jnp.asarray(x), jnp.asarray(w_torch.transpose(2, 3, 1, 0)),
        stride=stride, padding=padding))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stem_conv_s2d_matches_plain():
    rng = np.random.RandomState(11)
    for h, w in [(480, 854), (33, 49), (32, 48)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        k = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32))
        plain = ops.conv2d(x, k, stride=2, padding=3)
        s2d = ops.stem_conv_s2d(x, k)
        assert s2d.shape == plain.shape
        np.testing.assert_allclose(np.asarray(s2d), np.asarray(plain),
                                   rtol=1e-4, atol=1e-4)
