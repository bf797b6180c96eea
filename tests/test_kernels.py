"""Pallas kernel parity tests (interpret mode on CPU; same code compiles on
TPU — validated separately on hardware)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.core import kernels, ops


@pytest.mark.parametrize('shape', [(1, 64, 96, 1), (2, 33, 57, 1), (480, 854)])
@pytest.mark.parametrize('size_average', [True, False])
def test_cbce_pallas_matches_reference(shape, size_average):
    rng = np.random.RandomState(0)
    z = rng.randn(*shape).astype(np.float32) * 6
    lab = (rng.rand(*shape) > 0.7).astype(np.float32)
    want = float(ops.class_balanced_cross_entropy_loss(
        jnp.asarray(z), jnp.asarray(lab), size_average=size_average))
    got = float(kernels.class_balanced_bce_pallas(
        jnp.asarray(z), jnp.asarray(lab), size_average))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize('size_average', [True, False])
def test_cbce_pallas_gradient_matches_autodiff(size_average):
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(1, 40, 56, 1).astype(np.float32) * 4)
    lab = jnp.asarray((rng.rand(1, 40, 56, 1) > 0.6).astype(np.float32))

    g_ref = jax.grad(lambda zz: ops.class_balanced_cross_entropy_loss(
        zz, lab, size_average=size_average))(z)
    g_pal = jax.grad(lambda zz: kernels.class_balanced_bce_pallas(
        zz, lab, size_average))(z)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_cbce_pallas_under_jit_and_nonaligned_rows():
    # 33*57 rows -> padding path exercised
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(33, 57).astype(np.float32))
    lab = jnp.asarray((rng.rand(33, 57) > 0.5).astype(np.float32))
    f = jax.jit(lambda a, b: kernels.class_balanced_bce_pallas(a, b, True))
    want = float(ops.class_balanced_cross_entropy_loss(z, lab))
    assert float(f(z, lab)) == pytest.approx(want, rel=1e-5)


def test_preprocess_pallas_matches_numpy():
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(2, 50, 70, 3)).astype(np.uint8)
    mean = (104.00699, 116.66877, 122.67892)
    got = np.asarray(kernels.preprocess_frames_pallas(jnp.asarray(frames),
                                                      mean))
    want = frames.astype(np.float32) - np.asarray(mean, np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
