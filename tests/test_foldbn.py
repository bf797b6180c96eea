"""Tests for inference-time BatchNorm folding (compress/foldbn.py).

Measured on the chip the fold is +2.6% bf16 / +3.9% int8 at the b128
serving config (tools/bench_bn_fold_probe.py); these tests pin its
correctness contract on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.compress import foldbn, quantize
from fosvos_tpu.models import OSVOSResNet, OSVOSVGG, resnet_arch


@pytest.fixture(scope='module')
def tiny_resnet():
    arch = resnet_arch(18, scale_down_exponent=3)
    model = OSVOSResNet(arch=arch)
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN params/stats so the fold isn't an identity transform
    key = [jax.random.PRNGKey(7)]

    def perturb(a):
        key[0], k = jax.random.split(key[0])
        if a.dtype == jnp.float32:
            return a + 0.2 * jax.random.normal(k, a.shape, a.dtype)
        return a
    variables = jax.tree.map(perturb, variables)
    variables['batch_stats'] = jax.tree.map(
        lambda a: jnp.abs(a) + 0.3, variables['batch_stats'])
    return model, variables


def _frames(seed=0, n=2, h=32, w=48):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, h, w, 3) * 255).astype(np.float32) - 120.0


def test_discovery_pairs_every_trunk_bn(tiny_resnet):
    model, variables = tiny_resnet
    pairs = foldbn.discover_conv_bn_pairs(model, variables)
    # resnet18 trunk: base_bn + 2 BNs x 8 basic blocks + 3 downsample BNs
    n_bn = sum(1 for p in jax.tree_util.tree_leaves_with_path(
        variables['batch_stats'])
        if 'mean' in jax.tree_util.keystr(p[0]))
    assert len(pairs) == n_bn  # every BN in this model consumes a conv
    assert 'base_bn' in pairs
    assert pairs['base_bn'][0] == 'base_conv'
    assert pairs['stage0_block0/bn1'][0] == 'stage0_block0/conv1'


def test_vgg_has_no_pairs_and_passes_through():
    model = OSVOSVGG()
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    folded = foldbn.fold(model, variables)
    assert folded is variables  # unchanged object: no BN anywhere
    outs = foldbn.folded_apply(model, folded, jnp.asarray(_frames()))
    ref = model.apply(variables, jnp.asarray(_frames()), train=False)
    np.testing.assert_array_equal(np.asarray(outs[-1]), np.asarray(ref[-1]))


def test_folded_apply_matches_unfolded(tiny_resnet):
    """The serving contract: folded forward ~= original forward. Exact
    equality is impossible (kernel*g re-associates f32 rounding), but on a
    tiny net the drift must stay at float-noise level."""
    model, variables = tiny_resnet
    x = jnp.asarray(_frames())
    ref = model.apply(variables, x, train=False)[-1]
    folded = foldbn.fold(model, variables)
    got = foldbn.folded_apply(model, folded, x)[-1]
    ref, got = np.asarray(ref), np.asarray(got)
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 2e-3 * max(scale, 1.0)


def test_folded_tree_is_self_consistent_under_plain_apply(tiny_resnet):
    """Identity-BN rewrite: model.apply on the FOLDED tree must equal
    folded_apply bit-for-bit modulo the redundant multiply — consumers
    that don't know about folding (int8 calibration) stay correct."""
    model, variables = tiny_resnet
    x = jnp.asarray(_frames(1))
    folded = foldbn.fold(model, variables)
    plain = {k: v for k, v in folded.items() if k != foldbn.FOLD_COLLECTION}
    via_plain = model.apply(plain, x, train=False)[-1]
    via_fold = foldbn.folded_apply(model, folded, x)[-1]
    np.testing.assert_allclose(np.asarray(via_plain), np.asarray(via_fold),
                               rtol=0, atol=1e-5)


def test_fold_does_not_mutate_input_tree(tiny_resnet):
    model, variables = tiny_resnet
    before = np.asarray(
        variables['params']['base_conv']['kernel']).copy()
    foldbn.fold(model, variables)
    np.testing.assert_array_equal(
        before, np.asarray(variables['params']['base_conv']['kernel']))


def test_folded_apply_refuses_train_mode(tiny_resnet):
    model, variables = tiny_resnet
    folded = foldbn.fold(model, variables)
    with pytest.raises(ValueError, match='inference-only'):
        foldbn.folded_apply(model, folded, jnp.asarray(_frames()),
                            train=True)


def test_fold_composes_with_int8(tiny_resnet):
    """quantize the FOLDED tree, serve via folded_apply(apply_fn=
    quantized_apply) — the int8+fold serving config."""
    model, variables = tiny_resnet
    x = jnp.asarray(_frames(2))
    folded = foldbn.fold(model, variables)
    qp = quantize.build_qparams(model, folded, [x])
    out_q = foldbn.folded_apply(
        model, folded, x,
        apply_fn=lambda v, xx, **kw: quantize.quantized_apply(
            model, v, qp.tree(), xx, **kw))[-1]
    ref = model.apply(variables, x, train=False)[-1]
    # int8 tolerance mirrors tests/test_quantize.py's serving bound
    ref, out_q = np.asarray(ref), np.asarray(out_q)
    denom = max(np.abs(ref).max(), 1.0)
    assert np.abs(ref - out_q).max() / denom < 0.15
    assert (np.sign(ref) == np.sign(out_q)).mean() > 0.9


def test_fold_qparams_fixes_external_scales(tiny_resnet):
    """qparams built on the UNFOLDED weights dequantize wrongly next to a
    folded tree unless fold_qparams absorbs g into the scales."""
    model, variables = tiny_resnet
    x = jnp.asarray(_frames(3))
    qp_unfolded = quantize.build_qparams(model, variables, [x])
    folded = foldbn.fold(model, variables)
    fixed = foldbn.fold_qparams(model, variables, qp_unfolded.tree())
    out = foldbn.folded_apply(
        model, folded, x,
        apply_fn=lambda v, xx, **kw: quantize.quantized_apply(
            model, v, fixed, xx, **kw))[-1]
    ref = model.apply(variables, x, train=False)[-1]
    ref, out = np.asarray(ref), np.asarray(out)
    denom = max(np.abs(ref).max(), 1.0)
    assert np.abs(ref - out).max() / denom < 0.15
    assert (np.sign(ref) == np.sign(out)).mean() > 0.9


def test_engine_fold_bn_float_and_int8(tiny_resnet):
    """InferenceEngine(fold_bn=True) masks agree with the unfolded engine
    in float mode and in self-calibrating int8 mode."""
    from fosvos_tpu.evaluation.experiment import InferenceEngine
    model, variables = tiny_resnet
    frames = _frames(4, n=4)

    base = InferenceEngine(model, batch_size=2)
    fold = InferenceEngine(model, batch_size=2, fold_bn=True)
    m0 = base.masks_for_sequence(variables, frames)
    m1 = fold.masks_for_sequence(variables, frames)
    assert m0.shape == m1.shape
    # uint8 probability maps: folding noise stays within a few counts
    assert np.abs(m0.astype(int) - m1.astype(int)).max() <= 4

    base_q = InferenceEngine(model, batch_size=2, int8=True)
    fold_q = InferenceEngine(model, batch_size=2, int8=True, fold_bn=True)
    q0 = base_q.masks_for_sequence(variables, frames)
    q1 = fold_q.masks_for_sequence(variables, frames)
    agree = (np.abs(q0.astype(int) - q1.astype(int)) <= 16).mean()
    assert agree > 0.99


def test_engine_fold_bn_with_external_qparams(tiny_resnet):
    """set_qparams on a folded engine routes through fold_qparams."""
    from fosvos_tpu.evaluation.experiment import InferenceEngine
    model, variables = tiny_resnet
    frames = _frames(5, n=2)
    qp = quantize.build_qparams(model, variables, [jnp.asarray(frames)])

    eng = InferenceEngine(model, batch_size=2, int8=True, fold_bn=True)
    eng.set_qparams(variables, qp)
    m_fold = eng.masks_for_sequence(variables, frames)

    ref_eng = InferenceEngine(model, batch_size=2, int8=True)
    ref_eng.set_qparams(variables, qp)
    m_ref = ref_eng.masks_for_sequence(variables, frames)
    agree = (np.abs(m_ref.astype(int) - m_fold.astype(int)) <= 16).mean()
    assert agree > 0.99
