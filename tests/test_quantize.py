"""Tests for the int8 post-training-quantization serving path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fosvos_tpu.compress import quantize
from fosvos_tpu.models import OSVOSResNet, OSVOSVGG, resnet_arch


@pytest.fixture(scope='module')
def tiny_resnet():
    arch = resnet_arch(18, scale_down_exponent=3)
    model = OSVOSResNet(arch=arch)
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def _frames(seed=0, n=2, h=32, w=48):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, h, w, 3) * 255).astype(np.float32) - 120.0


def test_conv_paths_covers_trunk_and_heads(tiny_resnet):
    model, variables = tiny_resnet
    paths = quantize.conv_paths(model, variables,
                                jnp.zeros((1, 32, 48, 3), jnp.float32))
    assert 'base_conv' in paths
    assert 'stage0_block0/conv1' in paths
    assert 'head0/side_prep' in paths
    assert 'head3/score_dsn' in paths
    # deconvs are not nn.Conv and must not appear
    assert not any('upscale' in p for p in paths)
    skipped = quantize.conv_paths(model, variables,
                                  jnp.zeros((1, 32, 48, 3), jnp.float32),
                                  skip=('score_dsn',))
    assert not any('score_dsn' in p for p in skipped)


def test_weight_quantization_roundtrip(tiny_resnet):
    model, variables = tiny_resnet
    w = quantize.quantize_weights(variables, ['stage1_block0/conv1'])
    kq = w['kernels']['stage1_block0/conv1']
    s = w['wscale']['stage1_block0/conv1']
    assert kq.dtype == jnp.int8
    k = variables['params']['stage1_block0']['conv1']['kernel']
    deq = np.asarray(kq, np.float32) * np.asarray(s)
    # per-channel symmetric: max error half a step per channel
    err = np.abs(deq - np.asarray(k))
    assert (err <= 0.5 * np.asarray(s)[None, None, None, :] + 1e-7).all()
    # full range used: every output channel has a +-127 entry
    assert (np.abs(np.asarray(kq)).reshape(-1, kq.shape[-1]).max(0)
            == 127).all()


@pytest.mark.parametrize('make', [
    lambda: OSVOSResNet(arch=resnet_arch(18, scale_down_exponent=3)),
    lambda: OSVOSVGG(),
])
def test_quantized_forward_close_to_float(make):
    model = make()
    x0 = jnp.asarray(_frames(seed=1))
    variables = model.init(jax.random.PRNGKey(1), x0[:1], train=False)
    qp = quantize.build_qparams(model, variables, [_frames(seed=2)])
    ref = model.apply(variables, x0, train=False)
    out = quantize.quantized_apply(model, variables, qp.tree(), x0)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        r = np.asarray(r, np.float32)
        o = np.asarray(o, np.float32)
        scale = np.abs(r).max() + 1e-6
        assert np.abs(o - r).max() / scale < 0.12
        # predictions agree: sign of the fused logits mostly matches
    agree = np.mean(np.sign(np.asarray(out[-1])) == np.sign(np.asarray(ref[-1])))
    assert agree > 0.95


def test_qparams_tree_is_jittable(tiny_resnet):
    model, variables = tiny_resnet
    x = jnp.asarray(_frames(seed=3))
    qp = quantize.build_qparams(model, variables, [np.asarray(x)])

    calls = []

    @jax.jit
    def fwd(v, qtree, imgs):
        calls.append(1)
        return quantize.quantized_apply(model, v, qtree, imgs)[-1]

    a = fwd(variables, qp.tree(), x)
    # a rescaled qparams pytree must NOT retrigger compilation
    qp2 = quantize.QuantizedParams.from_tree(
        jax.tree.map(lambda v: v, qp.tree()))
    qp2.act_scale = {k: v * 1.5 for k, v in qp2.act_scale.items()}
    b = fwd(variables, qp2.tree(), x)
    assert len(calls) == 1
    assert a.shape == b.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_calibration_margin_and_multiple_batches(tiny_resnet):
    model, variables = tiny_resnet
    b1, b2 = _frames(seed=4), _frames(seed=5) * 2.0
    qp1 = quantize.build_qparams(model, variables, [b1])
    qp12 = quantize.build_qparams(model, variables, [b1, b2])
    qpm = quantize.build_qparams(model, variables, [b1], margin=2.0)
    # input conv scale grows with the larger calibration set / margin
    s1 = float(qp1.act_scale['base_conv'])
    assert float(qp12.act_scale['base_conv']) >= s1
    assert float(qpm.act_scale['base_conv']) == pytest.approx(2 * s1, rel=1e-5)


def test_int8_composes_with_pruned_model(tiny_resnet):
    """The acceleration legs compose: a channel-pruned model (materialized to
    its small functional form, ``compress/prune.py:materialize``) can be
    int8-quantized and served like any other model. Mirrors the reference's
    stacking of prune + speed eval (``/root/reference/src/prune.py:634-640``)
    with the TPU-native PTQ leg on top."""
    from fosvos_tpu.compress import prune
    from fosvos_tpu.models import resnet_arch

    arch = resnet_arch(18, scale_down_exponent=3)
    model = OSVOSResNet(arch=arch)
    x0 = jnp.asarray(_frames(seed=7))
    variables = model.init(jax.random.PRNGKey(2), x0[:1], train=False)

    # prune ~1/8 of the channels at every site, materialize the small net
    rng = np.random.RandomState(3)
    masks = prune.init_masks(arch)
    plan = []
    for site, width in prune.mask_sites(arch).items():
        for c in rng.choice(width, size=max(1, width // 8), replace=False):
            plan.append((site, int(c)))
    masks = prune.apply_plan(masks, plan)
    small_arch, small_vars = prune.materialize(arch, variables, masks)
    small_model = OSVOSResNet(arch=small_arch)
    small_vars = {
        'params': jax.tree.map(jnp.asarray, small_vars['params']),
        'batch_stats': jax.tree.map(jnp.asarray, small_vars['batch_stats']),
    }

    ref = small_model.apply(small_vars, x0, train=False)
    qp = quantize.build_qparams(small_model, small_vars, [_frames(seed=8)])
    # every conv of the pruned net is quantized (none silently skipped)
    paths = quantize.conv_paths(small_model, small_vars, x0[:1])
    assert set(qp.wscale) == set(paths)
    out = quantize.quantized_apply(small_model, small_vars, qp.tree(), x0)
    for o, r in zip(out, ref):
        r, o = np.asarray(r, np.float32), np.asarray(o, np.float32)
        assert np.abs(o - r).max() / (np.abs(r).max() + 1e-6) < 0.12
    agree = np.mean(np.sign(np.asarray(out[-1]))
                    == np.sign(np.asarray(ref[-1])))
    assert agree > 0.95
