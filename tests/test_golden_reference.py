"""Golden parity against the ACTUAL reference implementation.

``tests/fixtures/golden_reference.npz`` was produced by running the real
reference forwards (``/root/reference/src/networks/osvos_vgg.py:61-83``,
``osvos_resnet.py:42-72``) under torch CPU with weights regenerated
deterministically from their state_dict keys (``tests/golden_weights.py``;
generation script ``tools/make_golden_reference.py``). These tests rebuild
the same weights, import them through ``models/import_torch.py`` — the
production checkpoint-migration path — and assert our flax forwards
reproduce the recorded output maps.

Unlike ``test_model_parity.py`` (which compares against torch modules
rebuilt from the spec inside the test), this closes the "both sides misread
the reference" hole: the right-hand side here is the reference's own code.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from fosvos_tpu.models import OSVOSVGG, import_torch, make_resnet
from tests import golden_weights as gw

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'golden_reference.npz')


@pytest.fixture(scope='module')
def data():
    return np.load(FIXTURE)


def _state_dict(data, family):
    manifest = gw.manifest_from_npz(data, family)
    sd = gw.build_state_dict(family, manifest)
    # regenerated bits must equal what the reference module actually ran
    # with (guards numpy RandomState / manifest-order drift)
    np.testing.assert_allclose(gw.checksums(sd, manifest),
                               data[f'{family}/checksums'], rtol=1e-12)
    return sd


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _assert_outputs(outs_jax, data, family, mode=''):
    assert len(outs_jax) == 5
    for i, o in enumerate(outs_jax):
        want = data[f'{family}/out{mode}{i}']          # NCHW (1,1,H,W)
        got = np.transpose(np.asarray(o), (0, 3, 1, 2))
        # fp32 conv stacks, XLA vs torch CPU: ~1e-5 relative; activations
        # are O(100) by design (He-scaled fixture weights)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-3,
                                    err_msg=f'{family} output {i} {mode}')


def test_vgg16_matches_reference_forward(data):
    sd = _state_dict(data, 'vgg16')
    params = import_torch.osvos_vgg_checkpoint_to_params(sd)
    model = OSVOSVGG()
    outs = model.apply({'params': params}, _nhwc(data['input']))
    _assert_outputs(outs, data, 'vgg16')


def test_resnet18_matches_reference_forward_eval_bn(data):
    sd = _state_dict(data, 'resnet18')
    model = make_resnet(18)
    variables = import_torch.osvos_resnet_checkpoint_to_variables(
        sd, model.arch)
    outs = model.apply(variables, _nhwc(data['input']), train=False)
    _assert_outputs(outs, data, 'resnet18', mode='_eval')


def test_resnet18_matches_reference_forward_train_bn(data):
    """The reference never calls net.eval() at test time
    (experiment_helper.py:20-64), so its inference actually normalizes with
    batch statistics — the mode our engines replicate; pin it too."""
    sd = _state_dict(data, 'resnet18')
    model = make_resnet(18)
    variables = import_torch.osvos_resnet_checkpoint_to_variables(
        sd, model.arch)
    outs, _ = model.apply(variables, _nhwc(data['input']), train=True,
                          mutable=['batch_stats'])
    _assert_outputs(outs, data, 'resnet18', mode='_train')
