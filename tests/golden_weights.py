"""Deterministic weights for the reference-forward golden fixture.

The fixture (``tests/fixtures/golden_reference.npz``) pins OUR model
forwards against output maps produced by the ACTUAL reference
implementation (``/root/reference/src/networks/osvos_vgg.py:61-83``,
``osvos_resnet.py:42-72``) executed under torch CPU — closing the "both
sides misread the spec" hole that spec-rebuilt torch modules
(``tests/test_model_parity.py``) cannot catch.

Committing full state_dicts would cost 50-100 MB, so weights are NOT
stored: every array regenerates deterministically from its state_dict KEY
alone (crc32-seeded numpy RandomState), identically in
``tools/make_golden_reference.py`` (which assigns them into the reference
torch modules and records the forward outputs) and in
``tests/test_golden_reference.py`` (which feeds the same arrays through
``models/import_torch.py`` into our flax models). The npz stores only the
key->shape manifest, per-key abs-sum checksums (guarding RandomState
drift), the input, and the output maps.
"""
import json
import zlib

import numpy as np


def golden_array(key: str, shape) -> np.ndarray:
    """The unique deterministic array for one (namespaced) state_dict key.

    Conv/deconv kernels use a He-ish scale so activations stay O(1) —
    the reference's own N(0, 0.001) init (osvos_vgg.py:99-102) would
    shrink the deepest head's activations to ~1e-12, making output
    comparisons numerically meaningless. Deconvs are random too (not
    bilinear): the fixture then also pins the generic transposed-conv
    math for *trained* upscale weights, which the bilinear-only tests
    in test_ops.py never exercise.
    """
    shape = tuple(int(s) for s in shape)
    rng = np.random.RandomState(zlib.crc32(key.encode()) & 0xffffffff)
    leaf = key.rsplit('.', 1)[-1]
    if leaf == 'weight' and len(shape) == 4:      # conv / deconv kernel
        fan = float(np.prod(shape[1:]))
        return (rng.standard_normal(shape)
                * np.sqrt(2.0 / fan)).astype(np.float32)
    if leaf in ('weight', 'running_var'):         # BN scale / var: positive
        return rng.uniform(0.75, 1.5, shape).astype(np.float32)
    if leaf in ('bias', 'running_mean'):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)
    raise ValueError(f'unexpected state_dict leaf in {key!r}')


def golden_input(shape=(1, 3, 67, 99)) -> np.ndarray:
    """Shared NCHW input: mean-subtracted-image scale, spatial dims chosen
    indivisible by the 32x total stride so the asymmetric ceil/floor
    center-crop path (reference osvos_layers.py:47-54) is exercised."""
    rng = np.random.RandomState(20260819)
    return (rng.standard_normal(shape) * 40.0).astype(np.float32)


def build_state_dict(family: str, manifest) -> dict:
    """Regenerate the full state_dict for one model family from its
    ``[(key, shape), ...]`` manifest (family string namespaces the seeds so
    vgg16/resnet18 weights decorrelate)."""
    return {key: golden_array(f'{family}:{key}', shape)
            for key, shape in manifest}


def manifest_from_npz(data, family: str):
    return json.loads(str(data[f'{family}/manifest']))


def checksums(sd: dict, manifest) -> np.ndarray:
    return np.asarray([float(np.abs(sd[key]).sum()) for key, _ in manifest],
                      np.float64)
