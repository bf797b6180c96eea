"""Optimizer presets: the reference's per-parameter-group tables in optax.

The reference encodes optimizers as integer "variants" constructed per
provider (``network_provider.py:98-125`` VGG offline, ``:144-159`` VGG online,
``:181-367`` ResNet offline, ``:387-528`` ResNet online). Here each variant is
a declarative :class:`Preset`; the 10-group torch ``optim.SGD([...])`` tables
become one optax chain with per-group lr/wd masks derived from param paths.

Group semantics reproduced exactly (grouped presets):

=============  ==========  ====
group          lr factor   wd
=============  ==========  ====
trunk weight        1      yes
trunk bias          2      no
side_prep w         1      yes
side_prep b         2      no
score_dsn w        1/10    yes
score_dsn b        2/10    no
upscale (all)       0      no   (frozen bilinear deconvs)
fuse w             1/100   yes
fuse b             2/100   no
stem (ResNet)       0      no   (layer_base absent from the group tables)
=============  ==========  ====

torch semantics preserved: SGD momentum without dampening, L2-style weight
decay added to the gradient *before* momentum/Adam (not decoupled).

Note: reference variants {1,2,4,6,8} (offline) and {2,3,5} (online) pass a
list of *bound methods* to the torch optimizer — they crash at construction
in the reference and are therefore mapped here to flat presets of the same
family with torch-default hyperparameters, documented as such.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import optax


# Canonical OSVOS hyperparameter defaults (reference
# ``src/config/params_abstract.py:3-16`` — vestigial there, but documenting
# the canonical values; they anchor every preset/budget below).
DEFAULT_LR = 1e-8
DEFAULT_WD = 0.0002
DEFAULT_AVG_GRAD_EVERY_N = 5
DEFAULT_N_EPOCHS = 2000


# ---------------------------------------------------------------------------
# Param labeling
# ---------------------------------------------------------------------------

GROUPS = ('trunk_w', 'trunk_b', 'side_prep_w', 'side_prep_b',
          'score_dsn_w', 'score_dsn_b', 'upscale', 'fuse_w', 'fuse_b',
          'stem')


def _label_of(path: Tuple[str, ...]) -> str:
    keys = [getattr(p, 'key', str(p)) for p in path]
    top = keys[0]
    leaf = keys[-1]
    is_bias = leaf == 'bias'
    if top in ('fuse', 'layer_fuse'):
        return 'fuse_b' if is_bias else 'fuse_w'
    if top.startswith('head'):
        mod = keys[1]
        if mod.startswith('upscale'):
            return 'upscale'
        if mod == 'side_prep':
            return 'side_prep_b' if is_bias else 'side_prep_w'
        if mod == 'score_dsn':
            return 'score_dsn_b' if is_bias else 'score_dsn_w'
    if top.startswith('base_'):
        # ResNet stem: excluded from every grouped table in the reference
        # (network_provider.py:185-204 lists only layer_stages/heads/fuse).
        return 'stem'
    # trunk: stage convs, BN scale/bias, downsample
    return 'trunk_b' if is_bias else 'trunk_w'


def label_params(params) -> Any:
    """Pytree of group labels, same structure as ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _label_of(path), params)


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Preset:
    family: str = 'sgd'        # sgd | adam | adagrad | adadelta | adamax
    lr: float = DEFAULT_LR
    weight_decay: float = DEFAULT_WD
    momentum: float = 0.9
    grouped: bool = True       # per-group lr table vs flat net.parameters()
    # VGG online omits score_dsn groups entirely (network_provider.py:144-159)
    freeze_score_dsn: bool = False


def _family_transform(p: Preset) -> optax.GradientTransformation:
    if p.family == 'sgd':
        return optax.trace(decay=p.momentum, nesterov=False)
    if p.family == 'adam':
        return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    if p.family == 'adagrad':
        return optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10)
    if p.family == 'adadelta':
        return optax.scale_by_adadelta(rho=0.9, eps=1e-6)
    if p.family == 'adamax':
        return optax.scale_by_adamax(b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f'unknown optimizer family {p.family!r}')


_GROUP_LR_FACTOR: Dict[str, float] = {
    'trunk_w': 1.0, 'trunk_b': 2.0,
    'side_prep_w': 1.0, 'side_prep_b': 2.0,
    'score_dsn_w': 0.1, 'score_dsn_b': 0.2,
    'upscale': 0.0, 'fuse_w': 0.01, 'fuse_b': 0.02,
    'stem': 0.0,
}
_GROUP_HAS_WD = {'trunk_w', 'side_prep_w', 'score_dsn_w', 'fuse_w'}


def make_optimizer(preset: Preset, params) -> optax.GradientTransformation:
    """Build the optax chain for a preset over a concrete param tree."""
    labels = label_params(params)

    if preset.grouped:
        lr_factors = {g: _GROUP_LR_FACTOR[g] for g in GROUPS}
        wd_groups = set(_GROUP_HAS_WD)
        if preset.freeze_score_dsn:
            lr_factors['score_dsn_w'] = 0.0
            lr_factors['score_dsn_b'] = 0.0
            wd_groups.discard('score_dsn_w')
        wd_mask = jax.tree.map(lambda g: g in wd_groups, labels)
        lr_tree = jax.tree.map(lambda g: lr_factors[g] * preset.lr, labels)
    else:
        # flat: every param (incl. stem and frozen-bilinear deconvs) trains,
        # like torch net.parameters() (network_provider.py:317-366)
        wd_mask = jax.tree.map(lambda g: True, labels)
        lr_tree = jax.tree.map(lambda g: preset.lr, labels)

    chain = []
    if preset.weight_decay:
        chain.append(optax.add_decayed_weights(preset.weight_decay,
                                               mask=wd_mask))
    chain.append(_family_transform(preset))
    chain.append(optax.GradientTransformation(
        init=lambda params: optax.EmptyState(),
        update=lambda updates, state, params=None: (
            jax.tree.map(lambda u, lr: -lr * u, updates, lr_tree), state),
    ))
    return optax.chain(*chain)


# ---------------------------------------------------------------------------
# Variant tables (reference network_provider.py)
# ---------------------------------------------------------------------------

def _flat(family: str, lr: float, wd: float = 0.0002) -> Preset:
    return Preset(family=family, lr=lr, weight_decay=wd, grouped=False)


_LR_GRID = {10: 1e-3, 11: 1e-4, 12: 1e-5, 13: 1e-6, 14: 1e-7, 15: 1e-8,
            22: 1.0, 23: 1e-1, 24: 1e-2, 28: 2.5e-5, 29: 5e-5, 30: 7.5e-5}
_SGD_GRID = {16: 1e-3, 17: 1e-4, 18: 1e-5, 19: 1e-6, 20: 1e-7, 21: 1e-8,
             25: 1.0, 26: 1e-1, 27: 1e-2, 31: 2.5e-8, 32: 5e-8, 33: 7.5e-8}


def offline_variant(v: Optional[int]) -> Preset:
    """ResNet offline variant table, network_provider.py:206-367.

    Variant 11 (Adam 1e-4, wd 2e-4, flat) is the production setting used by
    every downstream pipeline (train_online.py:136, prune.py:559, mimic.py:48).
    """
    if v is None or v == 0:
        return Preset()  # grouped SGD, base lr 1e-8
    if v == 3:
        return Preset(family='adam', lr=1e-8)
    if v == 5:
        return Preset(family='adagrad', lr=1e-8)
    if v == 7:
        return Preset(family='adadelta', lr=1e-8)
    if v == 9:
        return Preset(family='adamax', lr=1e-8)
    # broken-in-reference method-list variants -> flat family defaults
    if v == 1:
        return _flat('sgd', 1e-3, 0.0)
    if v == 2:
        return _flat('adam', 1e-3, 0.0)
    if v == 4:
        return _flat('adagrad', 1e-2, 0.0)
    if v == 6:
        return _flat('adadelta', 1.0, 0.0)
    if v == 8:
        return _flat('adamax', 2e-3, 0.0)
    if v in _LR_GRID:
        return _flat('adam', _LR_GRID[v])
    if v in _SGD_GRID:
        return Preset(family='sgd', lr=_SGD_GRID[v], grouped=False)
    raise ValueError('invalid variant')


def online_variant(v: Optional[int]) -> Preset:
    """ResNet online variant table, network_provider.py:412-528."""
    if v is None or v == 0 or v == 1:
        return Preset()
    if v == 4:
        return Preset(family='adam', lr=1e-8)
    if v == 6:
        return Preset(family='adadelta', lr=1e-8)
    if v == 2:
        return _flat('sgd', 1e-3, 0.0)
    if v == 3:
        return _flat('adam', 1e-3, 0.0)
    if v == 5:
        return _flat('adadelta', 1.0, 0.0)
    if v in _LR_GRID:
        return _flat('adam', _LR_GRID[v])
    if v in _SGD_GRID:
        return Preset(family='sgd', lr=_SGD_GRID[v], grouped=False)
    raise ValueError('invalid variant')


def vgg_offline_preset() -> Preset:
    """VGG offline default: grouped SGD 1e-8 (network_provider.py:98-125)."""
    return Preset()


def vgg_online_preset() -> Preset:
    """VGG online: same but score_dsn untouched (network_provider.py:144-159)."""
    return Preset(freeze_score_dsn=True)
