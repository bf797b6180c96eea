"""Checkpointing: (arch config JSON, flat param npz) — never pickled code.

Keeps the reference's naming/cadence contract
(``network_provider.py:36-51``: ``{name}[_voff][_von][_seq]_epoch-{E}``) but
replaces both reference formats (state_dict .pth and whole-module pickle for
pruned nets, ``network_provider.py:57,63``) with a self-describing pair:

* ``<stem>.arch.json`` — the explicit architecture (so pruned/mimic topologies
  reload without executing pickled class code)
* ``<stem>.npz``       — flattened ``variables`` pytree (params + batch_stats)

Works for any pytree of arrays; keys are '/'-joined paths.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = '') -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}/'))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def checkpoint_stem(name: str, epoch: int,
                    variant_offline: Optional[int] = None,
                    variant_online: Optional[int] = None,
                    sequence: Optional[str] = None) -> str:
    """Reference file-name pattern, network_provider.py:36-51."""
    model_name = name
    if variant_offline is not None:
        model_name += '_' + str(variant_offline)
    if sequence is not None:
        if variant_online is not None:
            model_name += '_' + str(variant_online)
        model_name += '_' + sequence
    return f'{model_name}_epoch-{epoch}'


def save(dir_path: str, stem: str, variables: Any,
         arch_json: Optional[str] = None) -> str:
    d = Path(dir_path)
    d.mkdir(parents=True, exist_ok=True)
    flat = _flatten(jax.device_get(variables))
    path = d / f'{stem}.npz'
    np.savez(path, **flat)
    if arch_json is not None:
        (d / f'{stem}.arch.json').write_text(arch_json)
    return str(path)


def load(dir_path: str, stem: str) -> Tuple[Any, Optional[str]]:
    d = Path(dir_path)
    with np.load(d / f'{stem}.npz') as z:
        flat = {k: z[k] for k in z.files}
    arch_path = d / f'{stem}.arch.json'
    arch_json = arch_path.read_text() if arch_path.exists() else None
    return _unflatten(flat), arch_json


def exists(dir_path: str, stem: str) -> bool:
    return (Path(dir_path) / f'{stem}.npz').exists()
