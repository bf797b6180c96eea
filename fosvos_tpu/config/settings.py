"""Run-settings records, mirroring ``src/util/settings.py`` (attrs classes),
plus YAML serialization per run (``io_helper.py:50-59``)."""
from __future__ import annotations

import dataclasses
import datetime
from pathlib import Path
from typing import Optional


@dataclasses.dataclass
class Settings:
    is_training: bool = True
    is_testing: bool = True
    start_epoch: int = 0
    n_epochs: int = 240
    avg_grad_every_n: int = 10
    snapshot_every_n: int = 40
    is_testing_while_training: bool = False
    test_every_n: int = 5
    batch_size_train: int = 1
    batch_size_test: int = 1
    is_visualizing_network: bool = False
    is_visualizing_results: bool = False
    variant_offline: Optional[int] = None
    eval_speeds: bool = False


@dataclasses.dataclass
class OfflineSettings(Settings):
    is_loading_vgg_caffe: bool = False


@dataclasses.dataclass
class OnlineSettings(Settings):
    n_epochs: int = 10000
    avg_grad_every_n: int = 5
    snapshot_every_n: int = 10000
    # the offline CLI's final snapshot is epoch n_epochs-1 = 239 (training
    # counts 0..n_epochs-1), matching the reference's final offline artifact
    # name resnet18_11_epoch-239.pth (mimic.py:22); the nominal "240" in the
    # reference's OnlineSettings was dead (its load_model ignored the epoch,
    # SURVEY.md §2 defects)
    offline_epoch: int = 239
    variant_online: Optional[int] = None


def _timestamp() -> str:
    return datetime.datetime.now().replace(microsecond=0).isoformat()


def write_settings(save_dir, name: str, settings: Settings,
                   variant_offline: Optional[int] = None,
                   variant_online: Optional[int] = None) -> str:
    """YAML dump named ``{name}[_voff[_von]]_settings_{ts}.yml``
    (reference io_helper.py:50-59)."""
    import yaml
    if variant_offline is not None:
        name += '_' + str(variant_offline)
        if variant_online is not None:
            name += '_' + str(variant_online)
    path = Path(save_dir)
    path.mkdir(parents=True, exist_ok=True)
    file_path = path / f'{name}_settings_{_timestamp()}.yml'
    with open(file_path, 'w') as f:
        yaml.dump(dataclasses.asdict(settings), f, default_flow_style=False)
    return str(file_path)
