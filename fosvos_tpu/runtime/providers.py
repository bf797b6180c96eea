"""Network providers: model registry + optimizer preset + checkpoint I/O.

Rebuild of ``src/util/network_provider.py``: a provider encapsulates
"which model, which pretrained source, which optimizer variant, where
checkpoints live and what they're called". The checkpoint format is the
framework's (arch JSON + npz, see ``runtime.checkpoint``); reference ``.pth``
state_dicts are transparently migrated via ``models.import_torch``.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp

from fosvos_tpu.config.settings import Settings
from fosvos_tpu.models import (OSVOSResNet, OSVOSVGG, ResNetArch,
                               resnet_arch)
from fosvos_tpu.models import import_torch
from fosvos_tpu.runtime import checkpoint
from fosvos_tpu.runtime.logging import get_logger
from fosvos_tpu.train import optimizers

log = get_logger(__file__)


class NetworkProvider:
    """Base provider (reference network_provider.py:18-75)."""

    network_kind = 'resnet'

    def __init__(self, name: str, save_dir, settings: Settings,
                 variant_offline: Optional[int] = None,
                 variant_online: Optional[int] = None,
                 version: int = 18,
                 pretrained_path: Optional[str] = None,
                 caffe_path: Optional[str] = None):
        self.name = name
        self.save_dir = str(save_dir)
        self.settings = settings
        self.variant_offline = variant_offline
        self.variant_online = variant_online
        self.version = version
        self.pretrained_path = pretrained_path
        self.caffe_path = caffe_path
        self.model = None
        self.variables = None

    # -- construction -------------------------------------------------------

    def init_network(self, arch: Optional[ResNetArch] = None):
        if self.network_kind == 'vgg':
            self.model = OSVOSVGG()
        else:
            self.model = OSVOSResNet(arch=arch or resnet_arch(self.version))
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
            train=False)
        self.variables = dict(variables)
        return self.model

    def _stem(self, epoch: int, sequence: Optional[str] = None) -> str:
        return checkpoint.checkpoint_stem(
            self.name, epoch, self.variant_offline, self.variant_online,
            sequence)

    # -- checkpoint I/O ------------------------------------------------------

    def save_model(self, epoch: int, sequence: Optional[str] = None) -> str:
        stem = self._stem(epoch, sequence)
        arch_json = None
        if isinstance(self.model, OSVOSResNet):
            arch_json = self.model.arch.to_json()
        path = checkpoint.save(self.save_dir, stem, self.variables, arch_json)
        log.info('Saving weights to: %s', path)
        return path

    def load_model(self, epoch: int, sequence: Optional[str] = None,
                   path: Optional[str] = None) -> None:
        """Load our npz format, or migrate a reference .pth transparently."""
        if path and str(path).endswith('.pth'):
            log.info('Loading (migrating) torch checkpoint: %s', path)
            sd = import_torch.load_state_dict(str(path))
            if self.network_kind == 'vgg':
                self.init_network()
                self.variables = {
                    'params': import_torch.osvos_vgg_checkpoint_to_params(sd)}
            else:
                arch = resnet_arch(self.version)
                self.init_network(arch)
                self.variables = \
                    import_torch.osvos_resnet_checkpoint_to_variables(sd, arch)
            self.variables = jax.tree.map(jnp.asarray, self.variables)
            return
        if path:
            # explicit checkpoint path/stem overrides the naming convention
            # (e.g. cli/prune --model-path models/resnet18_11_epoch-240)
            from pathlib import Path as _P
            p = _P(str(path))
            stem = p.name[:-4] if p.name.endswith('.npz') else p.name
            load_dir = str(p.parent) if str(p.parent) else '.'
        else:
            stem = self._stem(epoch, sequence)
            load_dir = self.save_dir
        log.info('Loading weights from: %s/%s', load_dir, stem)
        variables, arch_json = checkpoint.load(load_dir, stem)
        arch = (ResNetArch.from_json(arch_json)
                if arch_json and self.network_kind != 'vgg' else None)
        self.init_network(arch)
        self.variables = jax.tree.map(jnp.asarray, variables)

    # -- pretrained trunks ---------------------------------------------------

    def load_pretrained_trunk(self) -> None:
        """Torchvision-zoo trunk import (reference pretrained=1/True).

        Needs a ``.pth`` state_dict of the zoo model on disk
        (``pretrained_path``); torchvision itself is not a dependency.
        """
        if not self.pretrained_path:
            log.warning('No pretrained trunk path configured; '
                        'using fresh init (N(0, 0.001)).')
            return
        sd = import_torch.load_state_dict(self.pretrained_path)
        if self.network_kind == 'vgg':
            params = import_torch.vgg16_trunk_from_torchvision(
                sd, self.variables['params'])
            self.variables = {**self.variables, 'params': params}
        else:
            params, stats = import_torch.resnet_trunk_from_torchvision(
                sd, self.model.arch, self.variables['params'],
                self.variables['batch_stats'])
            self.variables = {'params': params, 'batch_stats': stats}
        self.variables = jax.tree.map(jnp.asarray, self.variables)

    def load_caffe_trunk(self) -> None:
        """Caffe HED-VGG trunk import (reference ``pretrained=2``,
        ``osvos_vgg.py:139-153`` / the ``is_loading_vgg_caffe`` setting,
        ``settings.py:22-24``). Needs the ``vgg_hed_caffe.mat`` file."""
        if self.network_kind != 'vgg':
            raise ValueError('caffe HED trunk applies to the VGG model only')
        params = import_torch.vgg16_trunk_from_caffe(
            self.caffe_path, self.variables['params'])
        self.variables = {**self.variables,
                          'params': jax.tree.map(jnp.asarray, params)}
        log.info('Loaded caffe HED trunk from %s', self.caffe_path)

    # -- reference load_network_* contract -----------------------------------

    def load_network_train(self) -> None:
        raise NotImplementedError

    def load_network_test(self, sequence: Optional[str] = None) -> None:
        # final snapshot lands at epoch n_epochs-1 (training loops count
        # 0..n_epochs-1). The reference nominally loads epoch n_epochs
        # (network_provider.py:94-96) but its load_model ignores the epoch
        # entirely via the save_dir-tuple quirk (SURVEY.md §2 defects);
        # we use the real final epoch.
        self.init_network()
        self.load_model(self.settings.n_epochs - 1, sequence=sequence)

    def get_preset(self) -> optimizers.Preset:
        raise NotImplementedError


class VGGOfflineProvider(NetworkProvider):
    network_kind = 'vgg'

    def load_network_train(self) -> None:
        self.init_network()
        if self.settings.start_epoch == 0:
            # reference osvos_vgg.py:118-153: pretrained=2 (caffe HED .mat,
            # selected by is_loading_vgg_caffe) vs pretrained=1 (torchvision)
            if self.caffe_path and getattr(self.settings,
                                           'is_loading_vgg_caffe', True):
                self.load_caffe_trunk()
            else:
                self.load_pretrained_trunk()
        else:
            self.load_model(self.settings.start_epoch)

    def get_preset(self) -> optimizers.Preset:
        return optimizers.vgg_offline_preset()


class VGGOnlineProvider(NetworkProvider):
    network_kind = 'vgg'

    def load_network_train(self) -> None:
        self.init_network()
        self.load_model(self.settings.offline_epoch)

    def get_preset(self) -> optimizers.Preset:
        return optimizers.vgg_online_preset()


class ResNetOfflineProvider(NetworkProvider):
    def load_network_train(self) -> None:
        self.init_network()
        if self.settings.start_epoch == 0:
            self.load_pretrained_trunk()
        else:
            self.load_model(self.settings.start_epoch)

    def get_preset(self) -> optimizers.Preset:
        return optimizers.offline_variant(self.variant_offline)


class ResNetOnlineProvider(NetworkProvider):
    def load_network_train(self) -> None:
        self.init_network()
        self.load_model(self.settings.offline_epoch)

    def get_preset(self) -> optimizers.Preset:
        return optimizers.online_variant(self.variant_online)


provider_mapping: Dict[Tuple[str, str], Type[NetworkProvider]] = {
    ('offline', 'vgg16'): VGGOfflineProvider,
    ('online', 'vgg16'): VGGOnlineProvider,
    ('offline', 'resnet18'): ResNetOfflineProvider,
    ('online', 'resnet18'): ResNetOnlineProvider,
    ('offline', 'resnet34'): ResNetOfflineProvider,
    ('online', 'resnet34'): ResNetOnlineProvider,
    # beyond the reference CLI (args_helper.py:8-9): the reference model
    # layer supports the full family (osvos_resnet.py:74-88), exposed here
    ('offline', 'resnet50'): ResNetOfflineProvider,
    ('online', 'resnet50'): ResNetOnlineProvider,
    ('offline', 'resnet101'): ResNetOfflineProvider,
    ('online', 'resnet101'): ResNetOnlineProvider,
    ('offline', 'resnet152'): ResNetOfflineProvider,
    ('online', 'resnet152'): ResNetOnlineProvider,
}
