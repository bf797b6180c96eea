from fosvos_tpu.models.arch import (BlockWidths, ResNetArch, VGGArch,
                                    arch_from_json, resnet_arch)
from fosvos_tpu.models.resnet import OSVOSResNet, make_resnet
from fosvos_tpu.models.vgg import OSVOSVGG

__all__ = ['BlockWidths', 'ResNetArch', 'VGGArch', 'arch_from_json',
           'resnet_arch', 'OSVOSResNet', 'make_resnet', 'OSVOSVGG']
