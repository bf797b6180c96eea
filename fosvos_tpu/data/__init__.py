from fosvos_tpu.data import davis, helpers, synthetic, transforms
from fosvos_tpu.data.custom_images import CustomImages
from fosvos_tpu.data.davis import DAVIS2016

__all__ = ['davis', 'helpers', 'synthetic', 'transforms', 'CustomImages',
           'DAVIS2016']
