from fosvos_tpu.config.paths import Paths
from fosvos_tpu.config.settings import (OfflineSettings, OnlineSettings,
                                        Settings, write_settings)

__all__ = ['Paths', 'OfflineSettings', 'OnlineSettings', 'Settings',
           'write_settings']
