"""Site paths, replacing the reference's user-created ``mypath.py``
(``src/config/path_abstract.py`` + ``mypath.py.example``).

Resolution order: explicit argument > environment variable > default.
No copy-a-template step; ``FOSVOS_DB_ROOT`` etc. configure a site.
"""
from __future__ import annotations

import os


class Paths:
    """Static-method surface mirroring PathAbstract (path_abstract.py:1-32)."""

    @staticmethod
    def db_root_dir() -> str:
        return os.environ.get('FOSVOS_DB_ROOT', './DAVIS-2016')

    @staticmethod
    def save_root_dir() -> str:
        return os.environ.get('FOSVOS_SAVE_ROOT', '.')

    @staticmethod
    def exp_dir() -> str:
        return os.environ.get('FOSVOS_EXP_DIR', './exp')

    @staticmethod
    def models_dir() -> str:
        return os.environ.get('FOSVOS_MODELS_DIR', './models')
