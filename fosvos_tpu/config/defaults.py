"""Canonical hyperparameter defaults.

Port of the reference's vestigial ``src/config/params_abstract.py`` (never
imported there, but it documents the canonical OSVOS values; kept here as the
single source for those numbers).
"""


class ParamsDefaults:
    @staticmethod
    def lr() -> float:
        return 1e-8

    @staticmethod
    def wd() -> float:
        return 0.0002

    @staticmethod
    def n_ave_grad() -> int:
        return 5

    @staticmethod
    def n_epochs() -> int:
        return 2000
