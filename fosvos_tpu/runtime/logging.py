"""Per-module colored loggers, reproducing ``src/util/logger.py``.

colorlog is not available in this environment, so the ColoredFormatter
(format ``%(asctime)s %(levelname)-8s [%(name)s] %(message)s`` with
level-colored level names) is implemented directly with ANSI codes.
"""
from __future__ import annotations

import logging
from pathlib import Path

_COLORS = {
    'DEBUG': '\033[36m',     # cyan
    'INFO': '\033[32m',      # green
    'WARNING': '\033[33m',   # yellow
    'ERROR': '\033[31m',     # red
    'CRITICAL': '\033[1;31m',
}
_RESET = '\033[0m'


class _ColoredFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        color = _COLORS.get(record.levelname, '')
        record.colored_levelname = f'{color}{record.levelname:<8}{_RESET}'
        return super().format(record)


_formatter = _ColoredFormatter(
    '%(asctime)s %(colored_levelname)s [%(name)s] %(message)s')


def get_logger(module_name: str, log_level: int = logging.INFO
               ) -> logging.Logger:
    """Logger named after the module file, reference ``logger.py:9-23``."""
    name = Path(module_name).stem
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(_formatter)
        logger.addHandler(handler)
    logger.setLevel(log_level)
    return logger
