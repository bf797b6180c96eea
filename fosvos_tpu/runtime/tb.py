"""TensorBoard writer factory, reproducing ``io_helper.py:31-43``:
optionally delete the existing directory, then write under an
ISO-timestamped subdirectory. Scalar tag names across the framework keep the
reference's names (``data/total_loss_epoch`` etc.)."""
from __future__ import annotations

import datetime
import shutil
from pathlib import Path

from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


def _get_timestamp() -> str:
    return datetime.datetime.now().replace(microsecond=0).isoformat()


def get_summary_writer(path_tensorboard, delete_dir: bool = True):
    from tensorboardX import SummaryWriter
    path_tensorboard = Path(path_tensorboard)
    if delete_dir and path_tensorboard.exists():
        log.warning('Deleting existing tensorboard directory: %s',
                    str(path_tensorboard))
        try:
            shutil.rmtree(str(path_tensorboard))
        except OSError:
            log.warning('Failed to delete the directory')
    path = str(path_tensorboard / _get_timestamp())
    log.info('Logging for tensorboard in directory: %s', path)
    return SummaryWriter(path)


class NullWriter:
    """No-op stand-in when TB logging is disabled."""

    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass
