"""Personal 'Me' dataset — reference ``src/dataloaders/custom_images.py``.

Same decode/normalize pipeline as DAVIS but indexed by a flat ``train.txt``
(lines ``/Images/0.jpg /Annotations/0.png``), a different channel mean
(``custom_images.py:27``), and a single pseudo-sequence named 'Me'.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple


from fosvos_tpu.data.davis import DAVIS2016, Sample

CUSTOM_MEAN_BGR = (126.71216173, 119.22616378, 118.00651622)


class CustomImages(DAVIS2016):
    def __init__(self, mode: str = 'train',
                 db_root_dir: str = '',
                 input_res: Optional[Tuple[int, int]] = None,
                 meanval: Sequence[float] = CUSTOM_MEAN_BGR):
        # intentionally skip DAVIS2016.__init__ (different index contract)
        self.mode = mode.lower()
        self.db_root_dir = str(db_root_dir)
        self.input_res = input_res
        self.meanval = tuple(meanval)
        self.seq_name = None

        if self.mode not in ('train', 'val'):
            raise ValueError(
                "Mode {} does not exist. Must be one of ['train', 'val']"
                .format(mode))

        root = Path(self.db_root_dir)
        samples = []
        with open(root / 'train.txt') as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                img_rel, lab_rel = parts[0], parts[1]
                pieces = img_rel.strip('/').split('/')
                samples.append(Sample(
                    seq_name='Me',
                    fname=pieces[-1].split('.')[0],
                    image_path=str(root.joinpath(*pieces)),
                    label_path=str(root.joinpath(*lab_rel.strip('/')
                                                 .split('/')))))
        self.samples = samples
