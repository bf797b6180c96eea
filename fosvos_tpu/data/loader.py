"""Prefetching sample loader over the native decode pipeline.

Replaces the reference's torch DataLoader worker processes
(``io_helper.py:62-77``, num_workers=1/2) with C++ decode threads
(``fosvos_tpu/native/fastloader.cpp``). Falls back to synchronous cv2 decode
when the native library is unavailable; both paths produce bit-identical
float32 (image - mean, gt/max) samples.
"""
from __future__ import annotations

import ctypes
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from fosvos_tpu.data.davis import DAVIS2016
from fosvos_tpu.runtime.logging import get_logger

log = get_logger(__file__)


class NativePrefetcher:
    """Iterate (index, image, gt) over dataset samples with C++ worker
    threads. Delivery order is whatever finishes first — callers that shuffle
    per epoch (training) don't care; order-sensitive callers sort by index."""

    def __init__(self, dataset: DAVIS2016,
                 order: Optional[Sequence[int]] = None,
                 n_threads: int = 4, capacity: int = 16,
                 raw: bool = False):
        from fosvos_tpu import native
        self._lib = native.load_library()
        if self._lib is None:
            raise RuntimeError(
                f'native loader unavailable: {native.build_error()}')
        self.dataset = dataset
        self.order = list(order if order is not None else
                          range(len(dataset)))
        self.h, self.w = dataset.get_img_size()
        self.n_threads = n_threads
        self.capacity = capacity
        self.raw = raw
        self._handle = None

    def __enter__(self):
        img_paths = (ctypes.c_char_p * len(self.order))()
        lab_paths = (ctypes.c_char_p * len(self.order))()
        for k, i in enumerate(self.order):
            s = self.dataset.samples[i]
            img_paths[k] = s.image_path.encode()
            lab_paths[k] = (s.label_path.encode() if s.label_path else None)
        m = self.dataset.meanval
        self._handle = self._lib.fl_create_mode(
            img_paths, lab_paths, len(self.order), self.n_threads,
            self.capacity, m[0], m[1], m[2], 1 if self.raw else 0)
        return self

    def __exit__(self, *exc):
        if self._handle:
            self._lib.fl_destroy(self._handle)
            self._handle = None

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
        if self.raw:
            img = np.empty((self.h, self.w, 3), np.uint8)
            gt = np.empty((self.h, self.w), np.uint8)
            nxt, ptr = self._lib.fl_next_raw, ctypes.c_uint8
        else:
            img = np.empty((self.h, self.w, 3), np.float32)
            gt = np.empty((self.h, self.w), np.float32)
            nxt, ptr = self._lib.fl_next, ctypes.c_float
        n_delivered = 0
        while n_delivered < len(self.order):
            rc = nxt(self._handle,
                     img.ctypes.data_as(ctypes.POINTER(ptr)),
                     gt.ctypes.data_as(ctypes.POINTER(ptr)),
                     self.h, self.w)
            if rc == -1:
                break
            n_delivered += 1
            if rc == -2:
                log.warning('native decode failed for one sample; skipping')
                continue
            yield self.order[rc], img.copy(), gt.copy()


def iterate_samples(dataset: DAVIS2016,
                    order: Optional[Sequence[int]] = None,
                    n_threads: int = 4,
                    use_native: bool = True,
                    raw: bool = False
                    ) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
    """Best-effort native prefetch with transparent cv2 fallback.

    ``raw=True`` yields uint8 (BGR frame, mask) pairs — the device-side
    normalization transfer format."""
    order = list(order if order is not None else range(len(dataset)))
    if use_native:
        try:
            with NativePrefetcher(dataset, order, n_threads, raw=raw) as pf:
                yield from pf
            return
        except (RuntimeError, OSError) as e:
            log.warning('falling back to python decode: %s', e)
    for i in order:
        img, gt = (dataset.make_raw_pair(i) if raw
                   else dataset.make_img_gt_pair(i))
        yield i, img, gt
