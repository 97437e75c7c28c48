"""Frame sources: stream fixed-capacity padded point buffers to the device.

The reference consumes sorted lists of ``.pcd`` paths in a synchronous Python loop
(``Optical_flow/main.py:561-569``, ``GMFA/GMFA.py:446-455``).  Here the host side
produces statically-shaped ``(max_points, 3)`` buffers + validity masks so the device
program compiles once, and a double-buffered prefetcher overlaps disk decode with
device compute.
"""

from __future__ import annotations

import os
import queue
import re
import threading
from typing import Iterator, Sequence

import numpy as np

from datmo_using_optical_flow_tpu.io.pcd import read_pcd


def pad_points(points: np.ndarray, capacity: int, dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Pad an (N, 3) array to ``(capacity, 3)`` and return (padded, validity_mask).

    If N > capacity, points are truncated (with a warning) — capacities should be
    sized from :class:`~datmo_using_optical_flow_tpu.config.CapacityConfig`.
    Padding rows are filled with a far-away sentinel so they fall outside every ROI.
    """
    points = np.asarray(points, dtype=dtype)
    n = points.shape[0]
    if n > capacity:
        import warnings

        warnings.warn(f"pad_points: truncating {n} points to capacity {capacity}")
        points = points[:capacity]
        n = capacity
    out = np.full((capacity, 3), 1e9, dtype=dtype)
    out[:n] = points
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    return out, mask


def natsort_key(path: str):
    """Natural-order sort key (the reference uses ``natsorted`` at ``GMFA/GMFA.py:446``)."""
    return [int(tok) if tok.isdigit() else tok for tok in re.split(r"(\d+)", os.path.basename(path))]


class DiskFrameSource:
    """Iterates PCD frames from disk as padded device-ready buffers.

    A background thread decodes and pads the next frames while the device consumes
    the current one (the streaming-runner half of SURVEY.md §1's layer (c)).
    """

    def __init__(self, pcd_files: Sequence[str] | None = None, folder: str | None = None,
                 capacity: int = 65536, prefetch: int = 2, dtype=np.float32):
        if pcd_files is None:
            if folder is None:
                raise ValueError("provide pcd_files or folder")
            pcd_files = [os.path.join(folder, f) for f in os.listdir(folder) if f.endswith(".pcd")]
            pcd_files = sorted(pcd_files, key=natsort_key)
        self.pcd_files = list(pcd_files)
        self.capacity = capacity
        self.prefetch = max(1, prefetch)
        self.dtype = dtype

    def __len__(self) -> int:
        return len(self.pcd_files)

    def _load(self, path: str) -> tuple[np.ndarray, np.ndarray]:
        return pad_points(read_pcd(path, dtype=self.dtype), self.capacity, self.dtype)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker() -> None:
            try:
                for path in self.pcd_files:
                    if stop.is_set():
                        return
                    q.put(self._load(path))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the worker can exit if blocked on put
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
