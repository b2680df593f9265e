"""Asynchronous dataset prefetching.

The reference loads + decodes every frame synchronously inside the
tracking loop (Camera.init_from_dataset → dataset.__getitem__,
slam_frontend.py:578). Here a small thread pool decodes frames AHEAD of
the SLAM loop — with the native C++ decoder (native/frame_decode.cpp)
releasing the GIL, decode overlaps device compute and the loop's `data`
phase drops to a queue pop.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any


class PrefetchDataset:
    """Wrap a dataset with lookahead prefetching; sequential access hits
    decoded frames. Attribute access passes through to the inner dataset
    (fx/fy/poses/... stay visible to the SLAM system and eval)."""

    def __init__(self, dataset, lookahead: int = 3, workers: int = 2):
        self._dataset = dataset
        self._lookahead = lookahead
        self._pool = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="prefetch"
        )
        self._lock = threading.Lock()
        self._pending: "OrderedDict[int, Future]" = OrderedDict()

    def __len__(self):
        return len(self._dataset)

    def __getattr__(self, name: str) -> Any:
        return getattr(self._dataset, name)

    def _schedule(self, idx: int):
        if 0 <= idx < len(self._dataset) and idx not in self._pending:
            self._pending[idx] = self._pool.submit(self._dataset.__getitem__, idx)
            # Bound memory: drop oldest stale entries nobody consumed.
            while len(self._pending) > 2 * self._lookahead + 2:
                old, fut = next(iter(self._pending.items()))
                if old >= idx:
                    break
                self._pending.pop(old)

    def __getitem__(self, idx: int):
        with self._lock:
            fut = self._pending.pop(idx, None)
            for ahead in range(1, self._lookahead + 1):
                self._schedule(idx + ahead)
        if fut is None:
            return self._dataset[idx]
        return fut.result()

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
