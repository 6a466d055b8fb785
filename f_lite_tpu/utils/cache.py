"""Bounded LRU for compiled-executable caches.

A long-lived serving process fed many distinct (steps, guidance, sampler,
resolution) combinations would otherwise accumulate jitted executables
without eviction — each holds its compiled HLO plus host-side trace
state. Shape/settings buckets bound the working set in practice, so the
cap is a backstop, not a tuning knob; eviction drops our reference to the
wrapped callable and lets jax's own weakref-keyed caches release the
executable.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable


class LRUCache:
    """Minimal ordered-dict LRU with a get/put surface.

    Not thread-safe by itself; the serving batcher serializes dispatches
    and the trainer is single-threaded, which covers both call sites.
    """

    def __init__(self, maxsize: int = 32):
        if maxsize < 1:
            raise ValueError(f"maxsize must be >= 1, got {maxsize}")
        self.maxsize = int(maxsize)
        self._data: OrderedDict[Hashable, Any] = OrderedDict()
        self.evictions = 0  # surfaced via serve /metrics

    def get(self, key: Hashable, default=None):
        try:
            self._data.move_to_end(key)
            return self._data[key]
        except KeyError:
            return default

    def put(self, key: Hashable, value: Any) -> None:
        self._data[key] = value
        self._data.move_to_end(key)
        while len(self._data) > self.maxsize:
            self._data.popitem(last=False)
            self.evictions += 1

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._data
