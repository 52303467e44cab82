"""Result-level query cache (reference: server/src/main/java/org/
apache/druid/client/CachingClusteredClient.java + CacheConfig —
Druid's broker caches per-segment results keyed on segment version;
re-publishing a segment changes the version and invalidates).

Here the facade caches the FINAL serialized result keyed on
(endpoint, canonical request JSON, registry epoch). The registry bumps
``epoch`` on every register/publish, so any data change misses the
whole cache — the coarse-grained but strictly-correct analogue of
segment-version invalidation (a single-driver engine has no partial
per-segment reuse to exploit).

Bounded LRU on entries AND bytes; driver-memory only, like the
broker's local cache (the reference's memcached tier is a deploy
concern, not an engine one).
"""

from __future__ import annotations

import json
import threading
from collections import OrderedDict


class ResultCache:
    def __init__(self, max_entries: int = 256,
                 max_bytes: int = 64 * 1024 * 1024):
        self.max_entries = max_entries
        self.max_bytes = max_bytes
        self._lock = threading.Lock()
        self._data: OrderedDict[tuple, str] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(endpoint: str, request: dict, epoch: int) -> tuple:
        # canonical form: sorted keys, no whitespace — logically equal
        # requests share an entry regardless of field order
        return (endpoint, json.dumps(request, sort_keys=True,
                                     separators=(",", ":")), epoch)

    def get(self, key: tuple) -> str | None:
        with self._lock:
            payload = self._data.get(key)
            if payload is None:
                self.misses += 1
                return None
            self._data.move_to_end(key)  # LRU touch
            self.hits += 1
            return payload

    def put(self, key: tuple, payload: str) -> None:
        size = len(payload)
        if size > self.max_bytes:
            return  # a single oversized result would evict everything
        with self._lock:
            old = self._data.pop(key, None)
            if old is not None:
                self._bytes -= len(old)
            self._data[key] = payload
            self._bytes += size
            while (len(self._data) > self.max_entries
                   or self._bytes > self.max_bytes):
                _, evicted = self._data.popitem(last=False)
                self._bytes -= len(evicted)

    def clear(self) -> None:
        with self._lock:
            self._data.clear()
            self._bytes = 0
