"""TTL result cache for the query facade — the reference's
FilterCacheService re-expressed for a Spark driver process.

Reference parity (C1/C4/C5 of SURVEY §2.7):
- C1 TTL result cache: ``service/FilterCacheService.java:23-46,97-141``
  — 5 min TTL for filtered results, 30 min for the unfiltered defaults.
- C4 invalidation on data change: ``:259-275`` (called after every
  load, ``service/LogFileParser.java:714-719``) — ``invalidate_all``.
- C5 scheduled expiry sweep: ``:234-256`` (@Scheduled(60 s)) —
  ``sweep()``; the SCHEDULING itself stays host-owned (cron, a driver
  thread, an HTTP middleware timer), exactly like the reference's
  Spring scheduler owns the cadence, but the eviction semantics live
  here and are tested.

What is cached: MATERIALIZED row lists (what an HTTP layer would
serialize), never DataFrames — a cached lazy plan would re-execute on
every read and pin no work, while caching collected rows matches the
reference (it caches response payloads keyed by the filter string).

Scale posture: driver-memory only, bounded by ``max_entries`` with
oldest-inserted eviction; entries are small API pages/aggregates (the
facade caps rows at the API edge), so the cache is O(entries x page
size), never O(data). A multi-driver deployment would back this with
an external store; the interface is deliberately that shape
(get/put/invalidate/sweep).
"""

from __future__ import annotations

import threading
import time
import weakref
from collections import OrderedDict

DEFAULT_TTL_SEC = 30 * 60  # unfiltered defaults (FilterCacheService.java:46)
FILTERED_TTL_SEC = 5 * 60  # filtered results (FilterCacheService.java:45)

# Every live cache, so the LOAD path can evict without holding an API
# handle (C4 end-to-end: the reference's loader calls the eviction
# itself, LogFileParser.java:714-719 — here plans/pipeline calls
# ``invalidate_registered`` after a chunk commits / summaries
# republish). Weak refs: registration must not keep a dropped facade's
# cache alive.
_LIVE: "weakref.WeakSet[TTLResultCache]" = weakref.WeakSet()


def invalidate_registered() -> int:
    """C4 from the load side: evict every entry of every live cache.
    Returns total entries dropped."""
    return sum(c.invalidate_all() for c in list(_LIVE))


class TTLResultCache:
    """Thread-safe TTL cache: (key -> materialized value).

    ``clock`` is injectable (monotonic seconds) so expiry is testable
    without sleeping. All operations are O(1) except ``sweep`` (O(n),
    the point of a sweep).
    """

    def __init__(
        self,
        default_ttl: float = DEFAULT_TTL_SEC,
        filtered_ttl: float = FILTERED_TTL_SEC,
        max_entries: int = 1024,
        clock=time.monotonic,
    ):
        if max_entries <= 0:
            raise ValueError("max_entries must be positive")
        self.default_ttl = float(default_ttl)
        self.filtered_ttl = float(filtered_ttl)
        self.max_entries = int(max_entries)
        self._clock = clock
        self._lock = threading.Lock()
        # key -> (expires_at, value); OrderedDict gives O(1)
        # oldest-inserted eviction when the entry budget is hit
        self._data: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0
        _LIVE.add(self)

    def get(self, key):
        """The cached value, or None if absent/expired (an expired
        entry is evicted on touch, like the reference's lookup path)."""
        now = self._clock()
        with self._lock:
            item = self._data.get(key)
            if item is None:
                self.misses += 1
                return None
            expires_at, value = item
            if now >= expires_at:
                del self._data[key]
                self.misses += 1
                return None
            self.hits += 1
            return value

    def put(self, key, value, filtered: bool = False) -> None:
        """Insert with the reference's two-tier TTL: short for filtered
        results (they are many and go stale with each load), long for
        the handful of unfiltered defaults."""
        ttl = self.filtered_ttl if filtered else self.default_ttl
        now = self._clock()
        with self._lock:
            if key in self._data:
                del self._data[key]  # re-insert at the fresh end
            elif len(self._data) >= self.max_entries:
                self._data.popitem(last=False)  # oldest inserted
            self._data[key] = (now + ttl, value)

    def invalidate_all(self) -> int:
        """C4: evict everything after a data change (a new chunk
        committed / summaries republished). Returns entries dropped."""
        with self._lock:
            n = len(self._data)
            self._data.clear()
            return n

    def sweep(self) -> int:
        """C5: evict every expired entry NOW; returns entries dropped.
        The host calls this on its own cadence (the reference uses a
        60 s scheduler) — without a sweep, an entry written once and
        never read again would hold memory until eviction pressure."""
        now = self._clock()
        with self._lock:
            dead = [k for k, (exp, _) in self._data.items() if now >= exp]
            for k in dead:
                del self._data[k]
            return len(dead)

    def __len__(self) -> int:
        with self._lock:
            return len(self._data)
