"""Pluggable read-through result cache (SURVEY §2.7).

Reference: QueryResultCache trait (ResultCaching.scala:36-59), no-op
default (:67-90), in-memory TestCache (:92-152); two-tier local→remote
interleave with write-back (Query2.scala:532-670, multi-get :719-822);
whole-scan caching (:944, putScanResult/getScanResult).

This is a *client/driver* concern — the distributed analog is
``df.persist()``, which callers use for scan reuse.  The tiered
get/multi-get cache below is API-compatible: local tier consulted
first, then remote, with write-back to faster tiers on hit.
"""

from __future__ import annotations

import time
from typing import Any


class QueryResultCache:
    """ResultCaching.scala:36-59."""

    MISS = object()

    def get_result(self, key: str) -> Any:
        return self.MISS

    def put_result(self, key: str, value: Any, ttl_seconds: int) -> None:
        pass

    def get_scan_result(self, key: str) -> Any:
        return self.MISS

    def put_scan_result(self, key: str, value: Any, ttl_seconds: int) -> None:
        pass

    def instrument_request(self, requested: int, local_hits: int, remote_hits: int, misses: int) -> None:
        """Instrumentation hook (ResultCaching.scala:58)."""


class NoOpCache(QueryResultCache):
    """ResultCaching.scala:67-90."""


class TestCache(QueryResultCache):
    """Dict-backed TTL cache (ResultCaching.scala:92-152)."""

    def __init__(self):
        self._store: dict[str, tuple[float, Any]] = {}
        self.hits = 0
        self.misses = 0

    def _get(self, key: str) -> Any:
        ent = self._store.get(key)
        if ent is None:
            self.misses += 1
            return self.MISS
        expires, value = ent
        if time.monotonic() > expires:
            del self._store[key]
            self.misses += 1
            return self.MISS
        self.hits += 1
        return value

    def get_result(self, key: str) -> Any:
        return self._get(key)

    def put_result(self, key: str, value: Any, ttl_seconds: int) -> None:
        self._store[key] = (time.monotonic() + ttl_seconds, value)

    get_scan_result = get_result
    put_scan_result = put_result


class TieredCache(QueryResultCache):
    """local → remote interleave with write-back (Query2.scala:532-670)."""

    def __init__(self, local: QueryResultCache, remote: QueryResultCache):
        self.local = local
        self.remote = remote

    def get_result(self, key: str) -> Any:
        hit = self.local.get_result(key)
        if hit is not self.MISS:
            self.instrument_request(1, 1, 0, 0)
            return hit
        hit = self.remote.get_result(key)
        if hit is not self.MISS:
            # write back to the faster tier (Query2.scala:598-612)
            self.local.put_result(key, hit, 30)
            self.instrument_request(1, 0, 1, 0)
            return hit
        self.instrument_request(1, 0, 0, 1)
        return self.MISS

    def put_result(self, key: str, value: Any, ttl_seconds: int) -> None:
        self.local.put_result(key, value, ttl_seconds)
        self.remote.put_result(key, value, ttl_seconds)

    def get_scan_result(self, key: str) -> Any:
        return self.local.get_scan_result(key)

    def put_scan_result(self, key: str, value: Any, ttl_seconds: int) -> None:
        self.local.put_scan_result(key, value, ttl_seconds)
