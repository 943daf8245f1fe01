"""Query cache: LRU of persisted narrow filter doc-sets.

Lucene analog: LRUQueryCache caches per-segment FILTER bitsets (doc
sets without scores) for reuse across queries, invalidated when the
reader changes
(lucene/core/src/java/org/apache/lucene/search/LRUQueryCache.java:952,
UsageTrackingQueryCachingPolicy). Spark-first translation: the "bitset"
is a persisted NARROW DataFrame of docIDs (persisting narrow aggregates
is fine — the measured persist trap is wide columnar rows), the cache
key embeds the index generation + tombstone epoch so a refresh or a
delete naturally misses, and eviction unpersists.

Usage:
    cache = QueryCache(max_entries=32)
    searcher = IndexSearcher(spark, idx, query_cache=cache)
    searcher.filter_docs("license")      # decode + distinct, cached
    searcher.search_boolean(..., must_not=[...])  # exclusion set cached
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame


class QueryCache:
    def __init__(self, max_entries: int = 32):
        self.max_entries = int(max_entries)
        self._entries: OrderedDict[tuple, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: tuple, compute) -> DataFrame:
        """Return the cached persisted DataFrame for `key`, or persist
        compute()'s result, evicting the least-recently-used entry."""
        ent = self._entries.get(key)
        if ent is not None:
            self.hits += 1
            self._entries.move_to_end(key)
            return ent
        self.misses += 1
        df = compute().persist()
        self._entries[key] = df
        while len(self._entries) > self.max_entries:
            _, old = self._entries.popitem(last=False)
            old.unpersist()
        return df

    def invalidate(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()

    def __len__(self) -> int:
        return len(self._entries)
