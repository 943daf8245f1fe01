"""Query cache (LRUQueryCache analog): cached filter doc-sets are
reused, evicted LRU, and invalidated by the reader-change epoch
(tombstones / generations)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import corpus_spark_df
from lucene_spark.index.builder import build_index
from lucene_spark.search.cache import QueryCache
from lucene_spark.search.engine import IndexSearcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("qc") / "idx")
    build_index(spark, corpus_spark_df(spark, 200, partitions=4), out, partitions=4)
    return out


def test_filter_docs_cached_and_correct(spark, idx):
    cache = QueryCache(max_entries=8)
    s = IndexSearcher(spark, idx, query_cache=cache)
    plain = IndexSearcher(spark, idx)

    a = {r["docID"] for r in s.filter_docs("license").collect()}
    assert cache.misses == 1 and cache.hits == 0
    b = {r["docID"] for r in s.filter_docs("license").collect()}
    assert cache.hits == 1
    assert a == b == {
        r["docID"] for r in plain.filter_docs("license").collect()
    }
    # the second call reads the in-memory cache, not the index
    plan = s.filter_docs("license")._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_must_not_path_equal_with_cache(spark, idx):
    cache = QueryCache(max_entries=8)
    s = IndexSearcher(spark, idx, query_cache=cache)
    plain = IndexSearcher(spark, idx)
    got = [
        (r["docID"], r["score"])
        for r in s.search_boolean(
            should=["license", "apache"], must_not=["var0"], k=10
        ).collect()
    ]
    exp = [
        (r["docID"], r["score"])
        for r in plain.search_boolean(
            should=["license", "apache"], must_not=["var0"], k=10
        ).collect()
    ]
    assert got == exp and cache.misses >= 1
    # repeat: exclusion set now served from cache
    h0 = cache.hits
    got2 = [
        (r["docID"], r["score"])
        for r in s.search_boolean(
            should=["license", "apache"], must_not=["var0"], k=10
        ).collect()
    ]
    assert got2 == exp and cache.hits > h0


def test_lru_eviction_unpersists(spark, idx):
    cache = QueryCache(max_entries=2)
    s = IndexSearcher(spark, idx, query_cache=cache)
    d1 = s.filter_docs("license")
    d2 = s.filter_docs("apache")
    d3 = s.filter_docs("software")  # evicts the 'license' entry
    assert len(cache) == 2
    assert d1.storageLevel.useMemory is False  # unpersisted on eviction
    assert d3.storageLevel.useMemory is True
    assert {r["docID"] for r in d2.collect()}  # survivors still usable


def test_delete_epoch_invalidates(spark, tmp_path):
    from lucene_spark.index.deletes import delete_by_query

    out = str(tmp_path / "qc_del_idx")
    build_index(spark, corpus_spark_df(spark, 150, partitions=2), out, partitions=2)
    cache = QueryCache(max_entries=8)
    s = IndexSearcher(spark, out, query_cache=cache)
    before = {r["docID"] for r in s.filter_docs("license").collect()}
    assert before
    n = delete_by_query(spark, s, "var0")
    assert n > 0
    s.reload_deletes()
    after = {r["docID"] for r in s.filter_docs("license").collect()}
    # new epoch => fresh entry; stale pre-delete set is never served
    victims = {r["docID"] for r in spark.createDataFrame(
        [(int(x),) for x in s._deleted], "docID long").collect()}
    assert not (after & victims)
    assert len(cache) >= 2  # old-epoch and new-epoch entries are distinct keys
