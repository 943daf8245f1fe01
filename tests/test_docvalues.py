"""Numeric DocValues generation updates (updateNumericDocValue analog):
metadata-only updates never touch postings, commit atomically through
the manifest, and feed sort queries through the live generation."""
import json
import os
import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dv_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    rows = [
        Row(repo="r", path=f"{i:02d}", commit="0", lang="en",
            content=("hot " if i % 3 == 0 else "cold ") + f"item{i} filler")
        for i in range(9)
    ]
    docs = spark.createDataFrame(rows)
    out = str(tmp_path_factory.mktemp("dv") / "idx")
    build_index(spark, docs, out, partitions=2)
    s = IndexSearcher(spark, out)
    yield s, out
    shutil.rmtree(out, ignore_errors=True)


def _postings_snapshot(s):
    return sorted(
        (r["term"], r["docID"], r["tf"]) for r in s.postings_tf().collect()
    )


def test_set_update_read_roundtrip(spark, dv_index):
    from lucene_spark.index.docvalues import (
        live_gen,
        read_docvalues,
        set_docvalues,
        update_numeric_docvalue,
    )

    s, out = dv_index
    before = _postings_snapshot(s)

    base = spark.createDataFrame(
        [Row(docID=i, value=100 + i) for i in range(9)]
    )
    assert set_docvalues(spark, out, "price", base) == 0
    got = {r["docID"]: r["value"] for r in read_docvalues(spark, out, "price").collect()}
    assert got == {i: 100 + i for i in range(9)}

    # update every doc containing "hot" (docIDs 0,3,6) to 999
    gen = update_numeric_docvalue(spark, s, "price", "hot", 999)
    assert gen == 1 and live_gen(out, "price") == 1
    got = {r["docID"]: r["value"] for r in read_docvalues(spark, out, "price").collect()}
    assert got == {i: (999 if i % 3 == 0 else 100 + i) for i in range(9)}

    # postings byte-identical: a docvalues update re-indexes NOTHING
    assert _postings_snapshot(s) == before
    # old generation dir cleaned, stale-free manifest pointer
    assert not os.path.exists(os.path.join(out, "docvalues", "price", "gen=0"))


def test_partial_overlay_keeps_absent_docs(spark, dv_index):
    from lucene_spark.index.docvalues import read_docvalues, set_docvalues

    s, out = dv_index
    set_docvalues(
        spark, out, "stars",
        spark.createDataFrame([Row(docID=i, value=i) for i in range(9)]),
    )
    set_docvalues(
        spark, out, "stars",
        spark.createDataFrame([Row(docID=4, value=44)]),
    )
    got = {r["docID"]: r["value"] for r in read_docvalues(spark, out, "stars").collect()}
    assert got == {i: (44 if i == 4 else i) for i in range(9)}


def test_crash_window_leaves_old_gen_live(spark, dv_index):
    """A fully-written next-gen dir WITHOUT the manifest commit must be
    invisible (manifest is the live set), and a later real update must
    clobber it."""
    from lucene_spark.index.docvalues import (
        live_gen,
        read_docvalues,
        set_docvalues,
    )

    s, out = dv_index
    set_docvalues(
        spark, out, "rank",
        spark.createDataFrame([Row(docID=i, value=1) for i in range(9)]),
    )
    g = live_gen(out, "rank")
    # simulate a crash: write gen g+1 but never commit the manifest
    stale = os.path.join(out, "docvalues", "rank", f"gen={g + 1}")
    spark.createDataFrame([Row(docID=0, value=777)]).write.mode(
        "overwrite"
    ).parquet(stale)
    got = {r["docID"]: r["value"] for r in read_docvalues(spark, out, "rank").collect()}
    assert got == {i: 1 for i in range(9)}  # stale dir ignored
    # recovery: the next committed update overwrites the stale dir
    set_docvalues(
        spark, out, "rank",
        spark.createDataFrame([Row(docID=2, value=5)]),
    )
    assert live_gen(out, "rank") == g + 1
    got = {r["docID"]: r["value"] for r in read_docvalues(spark, out, "rank").collect()}
    assert got == {i: (5 if i == 2 else 1) for i in range(9)}


def test_sort_by_docvalue_sees_live_gen(spark, dv_index):
    from lucene_spark.index.docvalues import (
        set_docvalues,
        update_numeric_docvalue,
    )

    s, out = dv_index
    set_docvalues(
        spark, out, "boost",
        spark.createDataFrame([Row(docID=i, value=10 - i) for i in range(9)]),
    )
    # "cold" docs: 1,2,4,5,7,8 with values 9,8,6,5,3,2
    top = s.sort_by_docvalue("cold", "boost", k=3).collect()
    assert [(r["docID"], r["value"]) for r in top] == [(1, 9), (2, 8), (4, 6)]
    # update flips the order without reopening the searcher
    update_numeric_docvalue(spark, s, "boost", "item8", 1000)
    top = s.sort_by_docvalue("cold", "boost", k=3).collect()
    assert [(r["docID"], r["value"]) for r in top] == [(8, 1000), (1, 9), (2, 8)]


def test_search_after_cursor_pages(spark, dv_index):
    """searchAfter over a field sort (IndexSearcher.searchAfter +
    FieldDoc): page 2 via the (value, docID) cursor equals rows k..2k of
    the full sort, both directions."""
    from lucene_spark.index.docvalues import set_docvalues

    s, out = dv_index
    # values with TIES so the docID tie-break leg of the cursor matters
    vals = [(i, 50 + (i % 3) * 10) for i in range(9)]
    set_docvalues(
        spark, out, "pagefield",
        spark.createDataFrame(vals, "docID long, value long"),
    )
    for desc in (True, False):
        full = [
            (int(r["docID"]), int(r["value"]))
            for r in s.sort_by_docvalue(
                "filler", "pagefield", k=9, descending=desc
            ).collect()
        ]
        cur_doc, cur_val = full[2]
        page2 = [
            (int(r["docID"]), int(r["value"]))
            for r in s.sort_by_docvalue(
                "filler", "pagefield", k=3, descending=desc,
                after=(cur_val, cur_doc),
            ).collect()
        ]
        assert page2 == full[3:6], f"desc={desc}"


def test_sorted_gen_pushes_cursor_predicate(spark, dv_index):
    """The value-sorted generation (set_docvalues default) lets the
    cursor predicate reach the parquet scan (PushedFilters), the
    IndexSortSortedNumericDocValuesRangeQuery.java:60 pruning shape."""
    s, out = dv_index
    df = s.sort_by_docvalue(
        "filler", "pagefield", k=3, descending=True, after=(60, 0)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(value,60)" in plan, plan[:2000]
