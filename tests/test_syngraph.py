"""Query-time synonym-graph expansion (SynonymGraphFilter analog) and
the soft-deletes reader wrapper."""
import shutil

import pytest
from pyspark.sql import Row


@pytest.fixture(scope="module")
def syn_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    rows = [
        # 0/1: identical shape, one uses the synonym surface — the
        # SynonymQuery union-df property must score them identically
        Row(repo="r", path="00", commit="0", lang="en",
            content="table data data"),
        Row(repo="r", path="01", commit="0", lang="en",
            content="tbl data data"),
        Row(repo="r", path="02", commit="0", lang="en",
            content="scan data data"),
        Row(repo="r", path="03", commit="0", lang="en",
            content="table scan mixed here"),
        Row(repo="r", path="04", commit="0", lang="en",
            content="nothing relevant at all"),
    ]
    docs = spark.createDataFrame(rows)
    out = str(tmp_path_factory.mktemp("syn") / "idx")
    build_index(spark, docs, out, partitions=2)
    s = IndexSearcher(spark, out)
    yield s, out
    shutil.rmtree(out, ignore_errors=True)


SYNS = {"table": ["tbl"], "scan": ["sweep"]}


def test_synonym_surface_scores_identically(syn_index):
    s, _ = syn_index
    res = s.search_with_synonyms("table", SYNS, k=10).collect()
    got = {r["docID"]: r["score"] for r in res}
    # docs 0 (table) and 1 (tbl) have the same tf/dl -> identical score
    assert set(got) == {0, 1, 3}
    assert got[0] == got[1]
    # doc 3 is longer (dl 4 vs 3) -> lower score
    assert got[3] < got[0]


def test_two_slot_or_and(syn_index):
    s, _ = syn_index
    or_hits = {r["docID"] for r in
               s.search_with_synonyms("table scan", SYNS, k=10).collect()}
    assert or_hits == {0, 1, 2, 3}
    and_hits = {r["docID"] for r in
                s.search_with_synonyms("table scan", SYNS, k=10, mode="and").collect()}
    assert and_hits == {3}  # only doc 3 matches BOTH slots


def test_missing_slot_semantics(syn_index):
    s, _ = syn_index
    # 'absent' has no postings and no synonym: OR ignores the slot,
    # AND can never satisfy it
    assert {r["docID"] for r in
            s.search_with_synonyms("table absent", SYNS, k=10).collect()} == {0, 1, 3}
    assert s.search_with_synonyms("table absent", SYNS, k=10, mode="and").count() == 0


def test_slot_df_is_union(syn_index):
    """Union df: slot {table,tbl} has df=3 (docs 0,1,3) — the score must
    use idf(3), not idf(2) of 'table' alone. Verify by closed form."""
    import numpy as np

    from lucene_spark.search.bm25 import idf

    s, _ = syn_index
    res = {r["docID"]: r["score"] for r in
           s.search_with_synonyms("table", SYNS, k=10).collect()}
    w = np.float32(idf(3, 5))
    # doc 0: tf=1, dl=3; avgdl = (3+3+3+4+4)/5 = 3.4
    cache = s.scorer.cache
    norm0 = 3  # dl 3 -> byte4(3) = 3
    expect = np.float32(w - w / (np.float32(1.0) + np.float32(1.0) * cache[norm0]))
    assert res[0] == pytest.approx(float(expect), rel=1e-6)


def test_soft_deletes_wrapper(spark, syn_index):
    from lucene_spark.index.docvalues import set_docvalues

    s, out = syn_index
    set_docvalues(
        spark, out, "__soft_del",
        spark.createDataFrame([Row(docID=0, value=1), Row(docID=4, value=0)]),
    )
    base = {r["docID"] for r in s.search("table", k=10).collect()}
    assert 0 in base
    hidden = s.apply_soft_deletes("__soft_del")
    assert hidden == 1
    try:
        got = {r["docID"] for r in s.search("table", k=10).collect()}
        assert got == base - {0}
        # knn/postings paths share the liveness set
        assert 0 not in {r["docID"] for r in s.postings_tf(["table"]).collect()}
    finally:
        # dropping the wrapper == reopening without it: doc is back,
        # nothing was ever written to the tombstone table
        s.reload_deletes()
    assert {r["docID"] for r in s.search("table", k=10).collect()} == base
    import os
    assert not os.path.exists(os.path.join(out, "deletes"))
