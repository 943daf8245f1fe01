"""SemDeDup (embedding-cluster dedup) + SpanPositionRangeQuery.

Reference behavior:
  - SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings,
    compare only within clusters, keep one representative per near-dup
    component. No Lucene analog; training-data pipeline surface.
  - SpanPositionRangeQuery (queries/spans/SpanPositionRangeQuery.java:30):
    spans with start() >= start AND end() <= end; SpanFirstQuery is the
    start=0 special case."""

import pytest

from lucene_spark.oracle import assert_rank_identical

PHRASE = ["getvalue0", "var0"]
SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _collect(df):
    return [(int(r["docID"]), float(r["score"])) for r in df.collect()]


# -- SpanPositionRange --------------------------------------------------------

@pytest.mark.parametrize("start,end", [(0, 60), (20, 120), (50, 10**6), (30, 40)])
def test_span_position_range(built_index, start, end):
    _, oracle, searcher = built_index
    got = _collect(
        searcher.search_span_position_range(PHRASE, start=start, end=end, k=10)
    )
    exp = oracle.search_spans(
        PHRASE, k=10, first_end=end, first_start=start
    )
    assert_rank_identical(exp, got, msg=f"span_position_range [{start},{end}]")


def test_span_position_range_start0_equals_first(built_index):
    _, _, searcher = built_index
    a = _collect(searcher.search_span_position_range(PHRASE, 0, 80, k=10))
    b = _collect(searcher.search_span_first(PHRASE, end=80, k=10))
    assert a == b


def test_span_position_range_empty_window(built_index):
    _, _, searcher = built_index
    assert (
        searcher.search_span_position_range(PHRASE, 10**6, 10**6 + 1, k=5).count()
        == 0
    )


# -- SemDeDup -----------------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF_EMB)


def test_semantic_pairs_subset_of_exact(spark, emb):
    """Within-cluster pairs are a SUBSET of the exact all-pairs result
    with identical cosines; recall is reported and must be substantial
    (planted near-dups are nearly parallel, so they share a cell)."""
    from lucene_spark.pipeline.ann import emb_near_dup_pairs, semantic_dedup_pairs

    exact = {
        (int(r["a"]), int(r["b"])): float(r["cos"])
        for r in emb_near_dup_pairs(spark, emb, threshold=0.45).collect()
    }
    sem = {
        (int(r["a"]), int(r["b"])): float(r["cos"])
        for r in semantic_dedup_pairs(spark, emb, threshold=0.45).collect()
    }
    assert exact, "test data should contain planted near-dup pairs"
    assert set(sem) <= set(exact)
    for k, v in sem.items():
        assert abs(v - exact[k]) < 1e-9
    recall = len(sem) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f} too low for planted near-dups"


def test_semantic_dedup_keep_semantics(spark, emb):
    from lucene_spark.pipeline.ann import semantic_dedup, semantic_dedup_pairs

    rows = semantic_dedup(spark, emb, threshold=0.45).collect()
    n = emb.count()
    assert len(rows) == n
    by_id = {int(r["vec_id"]): (int(r["cluster"]), bool(r["keep"])) for r in rows}
    # keep <=> id is its cluster's minimum; every cluster keeps exactly one
    clusters = {}
    for vid, (c, keep) in by_id.items():
        clusters.setdefault(c, []).append((vid, keep))
        assert c <= vid  # min-label invariant
    for c, members in clusters.items():
        keeps = [vid for vid, k in members if k]
        assert keeps == [c], f"cluster {c} keeps {keeps}"
    # paired ids share a cluster
    pairs = semantic_dedup_pairs(spark, emb, threshold=0.45).collect()
    assert pairs
    for r in pairs:
        assert by_id[int(r["a"])][0] == by_id[int(r["b"])][0]


def test_semantic_dedup_no_pairs_all_kept(spark, emb):
    from lucene_spark.pipeline.ann import semantic_dedup

    rows = semantic_dedup(spark, emb, threshold=1.1).collect()
    assert all(bool(r["keep"]) for r in rows)
    assert all(int(r["cluster"]) == int(r["vec_id"]) for r in rows)
