"""ReverseStringFilter leading wildcards, PhraseWildcardQuery, and
index replication.

Reference behavior:
  - ReverseStringFilter (analysis/common/.../reverse/
    ReverseStringFilter.java:28): reverse each token at index AND query
    time; *suffix then becomes a prefix over the reversed dictionary —
    the classic efficient-leading-wildcard recipe.
  - PhraseWildcardQuery (sandbox/search/PhraseWildcardQuery.java:60):
    phrase with wildcard slots, expanded then run with
    MultiPhraseQuery semantics.
  - Replicator (replicator/IndexReplicationHandler.java:48,
    nrt/ReplicaNode.java:66): sync only missing files, publish the
    commit point (manifest) last; writer state never ships."""

import os

import pytest

from lucene_spark.oracle import assert_rank_identical

SUF = "95"  # constant_195, do_thing_95, ... ~30 forward terms end in 95


def _collect(df):
    return [(int(r["docID"]), float(r["score"])) for r in df.collect()]


@pytest.fixture(scope="module")
def reverse_index(spark, tmp_path_factory):
    from lucene_spark.corpus import corpus_spark_df, generate_corpus
    from lucene_spark.index.builder import build_index
    from lucene_spark.oracle import OracleIndex
    from lucene_spark.search.engine import IndexSearcher

    n = 200
    out = str(tmp_path_factory.mktemp("rev") / "index")
    build_index(
        spark, corpus_spark_df(spark, n, partitions=4), out,
        partitions=4, token_filters=("reverse",),
    )
    pdf = (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    # forward oracle: the reversal must be transparent end-to-end
    oracle = OracleIndex(pdf["content"].tolist())
    yield oracle, IndexSearcher(spark, out)


# -- ReverseStringFilter ------------------------------------------------------

def test_reverse_filter_registered():
    from lucene_spark.analysis.porter import TOKEN_FILTERS

    assert TOKEN_FILTERS["reverse"]("getvalue0") == "0eulavteg"


def test_reverse_index_transparent_term_search(reverse_index):
    """Query-side filtering reverses query terms too, so plain search
    is rank-identical to the forward oracle."""
    oracle, searcher = reverse_index
    got = _collect(searcher.search(["getvalue0"], k=10))
    assert_rank_identical(oracle.search(["getvalue0"], k=10), got)


def test_suffix_terms_pruned_slice(reverse_index):
    oracle, searcher = reverse_index
    stored = {r["term"] for r in searcher.suffix_terms(SUF).collect()}
    expected = {t[::-1] for t in oracle.postings if t.endswith(SUF)}
    assert stored == expected and stored


def test_search_suffix_matches_forward_expansion(reverse_index):
    """*95 == scoring-boolean sum over every forward term ending 95."""
    oracle, searcher = reverse_index
    got = _collect(searcher.search_suffix(SUF, k=10))
    terms = sorted(t for t in oracle.postings if t.endswith(SUF))
    assert len(terms) >= 2  # many constant_*95 / do_thing_*95 variants
    exp = oracle.search(terms, k=10, mode="or")
    assert_rank_identical(exp, got, msg="search_suffix")


def test_search_suffix_refused_on_forward_index(built_index):
    _, _, searcher = built_index
    with pytest.raises(ValueError, match="reverse"):
        searcher.search_suffix("ing")


def test_search_suffix_no_match(reverse_index):
    _, searcher = reverse_index
    assert searcher.search_suffix("zzzqqq", k=5).count() == 0


# -- PhraseWildcardQuery ------------------------------------------------------

def test_phrase_wildcard_equals_multiphrase(built_index):
    _, oracle, searcher = built_index
    exp_terms = searcher.expand_terms(prefix="va", top_terms=True)
    assert len(exp_terms) >= 2
    got = _collect(searcher.search_phrase_wildcard(["getvalue0", "va*"], k=10))
    exp = oracle.search_multi_phrase([["getvalue0"], exp_terms], k=10)
    assert_rank_identical(exp, got, msg="phrase_wildcard trailing slot")


def test_phrase_wildcard_leading_slot(built_index):
    _, oracle, searcher = built_index
    exp_terms = searcher.expand_terms(prefix="getvalue0", top_terms=True)
    got = _collect(searcher.search_phrase_wildcard(["getvalue0*", "var0"], k=10))
    exp = oracle.search_multi_phrase([exp_terms, ["var0"]], k=10)
    assert_rank_identical(exp, got, msg="phrase_wildcard leading slot")


def test_phrase_wildcard_empty_expansion(built_index):
    _, _, searcher = built_index
    assert searcher.search_phrase_wildcard(["zzzq*", "var0"], k=5).count() == 0


# -- Replicator ---------------------------------------------------------------

def _top(searcher, terms):
    return _collect(searcher.search(terms, k=10))


def test_replicate_batch_index(spark, tmp_path):
    from lucene_spark.corpus import corpus_spark_df
    from lucene_spark.index.builder import build_index
    from lucene_spark.index.replicator import replicate
    from lucene_spark.search.engine import IndexSearcher

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    build_index(spark, corpus_spark_df(spark, 120, partitions=4), src, partitions=4)
    r = replicate(src, dst)
    assert "postings" in r["copied"]
    s_src = IndexSearcher(spark, src)
    s_dst = IndexSearcher(spark, dst)
    assert s_dst.manifest == s_src.manifest
    assert _top(s_dst, ["getvalue0"]) == _top(s_src, ["getvalue0"])
    # second sync of an unchanged commit copies no postings
    r2 = replicate(src, dst)
    assert "postings" in r2["skipped"]


def test_replicate_tiered_incremental(spark, tmp_path):
    from lucene_spark.corpus import generate_corpus
    from lucene_spark.index.deletes import delete_by_keys
    from lucene_spark.index.replicator import replicate
    from lucene_spark.search.engine import IndexSearcher
    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        refresh,
        write_segment,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    os.makedirs(src)
    pdf = (
        generate_corpus(160)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )

    def add_chunk(part, seg):
        state = _load_state(src)
        nd = write_segment(
            spark, spark.createDataFrame(part), src, seg, state["next_doc"],
            partitions=2,
        )
        state["next_doc"] += nd
        state["segments"].append({"seg": seg, "num_docs": nd})
        _atomic_json(_state_path(src), state)
        return refresh(spark, src, partitions=2)

    m1 = add_chunk(pdf.iloc[:80], "s0")
    r1 = replicate(src, dst)
    gen0 = m1["gens"][0]
    assert os.path.join("postings", f"gen={gen0}") in r1["copied"]
    s_dst = IndexSearcher(spark, dst)
    s_src = IndexSearcher(spark, src)
    assert _top(s_dst, ["getvalue0"]) == _top(s_src, ["getvalue0"])

    # second segment + a delete on the primary, then an incremental sync
    m2 = add_chunk(pdf.iloc[80:], "s1")
    key = (pdf.iloc[0]["repo"], pdf.iloc[0]["path"])
    assert delete_by_keys(spark, src, [key]) >= 1
    r2 = replicate(src, dst)
    assert os.path.join("postings", f"gen={gen0}") in r2["skipped"]
    new_gens = [g for g in m2["gens"] if g != gen0]
    assert all(
        os.path.join("postings", f"gen={g}") in r2["copied"] for g in new_gens
    )
    s_dst2 = IndexSearcher(spark, dst)
    s_src2 = IndexSearcher(spark, src)
    assert s_dst2.manifest == s_src2.manifest
    assert _top(s_dst2, ["getvalue0"]) == _top(s_src2, ["getvalue0"])
    # the tombstone replicated: the deleted doc is gone on the replica
    assert s_dst2._deleted.size == s_src2._deleted.size >= 1

    # writer-private state never ships
    for private in ("runs", "inverted_stream", "state.json", "terms_gens"):
        assert not os.path.exists(os.path.join(dst, private)), private

    # idempotent third sync: every generation skips
    r3 = replicate(src, dst)
    assert not [p for p in r3["copied"] if p.startswith("postings")]


def test_replicate_ships_aux_artifacts(spark, tmp_path):
    """termvectors / ivf / docvalues are searcher-visible and must reach
    the replica (a replica serves term_vector()/ivf_search() too)."""
    import os

    from lucene_spark.corpus import corpus_spark_df
    from lucene_spark.index.builder import build_index
    from lucene_spark.index.docvalues import set_docvalues
    from lucene_spark.index.replicator import replicate

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    build_index(
        spark, corpus_spark_df(spark, 60, partitions=2), src, partitions=2,
        store_term_vectors=True, store_offsets=True,
    )
    set_docvalues(
        spark, src, "f",
        spark.createDataFrame([(i, i * 2) for i in range(60)],
                              "docID long, value long"),
    )
    r = replicate(src, dst)
    assert "termvectors" in r["copied"]
    assert os.path.isdir(os.path.join(dst, "termvectors"))
    assert any(p.startswith(os.path.join("docvalues", "f")) for p in r["copied"])
    # the replica's docvalues read path resolves through its manifest
    from lucene_spark.index.docvalues import read_docvalues

    assert read_docvalues(spark, dst, "f").count() == 60
