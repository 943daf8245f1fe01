"""LengthFilter end-to-end: the parameterized dropping filter.

Reference behavior (lucene/analysis/common/src/java/org/apache/lucene/
analysis/miscellaneous/LengthFilter.java:28, a FilteringTokenFilter):
tokens with min <= length <= max survive, the rest are removed with
accumulated position increments — identical drop semantics to
StopFilter, but keyed by token length and configured per-instance.
Our chain pins the configuration in the manifest as the plain string
``length_<min>_<max>`` so readers rebuild the exact filter.

Expectations come from OracleIndex(contents, token_filters=(name,)),
whose per-token python loop is independent of the vectorized
vocab-remap invert path.
"""
import shutil

import pytest

from lucene_spark.analysis.porter import chain_can_drop, resolve_filter
from lucene_spark.analysis.standard import analyze
from lucene_spark.corpus import corpus_spark_df, generate_corpus
from lucene_spark.oracle import OracleIndex, assert_rank_identical

N_DOCS = 200
CHAIN = ("length_3_7",)


def test_resolve_filter_grammar():
    fn = resolve_filter("length_3_7")
    assert fn("abc") == "abc" and fn("abcdefg") == "abcdefg"
    assert fn("ab") is None and fn("abcdefgh") is None
    assert chain_can_drop(CHAIN)
    assert not chain_can_drop(("porter", "reverse"))
    for bad in ("length_7_3", "length_x_7", "length_3", "nope"):
        with pytest.raises(KeyError):
            resolve_filter(bad)


@pytest.fixture(scope="module")
def len_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    out = str(tmp_path_factory.mktemp("lenf") / "idx")
    docs = corpus_spark_df(spark, N_DOCS, partitions=4)
    manifest = build_index(
        spark, docs, out, partitions=4, token_filters=CHAIN
    )
    pdf = (
        generate_corpus(N_DOCS)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    oracle = OracleIndex(pdf["content"].tolist(), token_filters=CHAIN)
    searcher = IndexSearcher(spark, out)
    yield manifest, oracle, searcher, pdf
    shutil.rmtree(out, ignore_errors=True)


def test_vocabulary_bounded(len_index):
    _, _, searcher, _ = len_index
    terms = [r["term"] for r in searcher.terms_table.select("term").collect()]
    assert terms, "empty vocabulary"
    assert all(3 <= len(t) <= 7 for t in terms)


def test_dl_and_positions_match_oracle(len_index):
    _, oracle, searcher, pdf = len_index
    dls = {r["docID"]: r["dl"] for r in searcher.docmap.collect()}
    for row in range(N_DOCS):
        assert dls[row] == int(oracle.dl[row]), row
    raw = [len(analyze(t)) for t in pdf["content"].tolist()]
    assert any(int(oracle.dl[r]) < raw[r] for r in range(N_DOCS))
    # gapped positions on a surviving mid-length term
    t = "apache"
    rows, _, posmap = oracle.postings[t]
    exp = sorted(
        (int(oracle.doc_ids[r]), int(p))
        for r in rows.tolist()
        for p in posmap[r].tolist()
    )
    got = sorted(
        (r["docID"], p)
        for r in searcher.postings_positions([t]).collect()
        for p in (list(r["pos"]) if isinstance(r["pos"], list) else [r["pos"]])
    )
    assert got == exp


@pytest.mark.parametrize("mode", ["or", "and"])
def test_bm25_rank_identity(len_index, mode):
    _, oracle, searcher, _ = len_index
    q = ["license", "apache"]
    got = [
        (r["docID"], r["score"])
        for r in searcher.search(q, k=10, mode=mode).collect()
    ]
    exp = oracle.search(q, k=10, mode=mode)
    assert_rank_identical(exp, got, msg=f"length bm25 {mode}")


def test_query_side_drops_out_of_range_tokens(len_index):
    _, _, searcher, _ = len_index
    # 'to' (len 2) drops from the query like an absent clause
    a = [(r["docID"], r["score"]) for r in searcher.search("to license", k=10).collect()]
    b = [(r["docID"], r["score"]) for r in searcher.search("license", k=10).collect()]
    assert a == b
    assert searcher._parse("a to be") == []


def test_manifest_pins_configuration(len_index):
    manifest, oracle, _, _ = len_index
    assert manifest["token_filters"] == ["length_3_7"]
    assert manifest["sum_total_term_freq"] == int(oracle.dl.sum())


def test_unknown_filter_rejected(spark, tmp_path):
    from lucene_spark.index.builder import build_index

    docs = corpus_spark_df(spark, 5, partitions=1)
    with pytest.raises(ValueError, match="unknown token filter"):
        build_index(
            spark, docs, str(tmp_path / "bad"), token_filters=("length_9_1",)
        )


def test_monitor_droppy_chain(spark):
    """Monitor's tokenize kernel must strip -1 (dropped) codes before
    packing (doc, code) keys — an aliased -1 would either crash the
    vocab gather or attribute a term to the PREVIOUS document."""
    from pyspark.sql import Row

    from lucene_spark.streaming.monitor import Monitor

    docs = spark.createDataFrame([
        Row(repo="r", path="0", commit="0", lang="en",
            content="alpha to the alpha"),
        Row(repo="r", path="1", commit="0", lang="en",
            content="a to be"),  # every token dropped
        Row(repo="r", path="2", commit="0", lang="en",
            content="beta gamma"),
    ])
    m = Monitor(
        spark,
        [("q1", ["alpha", "to"], "or"), ("q2", ["alpha", "be"], "and")],
        token_filters=CHAIN,
    )
    got = {(r["query_id"], r["path"]) for r in m.match_batch(docs).collect()}
    # 'to'/'be' drop from the registered queries; q2's AND needs only
    # the surviving clause
    assert got == {("q1", "0"), ("q2", "0")}


def test_nb_batch_equals_single_droppy(spark, len_index):
    """nb_classify_batch's tokenizer must apply the same drop handling
    as the single-text path (searcher._parse)."""
    import math

    from lucene_spark.search.classify import nb_classify, nb_classify_batch

    _, _, searcher, _ = len_index
    labels = spark.createDataFrame(
        [(i, str(i % 2)) for i in range(N_DOCS)], "docID long, cls string"
    )
    text = "to license apache a spark"  # 'to'/'a' drop
    single = {
        r.cls: (r.score, r.prob)
        for r in nb_classify(searcher, text, labels).collect()
    }
    docs = spark.createDataFrame(
        [(0, text), (1, "a to be")], "qid long, text string"
    )
    batch = nb_classify_batch(searcher, docs, labels).collect()
    got = {}
    for r in batch:
        got.setdefault(r.qid, {})[r.cls] = (r.score, r.prob)
    assert set(got.get(0, {})) == set(single) and single
    for c, (s, p) in single.items():
        assert math.isclose(got[0][c][0], s, rel_tol=1e-9), c
        assert math.isclose(got[0][c][1], p, rel_tol=1e-9, abs_tol=1e-12), c
    # an all-dropped input classifies to nothing on both paths
    assert 1 not in got
    assert nb_classify(searcher, "a to be", labels).collect() == []
