"""Per-position payloads: whitespace tokenizer + delimited-payload filter
(store_payloads) through build / merge / delete / expunge / streaming,
plus the PayloadScoreQuery aggregates.

Reference behavior:
  - DelimitedPayloadTokenFilter (lucene/analysis/common/src/java/org/
    apache/lucene/analysis/payloads/DelimitedPayloadTokenFilter.java:38)
    with IntegerEncoder (IntegerEncoder.java:28)
  - PostingsEnum.PAYLOADS (lucene/core/src/java/org/apache/lucene/index/
    PostingsEnum.java:58)
  - PayloadScoreQuery + Sum/Max/Min/Avg PayloadFunction
    (lucene/queries/src/java/org/apache/lucene/queries/payloads/)
  - WhitespaceTokenizer (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/core/WhitespaceTokenizer.java:28)
"""

import os
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.whitespace import (
    split_payload,
    whitespace_tokens,
    whitespace_window_codes,
)
from lucene_spark.index.builder import build_index
from lucene_spark.search.engine import IndexSearcher


# --------------------------------------------------------------------------
# tokenizer / filter unit tests
# --------------------------------------------------------------------------


def test_whitespace_tokens_basic():
    assert whitespace_tokens("a  b\tc\nd ") == ["a", "b", "c", "d"]
    assert whitespace_tokens("") == []
    # over-long tokens split at max_token_length (CharTokenizer buffer)
    t = "x" * 600
    assert whitespace_tokens(t) == ["x" * 255, "x" * 255, "x" * 90]
    # no lowercasing (WhitespaceAnalyzer applies no filters)
    assert whitespace_tokens("FooBar") == ["FooBar"]


def test_split_payload():
    assert split_payload("foo|5") == ("foo", 5)
    assert split_payload("foo") == ("foo", 0)          # no delimiter
    assert split_payload("foo|bar") == ("foo|bar", 0)  # non-integer suffix
    assert split_payload("|5") == ("|5", 0)            # empty term part
    assert split_payload("a|b|7") == ("a|b", 7)        # LAST delimiter wins
    assert split_payload("foo|") == ("foo|", 0)        # empty payload text


def test_window_codes_payload_collapse():
    # "foo|3" and "foo|5" are distinct surface forms but ONE postings term
    codes, uniq, dls, pays = whitespace_window_codes(
        ["foo|3 foo|5 bar", "foo|3"], parse_payloads=True
    )
    assert list(dls) == [3, 1]
    terms = [uniq[c] for c in codes]
    assert terms == ["foo", "foo", "bar", "foo"]
    assert list(pays) == [3, 5, 0, 3]


# --------------------------------------------------------------------------
# index fixtures
# --------------------------------------------------------------------------

VOCAB = ["apple", "banana", "cherry", "date", "fig", "grape"]


def _make_corpus(n_docs: int, seed: int = 11):
    rng = random.Random(seed)
    rows, exp = [], {}
    for i in range(n_docs):
        toks = []
        for p in range(rng.randint(2, 14)):
            t = rng.choice(VOCAB)
            pay = rng.randint(0, 250)
            toks.append(f"{t}|{pay}")
            exp.setdefault((i, t), []).append(pay)
        rows.append(("r", f"{i:06d}", "0", "en", " ".join(toks)))
    return rows, exp


@pytest.fixture(scope="module")
def pay_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("payidx"))
    rows, exp = _make_corpus(120)
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    manifest = build_index(
        spark, docs, out, partitions=2,
        tokenizer="whitespace", store_payloads=True,
    )
    return out, exp, manifest


def test_manifest_flags(pay_index):
    _, _, m = pay_index
    assert m["store_payloads"] is True
    assert m["tokenizer"] == "whitespace"


def test_postings_payloads_roundtrip(spark, pay_index):
    out, exp, _ = pay_index
    s = IndexSearcher(spark, out)
    for term in ("apple", "grape"):
        got = {}
        for r in s.postings_payloads([term]).orderBy("docID", "pos").collect():
            got.setdefault(int(r["docID"]), []).append(int(r["payload"]))
        want = {d: v for (d, t), v in exp.items() if t == term}
        assert got == want


def test_payload_score_aggregates(spark, pay_index):
    out, exp, _ = pay_index
    s = IndexSearcher(spark, out)
    per_doc = {d: v for (d, t), v in exp.items() if t == "banana"}
    for agg, red in (("sum", sum), ("max", max), ("min", min)):
        got = [
            (int(r["docID"]), int(r["payload_score"]))
            for r in s.payload_score("banana", agg, k=7).collect()
        ]
        want = sorted(
            ((red(v), -d) for d, v in per_doc.items()), reverse=True
        )[:7]
        assert got == [(-d, sc) for sc, d in want]
    # avg returns double
    got = {
        int(r["docID"]): float(r["payload_score"])
        for r in s.payload_score("banana", "avg", k=len(per_doc)).collect()
    }
    for d, v in per_doc.items():
        assert got[d] == pytest.approx(sum(v) / len(v))


def test_payload_score_respects_tombstones(spark, pay_index):
    out, exp, _ = pay_index
    from lucene_spark.index.deletes import delete_by_keys

    s = IndexSearcher(spark, out)
    top = [int(r["docID"]) for r in s.payload_score("apple", "sum", k=3).collect()]
    victim = top[0]
    delete_by_keys(spark, out, [("r", f"{victim:06d}")])
    s2 = IndexSearcher(spark, out)
    top2 = [int(r["docID"]) for r in s2.payload_score("apple", "sum", k=3).collect()]
    assert victim not in top2


def test_expunge_preserves_payload_alignment(spark, pay_index, tmp_path):
    import shutil

    out, exp, _ = pay_index
    out2 = str(tmp_path / "expunged")
    shutil.copytree(out, out2)
    from lucene_spark.index.deletes import (
        delete_by_keys,
        expunge_deletes,
        load_deleted_ids,
    )

    victims = {3, 17, 44}
    delete_by_keys(spark, out2, [("r", f"{v:06d}") for v in victims])
    # the copy may carry tombstones published by earlier tests
    victims = {int(x) for x in load_deleted_ids(spark, out2)}
    expunge_deletes(spark, out2)
    s = IndexSearcher(spark, out2)
    for term in VOCAB:
        got = {}
        for r in s.postings_payloads([term]).orderBy("docID", "pos").collect():
            got.setdefault(int(r["docID"]), []).append(int(r["payload"]))
        want = {
            d: v for (d, t), v in exp.items() if t == term and d not in victims
        }
        assert got == want, term


def test_checkindex_validates_payloads(spark, pay_index):
    out, _, _ = pay_index
    from lucene_spark.index.checkindex import check_index

    rep = check_index(spark, out, full=True)  # raises CheckIndexError on fail
    assert rep["errors"] == []


def test_option_guards(spark):
    docs = spark.createDataFrame(
        [("r", "p", "0", "en", "a|1 b|2")],
        "repo string, path string, commit string, lang string, content string",
    )
    with pytest.raises(ValueError, match="whitespace"):
        build_index(spark, docs, "/tmp/_pay_guard1", store_payloads=True)
    with pytest.raises(ValueError, match="store_positions"):
        build_index(
            spark, docs, "/tmp/_pay_guard2", tokenizer="whitespace",
            store_payloads=True, store_positions=False,
        )
    with pytest.raises(ValueError, match="unknown tokenizer"):
        build_index(spark, docs, "/tmp/_pay_guard3", tokenizer="jflex")


def test_streaming_payload_segments(spark, tmp_path):
    """write_segment + refresh carry pay_vb; streaming==batch payloads."""
    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        refresh,
        write_segment,
    )

    rows, exp = _make_corpus(60, seed=23)
    out = str(tmp_path / "paystream")
    half = len(rows) // 2
    for i, batch in enumerate((rows[:half], rows[half:])):
        df = spark.createDataFrame(
            batch,
            "repo string, path string, commit string, lang string, content string",
        )
        state = _load_state(out)
        nd = write_segment(
            spark, df, out, f"b{i}", state["next_doc"], partitions=2,
            tokenizer="whitespace", store_payloads=True,
        )
        state["next_doc"] += nd
        state["segments"].append({"seg": f"b{i}", "num_docs": nd})
        _atomic_json(_state_path(out), state)
    m = refresh(spark, out, partitions=2)
    assert m["store_payloads"] is True and m["tokenizer"] == "whitespace"
    s = IndexSearcher(spark, out)
    # batches arrive pre-sorted by path here, so docIDs == corpus order
    for term in ("apple", "fig"):
        got = {}
        for r in s.postings_payloads([term]).orderBy("docID", "pos").collect():
            got.setdefault(int(r["docID"]), []).append(int(r["payload"]))
        want = {d: v for (d, t), v in exp.items() if t == term}
        assert got == want, term
