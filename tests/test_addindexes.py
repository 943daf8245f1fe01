"""add_indexes contract (IndexWriter.addIndexes(Directory...) analog):

  - importing a batch-built index into a tiered destination yields
    exactly the union — per-(key, term) tf rows, doc_count, and term df
    all equal the sum of the parts, and check_index passes
  - the imported docs remain queryable after further refreshes and
    after deletes + expunge touching the imported range
  - refusals: source with live tombstones; store_offsets mismatch
"""

import os

import pytest

from lucene_spark.corpus import generate_corpus
from lucene_spark.index.builder import build_index
from lucene_spark.index.checkindex import check_index
from lucene_spark.search.engine import IndexSearcher
from lucene_spark.streaming.incremental import (
    _atomic_json,
    _load_state,
    _state_path,
    add_indexes,
    refresh,
    write_segment,
)

N_A, N_B = 120, 80


def _stream_index(spark, out, pdf, partitions=2):
    """One-segment tiered index over pdf (the established test pattern:
    write_segment + state bookkeeping + refresh)."""
    os.makedirs(out, exist_ok=True)
    n = write_segment(
        spark, spark.createDataFrame(pdf), out, "s0", 0, partitions=partitions
    )
    state = _load_state(out)
    state["next_doc"] = n
    state["segments"].append({"seg": "s0", "num_docs": n})
    _atomic_json(_state_path(out), state)
    refresh(spark, out, partitions=partitions)
    return out


def _tf_rows(spark, idx_dir):
    s = IndexSearcher(spark, idx_dir)
    dm = s.docmap.select("docID", "repo", "path", "commit")
    return {
        (r["repo"], r["path"], r["commit"], r["term"], r["tf"])
        for r in s.postings_tf().join(dm, "docID").collect()
    }


def test_add_indexes_equals_union(spark, tmp_path):
    pdf_a = generate_corpus(N_A)
    pdf_b = generate_corpus(N_B, start=N_A)

    dst = _stream_index(spark, str(tmp_path / "dst"), pdf_a)
    src = str(tmp_path / "src")
    build_index(spark, spark.createDataFrame(pdf_b), src, partitions=4)
    src_only = _tf_rows(spark, src)
    dst_only = _tf_rows(spark, dst)

    m = add_indexes(spark, dst, src, partitions=2)
    assert m["doc_count"] == N_A + N_B

    assert _tf_rows(spark, dst) == dst_only | src_only
    rep = check_index(spark, dst)
    assert rep["errors"] == []

    s = IndexSearcher(spark, dst)
    # term stats are the sums of the parts (probe = a term present in
    # both halves, picked from the data)
    both = {t for (_, _, _, t, _) in dst_only} & {
        t for (_, _, _, t, _) in src_only
    }
    import re

    probe = sorted(t for t in both if re.fullmatch(r"[a-z0-9]+", t))[0]
    stats = s.term_stats([probe])
    assert stats[probe].df == sum(
        1 for (_, _, _, t, _) in dst_only | src_only if t == probe
    )
    # searches hit docs from BOTH parts
    hits = [r["docID"] for r in s.search([probe], k=500).collect()]
    assert hits
    # imported range starts at N_A
    assert any(h >= N_A for h in hits) and any(h < N_A for h in hits)


def test_add_indexes_then_delete_and_expunge(spark, tmp_path):
    from lucene_spark.index.deletes import delete_by_keys
    from lucene_spark.streaming.incremental import expunge_deletes_tiered

    pdf_a = generate_corpus(60)
    pdf_b = generate_corpus(40, start=60)
    dst = _stream_index(spark, str(tmp_path / "dst"), pdf_a)
    src = str(tmp_path / "src")
    build_index(spark, spark.createDataFrame(pdf_b), src, partitions=2)
    add_indexes(spark, dst, src, partitions=2)

    # delete one imported doc by key, expunge, verify it is gone
    victim = (pdf_b.iloc[0]["repo"], pdf_b.iloc[0]["path"])
    n_del = delete_by_keys(spark, dst, [victim])
    assert n_del == 1
    m = expunge_deletes_tiered(spark, dst, partitions=2)
    assert m["doc_count"] == 99
    rows = _tf_rows(spark, dst)
    assert not any(
        r[0] == victim[0] and r[1] == victim[1] for r in rows
    )
    rep = check_index(spark, dst)
    assert rep["errors"] == []


def test_add_indexes_refusals(spark, tmp_path):
    from lucene_spark.index.deletes import delete_by_keys

    pdf_a = generate_corpus(30)
    pdf_b = generate_corpus(20, start=30)
    dst = _stream_index(spark, str(tmp_path / "dst"), pdf_a)

    # tombstoned source refused
    src1 = str(tmp_path / "src1")
    build_index(spark, spark.createDataFrame(pdf_b), src1, partitions=2)
    delete_by_keys(spark, src1, [(pdf_b.iloc[0]["repo"], pdf_b.iloc[0]["path"])])
    with pytest.raises(ValueError, match="tombstones"):
        add_indexes(spark, dst, src1)

    # store_offsets mismatch refused
    src2 = str(tmp_path / "src2")
    build_index(
        spark, spark.createDataFrame(pdf_b), src2, partitions=2,
        store_offsets=True,
    )
    with pytest.raises(ValueError, match="store_offsets"):
        add_indexes(spark, dst, src2)
