"""Delete semantics (index/PendingDeletes.java analog):
  - tombstoned docs vanish from every query path; survivors keep their
    exact pre-delete scores (stale stats until merge, like Lucene)
  - count() switches to live-doc counting under deletes
  - expunge rewrites the index; results then match a fresh oracle built
    on the surviving docs (stats recomputed)
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import corpus_spark_df, generate_corpus
from lucene_spark.index.builder import build_index
from lucene_spark.index.deletes import delete_by_keys, delete_by_query, expunge_deletes
from lucene_spark.oracle import OracleIndex, assert_rank_identical
from lucene_spark.search.engine import IndexSearcher

N_DOCS = 300


@pytest.fixture()
def idx(spark, tmp_path):
    out = str(tmp_path / "del_idx")
    docs = corpus_spark_df(spark, N_DOCS, partitions=4)
    build_index(spark, docs, out, partitions=4)
    return out


def test_delete_filters_all_paths_and_expunge(spark, idx):
    s = IndexSearcher(spark, idx)
    before = [(r["docID"], r["score"]) for r in s.search("license apache", k=20).collect()]
    assert before

    # delete the top-5 docs by their (repo, path) keys
    victim_ids = {d for d, _ in before[:5]}
    dm = s.docmap.filter(F.col("docID").isin([int(x) for x in victim_ids]))
    keys = [(r["repo"], r["path"]) for r in dm.collect()]
    n = delete_by_keys(spark, idx, keys)
    assert n == 5
    assert s.reload_deletes() == 5

    after = [(r["docID"], r["score"]) for r in s.search("license apache", k=20).collect()]
    assert not ({d for d, _ in after} & victim_ids)
    # survivors keep identical scores and relative order (stale stats)
    surviving_before = [(d, sc) for d, sc in before if d not in victim_ids]
    assert after[: len(surviving_before)] == surviving_before[:len(after)]

    # phrase + synonym + count paths also honor tombstones
    ph = {r["docID"] for r in s.search_phrase("apache software foundation", k=50).collect()}
    assert not (ph & victim_ids)
    syn = {r["docID"] for r in s.search_synonym(["license", "apache"], k=50).collect()}
    assert not (syn & victim_ids)
    assert s.count("license") == len(
        {r["docID"] for r in s.postings_tf(["license"]).select("docID").collect()}
    )

    # delete-by-query and expunge
    n2 = delete_by_query(spark, s, "var0")
    s.reload_deletes()
    total_deleted = s._deleted.size
    assert total_deleted >= 5

    manifest = expunge_deletes(spark, idx)
    assert manifest["doc_count"] == N_DOCS - total_deleted

    s2 = IndexSearcher(spark, idx)
    assert s2._deleted.size == 0
    # post-expunge the index equals a fresh oracle over surviving docs
    # (docIDs preserved, stats recomputed)
    surviving = sorted(r["docID"] for r in s2.docmap.select("docID").collect())
    pdf = generate_corpus(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    contents = [pdf.iloc[i]["content"] for i in surviving]
    oracle = OracleIndex(contents, doc_ids=surviving)
    for q, mode in [("license apache", "or"), ("def return", "and"), ("table", "or")]:
        got = [(r["docID"], r["score"]) for r in s2.search(q, k=10, mode=mode).collect()]
        exp = oracle.search([t for t in q.split()], k=10, mode=mode)
        assert_rank_identical(exp, got, msg=f"[post-expunge {q} {mode}]")


def test_antijoin_tombstone_mode(spark, idx):
    """Above ANTIJOIN_DELETES_THRESHOLD the tombstone set must not ship
    to tasks at all: kernels see an empty array and a left_anti join
    strips deleted docs — results identical to broadcast mode."""
    s = IndexSearcher(spark, idx)
    before = [(r["docID"], r["score"]) for r in s.search("license apache", k=20).collect()]
    victim_ids = {d for d, _ in before[:5]}
    dm = s.docmap.filter(F.col("docID").isin([int(x) for x in victim_ids]))
    delete_by_keys(spark, idx, [(r["repo"], r["path"]) for r in dm.collect()])

    s.ANTIJOIN_DELETES_THRESHOLD = 0  # force anti-join mode
    assert s.reload_deletes() == 5
    assert s._tombstones is not None and s._deleted.size == 0

    after = [(r["docID"], r["score"]) for r in s.search("license apache", k=20).collect()]
    assert not ({d for d, _ in after} & victim_ids)
    surviving_before = [(d, sc) for d, sc in before if d not in victim_ids]
    assert after[: len(surviving_before)] == surviving_before[: len(after)]
    ph = {r["docID"] for r in s.search_phrase("apache software foundation", k=50).collect()}
    assert not (ph & victim_ids)
    syn = {r["docID"] for r in s.search_synonym(["license", "apache"], k=50).collect()}
    assert not (syn & victim_ids)
    pr = [(r["docID"], r["score"]) for r in s.search("license apache", k=10, prune=True).collect()]
    assert pr == after[:10]


def test_update_documents_incremental(spark, tmp_path):
    """updateDocument: same-key re-add replaces the old version in query
    results (old docID tombstoned, new docID appended)."""
    import pandas as pd

    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        refresh,
        update_documents,
        write_segment,
    )

    out = str(tmp_path / "upd_idx")
    os.makedirs(out)
    pdf = generate_corpus(120).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    n0 = write_segment(spark, spark.createDataFrame(pdf), out, "s0", 0, partitions=4)
    state = _load_state(out)
    state["next_doc"] = n0
    state["segments"].append({"seg": "s0", "num_docs": n0})
    _atomic_json(_state_path(out), state)
    refresh(spark, out, partitions=4)

    victim = pdf.iloc[0]
    new_row = dict(victim)
    new_row["content"] = "zzzupdated sentinel content only here"
    res = update_documents(
        spark, out, spark.createDataFrame(pd.DataFrame([new_row])), partitions=2
    )
    assert res["deleted"] == 1 and res["added"] == 1

    s = IndexSearcher(spark, out)
    assert s._deleted.size == 1
    hits = [r["docID"] for r in s.search("zzzupdated", k=5).collect()]
    assert hits == [120]  # appended docID
    # the OLD docID is tombstoned out of every decoded posting
    old_hit_ids = {r["docID"] for r in s.postings_tf().select("docID").distinct().collect()}
    assert 0 not in old_hit_ids  # docID 0 was the sorted-first victim


def test_compaction_reclaims_tombstones(spark, tmp_path):
    """Merge-applies-deletes: tier compaction physically drops tombstoned
    docs from the compacted generation (SegmentMerger.java:114-151
    analog) — the raw gen parquet no longer contains them even WITHOUT
    query-time tombstone filtering — and a later refresh adding new
    segments never resurrects them."""
    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        refresh,
        write_segment,
    )
    from lucene_spark.util.blockcodec import decode_block
    from lucene_spark.util.varbyte import delta_decode

    out = str(tmp_path / "reclaim_idx")
    os.makedirs(out)
    pdf = (
        generate_corpus(240)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )

    def add_segment(name, lo, hi, start):
        n = write_segment(
            spark,
            spark.createDataFrame(pdf.iloc[lo:hi]),
            out, name, start, partitions=2,
        )
        state = _load_state(out)
        state["next_doc"] = start + n
        state["segments"].append({"seg": name, "num_docs": n})
        _atomic_json(_state_path(out), state)
        return n

    n0 = add_segment("s0", 0, 120, 0)
    refresh(spark, out, partitions=2)
    add_segment("s1", 120, 200, n0)
    refresh(spark, out, partitions=2)

    s = IndexSearcher(spark, out)
    before = [
        (r["docID"], r["score"]) for r in s.search("license apache", k=20).collect()
    ]
    victim_ids = {d for d, _ in before[:4]}
    dm = s.docmap.filter(F.col("docID").isin([int(x) for x in victim_ids]))
    keys = [(r["repo"], r["path"]) for r in dm.collect()]
    assert delete_by_keys(spark, out, keys) == len(victim_ids)

    # force full compaction: the single surviving gen must not contain
    # the victims even when decoded WITHOUT tombstone filtering
    refresh(spark, out, partitions=2, segs_per_tier=1)
    import json

    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["gens"]) == 1
    gen_dir = os.path.join(out, "postings", f"gen={manifest['gens'][0]}")
    raw_ids = set()
    for r in spark.read.parquet(gen_dir).select("docs_vb").collect():
        raw_ids.update(delta_decode(decode_block(bytes(r["docs_vb"]))).tolist())
    assert not (raw_ids & victim_ids), "compaction left tombstoned docs"

    # later refresh with a new segment must not resurrect the victims
    add_segment("s2", 200, 240, 200)
    refresh(spark, out, partitions=2)
    s2 = IndexSearcher(spark, out)
    after = {r["docID"] for r in s2.search("license apache", k=300).collect()}
    assert not (after & victim_ids)
    assert after >= {d for d, _ in before if d not in victim_ids}


def test_expunge_deletes_tiered(spark, tmp_path):
    """forceMergeDeletes on a tiered incremental index: expunge_deletes
    routes to the per-gen rewrite — tombstones physically applied and
    cleared, docmap rows dropped, doc_count reflects survivors, queries
    match a fresh oracle over the surviving docs, and a later segment +
    refresh can't resurrect the victims."""
    import json

    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        refresh,
        write_segment,
    )
    from lucene_spark.util.blockcodec import decode_block
    from lucene_spark.util.varbyte import delta_decode

    out = str(tmp_path / "texp_idx")
    os.makedirs(out)
    n = 240
    pdf = generate_corpus(n).sort_values(["repo", "path", "commit"]).reset_index(drop=True)

    def add_segment(name, lo, hi, start):
        part = pdf.iloc[lo:hi]
        nd = write_segment(
            spark, spark.createDataFrame(part), out, name, start, partitions=2
        )
        state = _load_state(out)
        state["next_doc"] = start + nd
        state["segments"].append({"seg": name, "num_docs": nd})
        _atomic_json(_state_path(out), state)
        return nd

    # three gens (refresh per segment), victims spread across gens
    add_segment("s0", 0, 80, 0)
    refresh(spark, out, partitions=2)
    add_segment("s1", 80, 160, 80)
    refresh(spark, out, partitions=2)
    add_segment("s2", 160, 240, 160)
    refresh(spark, out, partitions=2)

    s = IndexSearcher(spark, out)
    assert len(s.manifest["gens"]) == 3
    before = [
        (r["docID"], r["score"]) for r in s.search("license apache", k=240).collect()
    ]
    # victims from distinct thirds of the docID space (distinct gens)
    victim_ids = sorted(
        [d for d, _ in before if d < 80][:2]
        + [d for d, _ in before if 80 <= d < 160][:2]
        + [d for d, _ in before if d >= 160][:2]
    )
    dm = s.docmap.filter(F.col("docID").isin([int(x) for x in victim_ids]))
    keys = [(r["repo"], r["path"]) for r in dm.collect()]
    assert delete_by_keys(spark, out, keys) == len(victim_ids)

    manifest = expunge_deletes(spark, out)
    assert manifest["doc_count"] == n - len(victim_ids)
    assert manifest.get("expunged_at")

    s2 = IndexSearcher(spark, out)
    assert s2._deleted.size == 0  # tombstones gone
    surviving = sorted(r["docID"] for r in s2.docmap.select("docID").collect())
    assert len(surviving) == n - len(victim_ids)
    assert not (set(surviving) & set(victim_ids))

    # raw postings (decoded WITHOUT tombstone filtering) hold no victims
    raw_ids = set()
    for g in manifest["gens"]:
        gen_dir = os.path.join(out, "postings", f"gen={g}")
        for r in spark.read.parquet(gen_dir).select("docs_vb").collect():
            raw_ids.update(delta_decode(decode_block(bytes(r["docs_vb"]))).tolist())
    assert not (raw_ids & set(victim_ids))

    # post-expunge results equal a fresh oracle over the survivors
    # (docIDs preserved, stats recomputed — same contract as batch expunge)
    contents = [pdf.iloc[i]["content"] for i in surviving]
    oracle = OracleIndex(contents, doc_ids=surviving)
    for q, mode in [("license apache", "or"), ("def return", "and")]:
        got = [(r["docID"], r["score"]) for r in s2.search(q, k=10, mode=mode).collect()]
        exp = oracle.search([t for t in q.split()], k=10, mode=mode)
        assert_rank_identical(exp, got, msg=f"[tiered post-expunge {q} {mode}]")

    # a later segment + refresh must not resurrect the victims, and
    # doc_count keeps accounting for the expunged docs
    extra = generate_corpus(280).sort_values(["repo", "path", "commit"]).reset_index(drop=True).iloc[240:280]
    nd = write_segment(spark, spark.createDataFrame(extra), out, "s3", 240, partitions=2)
    state = _load_state(out)
    state["next_doc"] = 240 + nd
    state["segments"].append({"seg": "s3", "num_docs": nd})
    _atomic_json(_state_path(out), state)
    m3 = refresh(spark, out, partitions=2)
    assert m3["doc_count"] == n - len(victim_ids) + nd
    s3 = IndexSearcher(spark, out)
    after = {r["docID"] for r in s3.search("license apache", k=300).collect()}
    assert not (after & set(victim_ids))


def test_update_hit_docids_no_driver_collect(spark):
    """update_documents derives tombstone docIDs with a pure distributed
    semi-join (r4 verdict #4): the physical plan must join the docmap
    against the batch's distinct keys directly — no driver-collected key
    list rebuilt as a LocalTableScan / in-memory relation."""
    from lucene_spark.streaming.incremental import _update_hit_docids

    docmap = spark.createDataFrame(
        [("r1", "a", 0), ("r1", "b", 1), ("r2", "a", 2)],
        "repo string, path string, docID long",
    )
    batch = spark.createDataFrame(
        [("r1", "a", "c1", "py", "x"), ("r2", "a", "c2", "py", "y")],
        "repo string, path string, commit string, lang string, content string",
    )
    hit = _update_hit_docids(docmap, batch)
    assert {r["docID"] for r in hit.collect()} == {0, 2}
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
