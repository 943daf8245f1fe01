"""CheckIndex contract: all three writers (batch builder, resumable
builder, streaming refresh) produce indexes that pass the full
structural verification, and a corrupted index is loudly rejected."""

import json
import os

import pytest

from lucene_spark.corpus import corpus_spark_df, generate_corpus
from lucene_spark.index.builder import build_index
from lucene_spark.index.checkindex import CheckIndexError, check_index
from lucene_spark.index.resumable import build_index_resumable

N_DOCS = 240


def test_checkindex_batch(spark, tmp_path):
    out = str(tmp_path / "ci_batch")
    build_index(spark, corpus_spark_df(spark, N_DOCS, partitions=4), out, partitions=4)
    report = check_index(spark, out, full=True)
    assert report["errors"] == []
    assert report["doc_count"] == N_DOCS
    assert report["n_blocks"] > 0


def test_checkindex_resumable(spark, tmp_path):
    out = str(tmp_path / "ci_res")
    docs = corpus_spark_df(spark, N_DOCS, partitions=4)
    build_index_resumable(spark, docs, out, num_segments=3, partitions=4)
    report = check_index(spark, out, full=True)
    assert report["errors"] == []
    assert report["doc_count"] == N_DOCS


def test_checkindex_streaming_and_corruption(spark, tmp_path):
    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        refresh,
        write_segment,
    )

    out = str(tmp_path / "ci_nrt")
    os.makedirs(out)
    pdf = generate_corpus(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    per = N_DOCS // 2
    for c in range(2):
        part = pdf.iloc[c * per:(c + 1) * per]
        state = _load_state(out)
        nd = write_segment(
            spark, spark.createDataFrame(part), out, f"s{c}",
            state["next_doc"], partitions=2,
        )
        state["next_doc"] += nd
        state["segments"].append({"seg": f"s{c}", "num_docs": nd})
        _atomic_json(_state_path(out), state)
        refresh(spark, out, partitions=2)

    report = check_index(spark, out, full=True)
    assert report["errors"] == []
    assert report["doc_count"] == N_DOCS

    # corruption is rejected: lie about doc_count in the manifest
    mpath = os.path.join(out, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["doc_count"] += 7
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(CheckIndexError, match="doc_count"):
        check_index(spark, out)

    # a stale gen dir is a NOTE, not an error (crash mid-cleanup is legal)
    manifest["doc_count"] -= 7
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    stale = os.path.join(out, "postings", "gen=g999999")
    os.makedirs(stale, exist_ok=True)
    report = check_index(spark, out)
    assert any("stale" in n for n in report["notes"])
