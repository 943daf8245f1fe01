"""Incremental (near-real-time) indexing via Structured Streaming.

Lucene's NRT model (SURVEY.md §2.E): new documents accumulate in writer
buffers, flushes create immutable segments, `SearcherManager.maybeRefresh`
makes flushed segments visible without rebuilding anything
(search/SearcherManager.java:200, index/StandardDirectoryReader.java).

Structured Streaming translation:
  - source -> foreachBatch: every micro-batch becomes one immutable
    segment — docmap/seg=<n> + runs/seg=<n> parquet (the same compact
    run format the batch builder flushes), docIDs assigned sequentially
    from a persisted high-water mark (arrival order, exactly Lucene's
    docID semantics)
  - state.json is committed atomically AFTER the segment's files are
    durable -> crash mid-batch leaves a re-processable batch
    (checkpointed foreachBatch + idempotent overwrite per epoch =
    effectively exactly-once, IndexWriter.commit two-phase analog)
  - refresh(): merge all segment runs into queryable postings/terms/
    stats tables + manifest (ControlledRealTimeReopenThread analog —
    called on whatever cadence visibility demands; segments written
    since the last refresh are invisible until then)

No watermarks/event-time: the reference has none (append-only NRT), so
this is deliberately processing-time micro-batching.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_spark.index.builder import (
    FLUSH_DOCS,
    INVERT_SCHEMA,
    _flatten_key,
    _invert_partition,
    _META_COLS,
    _quantile_bounds,
    _repartition_exact,
    _RUN_COLS,
    _with_range_id,
)
from lucene_spark.index.resumable import _atomic_json, merge_segments


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, "state.json")


def _load_state(out_dir: str) -> dict:
    p = _state_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"next_doc": 0, "segments": [], "epochs": {}}


def write_segment(
    spark: SparkSession,
    batch_df: DataFrame,
    out_dir: str,
    seg_name: str,
    doc_id_start: int,
    *,
    partitions: int | None = None,
    store_positions: bool = True,
    flush_docs: int = FLUSH_DOCS,
) -> int:
    """Invert one batch into an immutable segment (docmap + runs parquet).
    Returns the number of docs written. docIDs are
    [doc_id_start, doc_id_start + n) in (repo, path, commit) order within
    the batch — arrival order across batches, Lucene's NRT docID model."""
    n_part = partitions or spark.sparkContext.defaultParallelism
    n_batch = batch_df.count()
    if n_batch == 0:
        return 0
    # boundary sample is bounded (driver never holds the full batch key
    # set); boundaries affect only balance, not correctness
    frac = min(1.0, 8192.0 / n_batch)
    keys = [
        (r["repo"], r["path"], r["commit"])
        for r in batch_df.select("repo", "path", "commit")
        .sample(fraction=frac, seed=42)
        .collect()
    ]
    bounds = _quantile_bounds(sorted(_flatten_key(*k) for k in keys), n_part)
    sorted_docs = (
        _repartition_exact(
            spark, _with_range_id(batch_df, bounds, ["repo", "path", "commit"]), n_part
        )
        .sortWithinPartitions("repo", "path", "commit")
    )
    sizes = dict(
        (r["rpid"], r["cnt"])
        for r in sorted_docs.groupBy("rpid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = doc_id_start
    for rp in sorted(sizes):
        offsets[rp] = acc
        acc += sizes[rp]

    inverted = sorted_docs.mapInPandas(
        _invert_partition(offsets, store_positions, flush_docs),
        schema=INVERT_SCHEMA,
    )
    inv_path = os.path.join(out_dir, "inverted_stream", seg_name)
    inverted.write.mode("overwrite").parquet(inv_path)
    inv = spark.read.parquet(inv_path)
    inv.filter(F.col("term").isNull()).select(*_META_COLS).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "docmap", f"seg={seg_name}"))
    inv.filter(F.col("term").isNotNull()).select(*_RUN_COLS).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "runs", f"seg={seg_name}"))
    import shutil

    shutil.rmtree(inv_path, ignore_errors=True)
    return acc - doc_id_start


def start_indexing_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    *,
    checkpoint_dir: str | None = None,
    partitions: int | None = None,
    store_positions: bool = True,
    trigger_available_now: bool = True,
):
    """Attach the indexing sink to a streaming DataFrame of documents
    (repo, path, commit, lang, content). Returns the StreamingQuery."""
    os.makedirs(out_dir, exist_ok=True)
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    def process(batch_df: DataFrame, epoch_id: int):
        state = _load_state(out_dir)
        seg_name = f"b{epoch_id:06d}"
        if str(epoch_id) in state["epochs"]:
            return  # replayed epoch after restart: segment already durable
        n = write_segment(
            spark, batch_df, out_dir, seg_name, state["next_doc"],
            partitions=partitions, store_positions=store_positions,
        )
        if n == 0:
            return
        state["next_doc"] += n
        state["segments"].append({"seg": seg_name, "num_docs": n, "ts": time.time()})
        state["epochs"][str(epoch_id)] = seg_name
        _atomic_json(_state_path(out_dir), state)

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def refresh(
    spark: SparkSession,
    out_dir: str,
    *,
    partitions: int | None = None,
    hot_df_threshold: int = 1 << 16,
    hot_salt_span: int = 1 << 20,
    store_positions: bool = True,
) -> dict:
    """Make all durable segments visible: merge runs -> postings/terms/
    stats and publish manifest.json (SearcherManager.maybeRefresh)."""
    state = _load_state(out_dir)
    plan = {"doc_count": state["next_doc"]}
    stats = merge_segments(
        spark, out_dir, plan,
        partitions=partitions,
        hot_df_threshold=hot_df_threshold,
        hot_salt_span=hot_salt_span,
        store_positions=store_positions,
    )
    hot_terms = stats.pop("hot_terms")
    manifest = {
        "version": 2,
        **stats,
        "hot_terms": hot_terms,
        "hot_df_threshold": hot_df_threshold,
        "hot_salt_span": hot_salt_span,
        "store_positions": store_positions,
        "block_size": 256,
        "incremental": True,
        "num_segments": len(state["segments"]),
    }
    _atomic_json(os.path.join(out_dir, "manifest.json"), manifest)
    return manifest


def update_documents(
    spark: SparkSession,
    out_dir: str,
    docs_df: DataFrame,
    *,
    partitions: int | None = None,
    store_positions: bool = True,
    do_refresh: bool = True,
) -> dict:
    """updateDocument analog (index/IndexWriter.java:1488-1553): atomically
    delete any existing docs with the same (repo, path) keys and append
    the new versions as a fresh segment with NEW docIDs (exactly Lucene's
    delete-by-term + add). Statistics stay stale until a rebuild, like
    Lucene until merge; tombstones persist across refresh() because the
    segment runs still contain the old docs.

    Requires the incremental (runs/seg=*) layout produced by
    start_indexing_stream / write_segment.

    Crash-safety ordering: the tombstone docIDs are COMPUTED before the
    replacement segment exists (so new docs can never be tombstoned) but
    only PUBLISHED after the segment and state.json are durable — a
    crash in between leaves both versions visible (benign duplicate)
    rather than permanently deleting the documents without their
    replacements."""
    from lucene_spark.index.deletes import publish_tombstones, stage_tombstones

    keys = [
        (r["repo"], r["path"])
        for r in docs_df.select("repo", "path").distinct().collect()
    ]
    docmap = spark.read.parquet(os.path.join(out_dir, "docmap"))
    kdf = spark.createDataFrame(keys, "repo string, path string")
    hit = docmap.join(F.broadcast(kdf), ["repo", "path"]).select("docID")
    staging, n_deleted = stage_tombstones(spark, out_dir, hit)

    state = _load_state(out_dir)
    seg_name = f"u{len(state['segments']):06d}"
    n = write_segment(
        spark, docs_df, out_dir, seg_name, state["next_doc"],
        partitions=partitions, store_positions=store_positions,
    )
    state["next_doc"] += n
    state["segments"].append(
        {"seg": seg_name, "num_docs": n, "updated": True, "ts": time.time()}
    )
    _atomic_json(_state_path(out_dir), state)
    if staging is not None:
        publish_tombstones(out_dir, staging)
    out = {"deleted": int(n_deleted), "added": int(n)}
    if do_refresh:
        out["manifest"] = refresh(
            spark, out_dir, partitions=partitions, store_positions=store_positions
        )
    return out
