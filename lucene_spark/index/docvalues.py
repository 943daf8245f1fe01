"""Numeric DocValues with generation-based in-place updates.

IndexWriter.updateNumericDocValue (reference index/IndexWriter.java:1894)
changes a per-document numeric field WITHOUT re-indexing: Lucene writes
a new docvalues-generation file and flips the field's dvGen in the
segment metadata; postings, norms and stored fields are untouched. The
Spark-first analog:

    <index_dir>/docvalues/<field>/gen=N/   parquet (docID, value)
    manifest.json  dv_gens: {field: N}     (the ONLY live-gen pointer)

An update overlays the new (docID, value) pairs onto the live
generation (update wins, full-outer coalesce), writes generation N+1
COMPLETELY, then commits with one atomic manifest rewrite. Crash
before the commit leaves the old generation live and the new dir as
stale extra bytes — the same "manifest is the live set" contract the
tiered postings gens follow (stale dirs are ignored because readers
resolve the gen through the manifest, never by listing).

At scale the overlay is one shuffle join keyed by docID over a numeric
column — no tokenization, no postings rewrite; a metadata repricing of
10^9 docs moves ~16 GB, not the corpus.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_spark.index.resumable import _atomic_json


def _manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def _field_dir(index_dir: str, field: str, gen: int) -> str:
    return os.path.join(index_dir, "docvalues", field, f"gen={gen}")


def live_gen(index_dir: str, field: str) -> int | None:
    return _manifest(index_dir).get("dv_gens", {}).get(field)


def read_docvalues(
    spark: SparkSession, index_dir: str, field: str
) -> DataFrame:
    """(docID, value) of the field's LIVE generation. Re-reads the
    manifest per call (DirectoryReader.openIfChanged analog) so a
    searcher constructed before an update still sees the new values."""
    gen = live_gen(index_dir, field)
    if gen is None:
        raise KeyError(f"no docvalues for field {field!r}")
    return spark.read.parquet(_field_dir(index_dir, field, gen)).select(
        "docID", "value"
    )


def set_docvalues(
    spark: SparkSession,
    index_dir: str,
    field: str,
    values: DataFrame,
    partitions: int | None = None,
    sort_by_value: bool = True,
) -> int:
    """Create or update the numeric docvalues column `field` from a
    (docID, value) DataFrame. Rows present in `values` win; every other
    doc keeps its previous value (absent docs in generation 0 simply
    have no value, like a missing DocValues entry). Returns the new
    live generation after the atomic manifest commit.

    ``sort_by_value`` (default) writes the generation VALUE-ORDERED —
    the index-sort idea of the reference's
    sandbox/search/IndexSortSortedNumericDocValuesRangeQuery.java:60:
    each parquet file/rowgroup then covers a disjoint value range, so a
    range or search-after cursor predicate prunes the scan via min/max
    stats instead of reading the whole column (the BKD/index-sort role;
    `sort_by_docvalue(after=...)` pushes exactly that predicate). Costs
    one range exchange at write time; reads are order-insensitive."""
    values = values.select(
        F.col("docID").cast("long").alias("docID"),
        F.col("value").cast("long").alias("value"),
    )
    old_gen = live_gen(index_dir, field)
    if old_gen is None:
        new = values
        new_gen = 0
    else:
        prev = read_docvalues(spark, index_dir, field)
        upd = values.withColumnRenamed("value", "v_new")
        new = (
            prev.join(upd, "docID", "full_outer")
            .select("docID", F.coalesce("v_new", "value").alias("value"))
        )
        new_gen = old_gen + 1
    if sort_by_value:
        # global range sort: disjoint per-file value ranges for pruning
        new = (
            new.repartitionByRange(partitions, "value", "docID")
            if partitions
            else new.orderBy("value", "docID")
        )
        if partitions:
            new = new.sortWithinPartitions("value", "docID")
    elif partitions:
        new = new.repartition(partitions, "docID")
    # phase 1: write the full new generation (crash here = stale dir)
    new.write.mode("overwrite").parquet(_field_dir(index_dir, field, new_gen))
    # phase 2: single atomic commit point
    manifest = _manifest(index_dir)
    manifest.setdefault("dv_gens", {})[field] = new_gen
    _atomic_json(os.path.join(index_dir, "manifest.json"), manifest)
    # best-effort cleanup; a crash mid-rmtree only leaves dead bytes
    if old_gen is not None:
        import shutil

        shutil.rmtree(
            _field_dir(index_dir, field, old_gen), ignore_errors=True
        )
    return new_gen


def update_numeric_docvalue(
    spark: SparkSession,
    searcher,
    field: str,
    term: str,
    value: int,
) -> int:
    """updateNumericDocValue(Term, field, value) analog: every live doc
    containing `term` gets `value`; everything else keeps its current
    value. Tombstoned docs are excluded by postings_tf's own filters."""
    hits = (
        searcher.postings_tf([term])
        .select("docID")
        .distinct()
        .withColumn("value", F.lit(int(value)))
    )
    return set_docvalues(spark, searcher.index_dir, field, hits)
