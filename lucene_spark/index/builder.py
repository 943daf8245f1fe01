"""Distributed inverted-index builder — the Spark-first reimagining of
Lucene's IndexWriter flush/merge pipeline (SURVEY.md §2.A, §3.1).

Dataflow (two shuffles total, mirroring DWPT-flush + merge):

  docs(repo,path,commit,lang,content)
    -> repartitionByRange(repo,path,commit) + sortWithinPartitions   [shuffle 1: doc -> segment]
    -> mapInPandas invert: docID assignment (global sort rank),
       tokenize (StandardAnalyzer chain), per-doc tf/positions,
       dl/norm/sha256                          (IndexingChain.processDocument analog,
                                                index/IndexingChain.java:552,1174-1290)
    -> docmap table (meta rows)                (segment docIDs + .nvd norms)
    -> groupBy(term).agg(...)  -> terms table  (term dict: df/cf + impact bounds)
    -> groupBy(term, salt).applyInPandas encode 256-doc varbyte blocks
                                               [shuffle 2: doc-partition -> term]
       (FreqProxTermsWriter sort + Lucene104PostingsWriter block encode,
        codecs/lucene104/Lucene104PostingsWriter.java:237-359; the Spark
        sort-merge shuffle IS SegmentMerger's k-way merge,
        index/SegmentMerger.java:114-151, with globally-unique docIDs so
        no docBase remapping)
    -> postings table, range-partitioned+sorted by term (parquet min/max
       stats replace the block-tree term dictionary)
    -> stats table (IndexSearcher.collectionStatistics analog,
       search/IndexSearcher.java:1134-1148)
    -> manifest.json written atomically last   (segments_N two-phase commit,
       index/IndexWriter.java:3601)

Scale design notes (100 TB / 1000 executors):
  - docID = global rank of (repo,path,commit): deterministic under any
    partitioning/parallelism -> rank-identity & resume reproduce at N vs 4N.
  - Hot-term skew (license-header tokens): terms with df above
    `hot_df_threshold` are salted by docID range (`salt = docID //
    hot_salt_span`); salt spans are disjoint doc ranges so the global
    posting list is the concatenation of per-salt block runs — no
    re-merge needed (SURVEY.md §4.2 "Hot-term skew").
  - Norm bytes are embedded per posting (1 B/doc, like .nvd inlined) so
    query-time scoring needs NO join against docmap.
  - All heavy lifting is numpy inside Arrow-batched pandas UDFs; block
    rows carry (max_tf, min_norm) impact bounds for block-max pruning.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_spark.analysis import analyze
from lucene_spark.util.smallfloat import int_to_byte4
from lucene_spark.util.varbyte import (
    delta_encode,
    encode,
    segmented_delta_encode,
)

BLOCK_SIZE = 256  # Lucene104PostingsFormat ForUtil.BLOCK_SIZE (ForUtil.java:34)

INVERT_SCHEMA = StructType(
    [
        StructField("docID", LongType()),
        StructField("term", StringType()),
        StructField("tf", IntegerType()),
        StructField("positions", ArrayType(IntegerType())),
        StructField("norm", IntegerType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content_sha256", BinaryType()),
        StructField("dl", IntegerType()),
    ]
)

BLOCK_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", LongType()),
        StructField("block_seq", LongType()),
        StructField("ndocs", IntegerType()),
        StructField("min_doc", LongType()),
        StructField("max_doc", LongType()),
        StructField("max_tf", IntegerType()),
        StructField("min_norm", IntegerType()),
        StructField("docs_vb", BinaryType()),
        StructField("tfs_vb", BinaryType()),
        StructField("norms_b", BinaryType()),
        StructField("pos_vb", BinaryType()),
    ]
)


def _invert_partition(offsets: dict[int, int], store_positions: bool):
    """mapInPandas kernel: one generator instance == one range partition;
    assigns dense docIDs from the partition's global offset and inverts
    each document (tokenize -> tf/positions/norm/sha)."""

    def fn(batches):
        next_id = None
        for pdf in batches:
            if next_id is None:
                pid = int(pdf["pid"].iloc[0])
                next_id = offsets[pid]
            n = len(pdf)
            ids = np.arange(next_id, next_id + n, dtype=np.int64)
            next_id += n

            out_doc: list[int] = []
            out_term: list[str | None] = []
            out_tf: list[int] = []
            out_pos: list[list[int] | None] = []
            out_norm: list[int] = []
            meta_rows = []
            contents = pdf["content"].tolist()
            for row_i, text in enumerate(contents):
                did = int(ids[row_i])
                toks = analyze(text)
                dl = len(toks)
                norm = int(int_to_byte4(np.int64(dl)))
                sha = hashlib.sha256(text.encode("utf-8")).digest()
                meta_rows.append(
                    (
                        did,
                        None,
                        0,
                        None,
                        norm,
                        pdf["repo"].iloc[row_i],
                        pdf["path"].iloc[row_i],
                        pdf["commit"].iloc[row_i],
                        pdf["lang"].iloc[row_i],
                        sha,
                        dl,
                    )
                )
                # per-term tf + positions (FieldInvertState accounting)
                tfpos: dict[str, list[int]] = {}
                for pos, t in enumerate(toks):
                    lst = tfpos.get(t)
                    if lst is None:
                        tfpos[t] = [pos]
                    else:
                        lst.append(pos)
                for t, plist in tfpos.items():
                    out_doc.append(did)
                    out_term.append(t)
                    out_tf.append(len(plist))
                    out_pos.append(plist if store_positions else None)
                    out_norm.append(norm)
            term_pdf = pd.DataFrame(
                {
                    "docID": pd.array(out_doc, dtype="int64"),
                    "term": out_term,
                    "tf": pd.array(out_tf, dtype="int32"),
                    "positions": pd.Series(out_pos, dtype="object"),
                    "norm": pd.array(out_norm, dtype="int32"),
                    "repo": None,
                    "path": None,
                    "commit": None,
                    "lang": None,
                    "content_sha256": None,
                    "dl": pd.array([0] * len(out_doc), dtype="int32"),
                }
            )
            meta_pdf = pd.DataFrame(
                meta_rows,
                columns=[
                    "docID",
                    "term",
                    "tf",
                    "positions",
                    "norm",
                    "repo",
                    "path",
                    "commit",
                    "lang",
                    "content_sha256",
                    "dl",
                ],
            )
            yield pd.concat([meta_pdf, term_pdf], ignore_index=True)

    return fn


def _encode_blocks(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel for one (term, salt) group: sort by docID and
    emit <=256-doc varbyte blocks with impact metadata."""
    term, salt = key
    pdf = pdf.sort_values("docID")
    doc_ids = pdf["docID"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    norms = pdf["norm"].to_numpy(dtype=np.int64)
    positions = pdf["positions"].to_numpy()
    has_pos = len(positions) > 0 and positions[0] is not None

    rows = []
    for b, start in enumerate(range(0, len(doc_ids), BLOCK_SIZE)):
        sl = slice(start, start + BLOCK_SIZE)
        d = doc_ids[sl]
        t = tfs[sl]
        nb = norms[sl]
        if has_pos:
            plists = [np.asarray(p, dtype=np.int64) for p in positions[sl]]
            flat = np.concatenate(plists) if plists else np.empty(0, dtype=np.int64)
            pos_vb = encode(segmented_delta_encode(flat, t))
        else:
            pos_vb = b""
        rows.append(
            (
                term,
                int(salt),
                b,
                int(d.size),
                int(d[0]),
                int(d[-1]),
                int(t.max()),
                int(nb.min()),
                encode(delta_encode(d)),
                encode(t),
                nb.astype(np.uint8).tobytes(),
                pos_vb,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "term",
            "salt",
            "block_seq",
            "ndocs",
            "min_doc",
            "max_doc",
            "max_tf",
            "min_norm",
            "docs_vb",
            "tfs_vb",
            "norms_b",
            "pos_vb",
        ],
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    partitions: int | None = None,
    hot_df_threshold: int = 1 << 16,
    hot_salt_span: int = 1 << 20,
    store_positions: bool = True,
) -> dict:
    """Build the full index at ``out_dir`` and return build metrics.

    Output layout: {out_dir}/{docmap,terms,postings,stats,lineage}/ parquet
    + manifest.json (written last = commit point)."""
    t0 = time.time()
    n_part = partitions or spark.sparkContext.defaultParallelism

    # --- shuffle 1: deterministic doc order ------------------------------
    sorted_docs = (
        docs.repartitionByRange(n_part, "repo", "path", "commit")
        .sortWithinPartitions("repo", "path", "commit")
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # partition sizes -> global docID offsets (zipWithIndex two-pass,
    # but counting only (pid) — column-pruned scan)
    sizes = dict(
        (r["pid"], r["cnt"])
        for r in sorted_docs.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    doc_count = acc

    # --- invert ----------------------------------------------------------
    inverted = sorted_docs.mapInPandas(
        _invert_partition(offsets, store_positions), schema=INVERT_SCHEMA
    ).persist(StorageLevel.MEMORY_AND_DISK)

    docmap = inverted.filter(F.col("term").isNull()).select(
        "docID", "repo", "path", "commit", "lang", "content_sha256", "dl", "norm"
    )
    docmap.write.mode("overwrite").parquet(os.path.join(out_dir, "docmap"))

    term_rows = inverted.filter(F.col("term").isNotNull()).select(
        "docID", "term", "tf", "positions", "norm"
    )

    # --- term dictionary + stats ----------------------------------------
    terms_df = (
        term_rows.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
            F.max("tf").alias("max_tf"),
            F.min("norm").alias("min_norm"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    terms_df.repartitionByRange(max(1, n_part // 4), "term").sortWithinPartitions(
        "term"
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "terms"))

    hot_terms = [
        r["term"]
        for r in terms_df.filter(F.col("df") > hot_df_threshold)
        .select("term")
        .collect()
    ]

    # --- shuffle 2: postings blocks (salted for hot terms) ---------------
    if hot_terms:
        salt_col = F.when(
            F.col("term").isin(hot_terms),
            (F.col("docID") / F.lit(hot_salt_span)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    else:
        salt_col = F.lit(0).cast("long")

    blocks = (
        term_rows.withColumn("salt", salt_col)
        .groupBy("term", "salt")
        .applyInPandas(_encode_blocks, schema=BLOCK_SCHEMA)
    )
    (
        blocks.repartitionByRange(n_part, "term")
        .sortWithinPartitions("term", "salt", "block_seq")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "postings"))
    )

    # --- collection stats (CollectionStatistics analog) ------------------
    agg = terms_df.agg(
        F.sum("cf").alias("sttf"),
        F.sum("df").alias("sdf"),
        F.count("*").alias("nterms"),
    ).collect()[0]
    stats = {
        "doc_count": int(doc_count),
        "sum_total_term_freq": int(agg["sttf"] or 0),
        "sum_doc_freq": int(agg["sdf"] or 0),
        "distinct_terms": int(agg["nterms"] or 0),
    }
    spark.createDataFrame([stats]).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "stats")
    )

    # --- lineage (per-partition segment metrics, resume unit) ------------
    lineage = [
        {
            "pid": int(pid),
            "doc_id_start": int(offsets[pid]),
            "num_docs": int(sizes[pid]),
            "status": "complete",
        }
        for pid in sorted(sizes)
    ]
    spark.createDataFrame(lineage).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineage")
    )

    inverted.unpersist()
    terms_df.unpersist()
    sorted_docs.unpersist()

    elapsed = time.time() - t0
    manifest = {
        "version": 1,
        "doc_count": stats["doc_count"],
        "sum_total_term_freq": stats["sum_total_term_freq"],
        "sum_doc_freq": stats["sum_doc_freq"],
        "distinct_terms": stats["distinct_terms"],
        "hot_terms": hot_terms,
        "hot_df_threshold": hot_df_threshold,
        "hot_salt_span": hot_salt_span,
        "store_positions": store_positions,
        "block_size": BLOCK_SIZE,
        "partitions": n_part,
        "build_wall_sec": elapsed,
        "docs_per_sec": stats["doc_count"] / elapsed if elapsed > 0 else 0.0,
    }
    # two-phase commit: write tmp then atomic rename (segments_N analog)
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest
