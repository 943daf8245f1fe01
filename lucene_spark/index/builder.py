"""Distributed inverted-index builder — the Spark-first reimagining of
Lucene's IndexWriter flush/merge pipeline (SURVEY.md §2.A, §3.1).

Dataflow (two shuffles total, mirroring DWPT-flush + merge):

  docs(repo,path,commit,lang,content)
    -> repartitionByRange(repo,path,commit) + sortWithinPartitions   [shuffle 1: doc -> segment]
    -> mapInPandas invert+flush: docID assignment (global sort rank),
       tokenize (StandardAnalyzer chain), per-doc tf/positions,
       dl/norm/sha256, then a MAP-SIDE SEGMENT FLUSH: per-partition
       posting runs (term -> varbyte docID-gaps/tfs/norms/position-gaps)
       emitted every `flush_docs` documents
                                               (DWPT buffer + flush analog:
                                                index/IndexingChain.java:552,1174-1290,
                                                index/DocumentsWriterPerThread.java:406-456,
                                                16MB RAM trigger IndexWriterConfig.java:83)
    -> docmap table (meta rows)                (segment docIDs + .nvd norms)
    -> groupBy(term).agg over run headers -> terms table (df/cf + impact bounds)
    -> groupBy(term, salt).applyInPandas merge runs -> 256-doc blocks
                                               [shuffle 2: segment -> term]
       (SegmentMerger's k-way merge, index/SegmentMerger.java:114-151 —
        runs hold disjoint, ascending docID ranges, so the merge is pure
        concatenation in first_doc order: no re-sort, no docBase remap;
        block encode = Lucene104PostingsWriter.java:237-359)
    -> postings table, range-partitioned+sorted by term (parquet min/max
       stats replace the block-tree term dictionary)
    -> stats table (IndexSearcher.collectionStatistics analog,
       search/IndexSearcher.java:1134-1148)
    -> manifest.json written atomically last   (segments_N two-phase commit,
       index/IndexWriter.java:3601)

Scale design notes (100 TB / 1000 executors):
  - docID = global rank of (repo,path,commit): deterministic under any
    partitioning/parallelism -> rank-identity & resume reproduce at N vs 4N.
  - Map-side combine: the shuffle to term-space moves ONE compact binary
    row per (partition-flush, term), not one row per posting — ~10-100x
    less shuffle volume than exploding (docID, term, tf, positions) rows,
    and the varbyte payload is already the final wire format.
  - Hot-term skew (license-header tokens): terms with df above
    `hot_df_threshold` are salted by run doc-range (`salt = first_doc //
    hot_salt_span`); salt spans are disjoint doc ranges so the global
    posting list is the concatenation of per-salt block runs — no
    re-merge needed (SURVEY.md §4.2 "Hot-term skew").
  - Per-partition memory is bounded by `flush_docs` (RAM-buffer analog):
    a partition emits multiple independent runs, merged for free later.
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
    decode,
    delta_decode,
    delta_encode,
    encode,
    segmented_delta_decode,
    segmented_delta_encode,
)

BLOCK_SIZE = 256  # Lucene104PostingsFormat ForUtil.BLOCK_SIZE (ForUtil.java:34)
FLUSH_DOCS = 1 << 16  # per-partition run size bound (16MB-RAM-buffer analog)

# Mixed output of the invert pass: meta rows (term NULL, one per doc) and
# run rows (one per (flush, term), compact varbyte payloads).
INVERT_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("first_doc", LongType()),
        StructField("ndocs", IntegerType()),
        StructField("cf", LongType()),
        StructField("max_tf", IntegerType()),
        StructField("min_norm", IntegerType()),
        StructField("docs_vb", BinaryType()),
        StructField("tfs_vb", BinaryType()),
        StructField("norms_b", BinaryType()),
        StructField("pos_vb", BinaryType()),
        StructField("docID", LongType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content_sha256", BinaryType()),
        StructField("dl", IntegerType()),
        StructField("norm", IntegerType()),
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

_RUN_COLS = [
    "term", "first_doc", "ndocs", "cf", "max_tf", "min_norm",
    "docs_vb", "tfs_vb", "norms_b", "pos_vb",
]
_META_COLS = [
    "docID", "repo", "path", "commit", "lang", "content_sha256", "dl", "norm",
]


def _invert_partition(
    offsets: dict[int, int], store_positions: bool, flush_docs: int = FLUSH_DOCS
):
    """mapInPandas kernel: one generator instance == one range partition;
    assigns dense docIDs from the partition's global offset, inverts each
    document, and flushes buffered per-term posting runs every
    ``flush_docs`` docs (DWPT flush analog)."""

    def _flush(buf: dict) -> pd.DataFrame:
        terms, firsts, ndocs, cfs, mtfs, mnorms = [], [], [], [], [], []
        dvbs, tvbs, nbs, pvbs = [], [], [], []
        for term in buf:
            docs, tfs, norms, pos_flat = buf[term]
            d = np.asarray(docs, dtype=np.int64)
            t = np.asarray(tfs, dtype=np.int64)
            nb = np.asarray(norms, dtype=np.uint8)
            terms.append(term)
            firsts.append(int(d[0]))
            ndocs.append(d.size)
            cfs.append(int(t.sum()))
            mtfs.append(int(t.max()))
            mnorms.append(int(nb.min()))
            dvbs.append(encode(delta_encode(d)))
            tvbs.append(encode(t))
            nbs.append(nb.tobytes())
            if pos_flat is not None:
                p = np.asarray(pos_flat, dtype=np.int64)
                pvbs.append(encode(segmented_delta_encode(p, t)))
            else:
                pvbs.append(b"")
        n = len(terms)
        frame = pd.DataFrame(
            {
                "term": terms,
                "first_doc": pd.array(firsts, dtype="int64"),
                "ndocs": pd.array(ndocs, dtype="int32"),
                "cf": pd.array(cfs, dtype="int64"),
                "max_tf": pd.array(mtfs, dtype="int32"),
                "min_norm": pd.array(mnorms, dtype="int32"),
                "docs_vb": dvbs,
                "tfs_vb": tvbs,
                "norms_b": nbs,
                "pos_vb": pvbs,
            }
        )
        for c in _META_COLS:
            frame[c] = None
        return frame[_RUN_COLS + _META_COLS]

    def fn(batches):
        next_id = None
        buf: dict[str, list] = {}
        buffered = 0
        for pdf in batches:
            if next_id is None:
                pid = int(pdf["pid"].iloc[0])
                next_id = offsets[pid]
            n = len(pdf)
            ids = range(next_id, next_id + n)
            next_id += n

            meta = {c: [] for c in _META_COLS}
            for did, repo, path, commit, lang, text in zip(
                ids, pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"],
                pdf["content"],
            ):
                toks = analyze(text)
                dl = len(toks)
                norm = int(int_to_byte4(np.int64(dl)))
                meta["docID"].append(did)
                meta["repo"].append(repo)
                meta["path"].append(path)
                meta["commit"].append(commit)
                meta["lang"].append(lang)
                meta["content_sha256"].append(
                    hashlib.sha256(text.encode("utf-8")).digest()
                )
                meta["dl"].append(dl)
                meta["norm"].append(norm)
                # per-term tf + positions (FieldInvertState accounting),
                # accumulated straight into the partition run buffer
                tfpos: dict[str, list[int]] = {}
                for pos, t in enumerate(toks):
                    lst = tfpos.get(t)
                    if lst is None:
                        tfpos[t] = [pos]
                    else:
                        lst.append(pos)
                for t, plist in tfpos.items():
                    ent = buf.get(t)
                    if ent is None:
                        ent = buf[t] = (
                            [], [], [], [] if store_positions else None
                        )
                    ent[0].append(did)
                    ent[1].append(len(plist))
                    ent[2].append(norm)
                    if store_positions:
                        ent[3].extend(plist)
            meta_pdf = pd.DataFrame(meta)
            meta_pdf["docID"] = meta_pdf["docID"].astype("int64")
            meta_pdf["dl"] = meta_pdf["dl"].astype("int32")
            meta_pdf["norm"] = meta_pdf["norm"].astype("int32")
            for c in _RUN_COLS:
                meta_pdf[c] = None
            yield meta_pdf[_RUN_COLS + _META_COLS]

            buffered += n
            if buffered >= flush_docs:
                yield _flush(buf)
                buf = {}
                buffered = 0
        if buf:
            yield _flush(buf)

    return fn


def _merge_runs_to_blocks(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel for one (term, salt) group: concatenate the
    group's posting runs in first_doc order (runs hold disjoint ascending
    docID ranges -> already globally sorted) and emit <=256-doc varbyte
    blocks with impact metadata."""
    term, salt = key
    pdf = pdf.sort_values("first_doc")
    doc_parts, tf_parts, norm_parts, pos_parts = [], [], [], []
    has_pos = False
    for r in pdf.itertuples():
        d = delta_decode(decode(bytes(r.docs_vb)))
        t = decode(bytes(r.tfs_vb))
        doc_parts.append(d)
        tf_parts.append(t)
        norm_parts.append(np.frombuffer(bytes(r.norms_b), dtype=np.uint8))
        if r.pos_vb:
            has_pos = True
            pos_parts.append(segmented_delta_decode(decode(bytes(r.pos_vb)), t))
    doc_ids = np.concatenate(doc_parts)
    tfs = np.concatenate(tf_parts)
    norms = np.concatenate(norm_parts)
    if has_pos:
        pos_flat = np.concatenate(pos_parts)
        pos_ends = np.cumsum(tfs)
    rows = []
    for b, start in enumerate(range(0, len(doc_ids), BLOCK_SIZE)):
        end = min(start + BLOCK_SIZE, len(doc_ids))
        d = doc_ids[start:end]
        t = tfs[start:end]
        nb = norms[start:end]
        if has_pos:
            p0 = pos_ends[start - 1] if start else 0
            flat = pos_flat[p0 : pos_ends[end - 1]]
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
            "term", "salt", "block_seq", "ndocs", "min_doc", "max_doc",
            "max_tf", "min_norm", "docs_vb", "tfs_vb", "norms_b", "pos_vb",
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
    flush_docs: int = FLUSH_DOCS,
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

    # --- invert + map-side segment flush ---------------------------------
    inverted = sorted_docs.mapInPandas(
        _invert_partition(offsets, store_positions, flush_docs),
        schema=INVERT_SCHEMA,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    docmap = inverted.filter(F.col("term").isNull()).select(*_META_COLS)
    docmap.write.mode("overwrite").parquet(os.path.join(out_dir, "docmap"))

    runs = inverted.filter(F.col("term").isNotNull()).select(*_RUN_COLS)

    # --- term dictionary + stats (cheap agg over run headers) ------------
    terms_df = (
        runs.groupBy("term")
        .agg(
            F.sum("ndocs").cast("long").alias("df"),
            F.sum("cf").alias("cf"),
            F.max("max_tf").alias("max_tf"),
            F.min("min_norm").alias("min_norm"),
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

    # --- shuffle 2: merge runs into postings blocks (salted hot terms) ---
    if hot_terms:
        salt_col = F.when(
            F.col("term").isin(hot_terms),
            (F.col("first_doc") / F.lit(hot_salt_span)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    else:
        salt_col = F.lit(0).cast("long")

    blocks = (
        runs.withColumn("salt", salt_col)
        .groupBy("term", "salt")
        .applyInPandas(_merge_runs_to_blocks, schema=BLOCK_SCHEMA)
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
        "version": 2,
        "doc_count": stats["doc_count"],
        "sum_total_term_freq": stats["sum_total_term_freq"],
        "sum_doc_freq": stats["sum_doc_freq"],
        "distinct_terms": stats["distinct_terms"],
        "hot_terms": hot_terms,
        "hot_df_threshold": hot_df_threshold,
        "hot_salt_span": hot_salt_span,
        "store_positions": store_positions,
        "block_size": BLOCK_SIZE,
        "flush_docs": flush_docs,
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
