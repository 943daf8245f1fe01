"""Exact-substring (repeated k-token span) deduplication.

The ExactSubstr protocol of Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better" (arXiv:2107.06499): any token window
of length >= k that appears more than once in the corpus is a
duplicated span; training keeps ONE occurrence and drops the rest. The
paper builds a corpus-wide suffix array; a suffix array is a single
global sorted order — exactly what a distributed engine should NOT
build. The Spark shape below gets the same k-token-resolution answer
from hashes:

  1. map-only: every doc emits its positioned k-token windows as
     (doc_id, pos, xxhash64(window)) — JVM-side tokenize + slice +
     hash, no Python in the loop;
  2. ONE shuffle: groupBy(window hash) with map-side partial counts →
     the duplicated-hash set (count >= min_count);
  3. join back (hash-partitioned; the duplicated set is corpus-sized
     in the worst case, so no broadcast assumption) → each doc's
     duplicated window positions;
  4. per-doc interval union (gaps-and-islands over a docID-partitioned
     window function) → covered-token counts, or the surviving text.

Differences from the suffix-array protocol, stated: spans are detected
at k-token resolution (a duplicated run of length L is covered by its
L-k+1 duplicated windows, so the UNION recovers the full span, but
sub-k duplicates are invisible — same property the paper's k=50-token
threshold enforces); "same" means same 64-bit hash (collisions at
1e-19/pair are accepted, as in the MinHash/decontam paths).

No reference analog (Lucene indexes; it does not dedup training
corpora); part of the training-data pipeline surface like
pipeline/dedup.py, which supplies the tokenizer/shingle conventions
shared with the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_spark.pipeline.dedup import tokens_col


def window_hashes(
    docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dl, pos, wh): every positioned k-token window's xxhash64 —
    one map-only pass, Catalyst end-to-end. pos is 0-based token
    position; dl the doc's token count. Docs shorter than k emit no
    windows (sequence() would descend — the n<k guard from
    pipeline.dedup applies here too)."""
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("t")
    )
    n = F.size("t")
    wins = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at("t", (i + j).cast("int")) for j in range(k)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select("id", n.alias("dl"), F.posexplode_outer(wins))
        .where(F.col("col").isNotNull())
        .select("id", "dl", "pos", F.xxhash64("col").alias("wh"))
    )


def duplicated_windows(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, dl, pos, wh, rank1): every window whose hash occurs at least
    min_count times corpus-wide; rank1 marks the canonical FIRST
    occurrence (min (id, pos) per hash — the copy ExactSubstr keeps)."""
    wh = window_hashes(docs, k, id_col, text_col)
    dup = (
        wh.groupBy("wh")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("wh")
    )
    hits = wh.join(dup, "wh")
    w = Window.partitionBy("wh").orderBy(F.asc("id"), F.asc("pos"))
    return hits.withColumn(
        "rank1", F.row_number().over(w) == 1
    )


def _covered(df: DataFrame, k: int) -> DataFrame:
    """Per-id union length of [pos, pos+k) intervals + window count:
    (id, n_windows, covered). Gaps-and-islands with a running max end —
    one window-function pass, partitioned by id (SQL-portable: the
    DuckDB oracle runs the identical shape)."""
    w = Window.partitionBy("id").orderBy("pos")
    run_prev_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    df = df.withColumn(
        "new_island",
        (F.col("pos") >= F.coalesce(run_prev_end, F.lit(-(1 << 40)))).cast(
            "int"
        ),
    ).withColumn(
        "island", F.sum("new_island").over(w)
    )
    islands = df.groupBy("id", "island").agg(
        F.count("*").alias("nw"),
        (F.max(F.col("pos") + F.lit(k)) - F.min("pos")).alias("len"),
    )
    return islands.groupBy("id").agg(
        F.sum("nw").cast("long").alias("n_windows"),
        F.sum("len").cast("long").alias("covered"),
    )


def duplicate_span_stats(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-doc duplicated-span report: (id_col, dl, n_dup_windows,
    dup_tokens, dup_frac) for every doc containing at least one
    corpus-duplicated k-token window. dup_tokens is the size of the
    UNION of the doc's duplicated windows (merged maximal spans);
    dup_frac = dup_tokens / dl."""
    hits = duplicated_windows(docs, k, min_count, id_col, text_col)
    dls = hits.groupBy("id").agg(F.first("dl").alias("dl"))
    cov = _covered(hits.select("id", "pos"), k)
    return cov.join(dls, "id").select(
        F.col("id").alias(id_col),
        "dl",
        F.col("n_windows").alias("n_dup_windows"),
        F.col("covered").alias("dup_tokens"),
        F.round(F.col("covered") / F.col("dl"), round_to).alias("dup_frac"),
    )


def drop_repeated_spans(
    docs: DataFrame,
    k: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr removal: keep the canonical FIRST occurrence of every
    duplicated window, drop the tokens covered by the others. Returns
    (id_col, kept_text, n_removed_tokens) for EVERY doc — kept_text is
    the normalized-token join of the surviving tokens (the tokenizer is
    lossy about punctuation/case by design, matching the pipeline's
    other text transforms). Removal is span-at-k resolution: a
    duplicated run of length L >= k loses its full L tokens in the
    non-canonical copies (the union of its L-k+1 windows)."""
    hits = duplicated_windows(docs, k, min_count, id_col, text_col)
    drop = hits.where(~F.col("rank1")).select("id", "pos")
    # expand each dropped window to its covered positions and distinct
    drop_pos = drop.select(
        "id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("tpos"),
    ).distinct()
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("t")
    ).select(
        "id", F.posexplode_outer("t").alias("tpos", "tok")
    )
    kept = toks.join(drop_pos, ["id", "tpos"], "left_anti")
    removed = drop_pos.groupBy("id").agg(
        F.count("*").cast("long").alias("n_removed_tokens")
    )
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            " ", F.array_sort(F.collect_list(F.struct("tpos", "tok"))).tok
        ).alias("kept_text")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(rebuilt, "id", "left")
        .join(removed, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
            F.coalesce(F.col("n_removed_tokens"), F.lit(0)).alias(
                "n_removed_tokens"
            ),
        )
    )
