"""Text-analysis operators for training-data curation: language ID,
token statistics, and winnowing document fingerprints.

All tokenization is the oracle-reproducible ``lower + [^a-z0-9]+`` split
(or explicit regexes shared verbatim with the DuckDB SQL), so every
operator here duels an independent SQL implementation in the driver's
correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_spark.pipeline.dedup import tokens_col
from lucene_spark.pipeline.hashing import spark_md5_32

# Tiny per-language function-word profiles (public common-word lists).
# Deterministic n-gram/stopword-hit heuristic — not a trained model.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "that", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "pour", "que", "une"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "por", "una"],
}

# BPE-ish pre-tokenization: letter runs | digit runs | single other
# non-space char (the GPT-2-style pre-split shape, ASCII-simplified).
# Shared verbatim with the SQL oracle.
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n]"


def lang_id(spark: SparkSession, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, hits): argmax of profile-word hit counts, ties
    broken by language code ascending, 'und' when nothing matches."""
    toks = docs.select(id_col, F.explode(tokens_col()).alias("t"))
    aggs = [
        F.sum(F.when(F.col("t").isin(words), 1).otherwise(0)).alias(lang)
        for lang, words in LANG_PROFILES.items()
    ]
    scored = toks.groupBy(id_col).agg(*aggs)
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(lang) for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # reversed => earliest code wins ties
        pred = F.when((F.col(lang) == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return scored.select(
        id_col,
        pred.alias("lang_pred"),
        best.cast("long").alias("hits"),
    )


def token_stats(spark: SparkSession, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws, n_bpe, chars_per_bpe): whitespace token count vs
    BPE-ish pre-tokenizer count — the standard corpus-size accounting."""
    n_ws = F.size(F.array_remove(F.split(F.col("text"), "[ \\t\\n]+"), ""))
    bpe = F.expr(f"regexp_extract_all(text, '{BPE_REGEX}', 0)")
    n_bpe = F.size(bpe)
    return docs.select(
        id_col,
        n_ws.cast("long").alias("n_ws"),
        n_bpe.cast("long").alias("n_bpe"),
        F.round(F.length("text") / n_bpe, 4).alias("chars_per_bpe"),
    )


def winnow_fingerprints(
    spark: SparkSession, docs: DataFrame, k: int = 5, window: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fp) winnowing fingerprints: md5-32 hashes of word k-grams,
    minimum per sliding window of `window` grams, distinct per doc
    (Schleimer/Wilkerson/Aiken winnowing — the MOSS fingerprint). Pure
    DataFrame ops: transform + slice + min + explode."""
    toks = docs.select(F.col(id_col), tokens_col().alias("t"))
    n = F.size("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at("t", (i + j).cast("int")) for j in range(k)]
        ),
    )
    g = toks.select(id_col, F.posexplode(grams).alias("i", "gram"))
    g = g.select(id_col, "i", spark_md5_32(F.col("gram")).alias("h"))
    # window minimum over h[i .. i+window-1] via a range self-join free
    # approach: Spark window function over rows following
    from pyspark.sql import Window

    w = (
        Window.partitionBy(id_col)
        .orderBy("i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    nmax = g.groupBy(id_col).agg(F.max("i").alias("imax"))
    fps = (
        g.withColumn("wmin", F.min("h").over(w))
        .join(F.broadcast(nmax), id_col)
        .where(F.col("i") <= F.col("imax") - (window - 1))
        .select(id_col, F.col("wmin").alias("fp"))
        .distinct()
    )
    return fps


def repetition_stats(
    spark: SparkSession, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1
    quality filters — the n-gram family; the line-based family is
    meaningless on single-line docs):

      top_bigram_frac  — occurrences of the modal word 2-gram / total
                         2-gram occurrences
      dup_trigram_frac — fraction of 3-gram occurrences whose 3-gram
                         appears more than once in the doc

    Docs with fewer than 3 tokens (no trigram) are excluded. One HOF
    pass builds each gram array (cheap single transform — the repo's
    HOF budget), then explode + groupBy: scales as O(total tokens)."""
    from lucene_spark.pipeline.dedup import tokens_col

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col().alias("t")
    ).filter(F.size("t") >= 3)

    def grams(n):
        idx = f"sequence({n - 1}, size(t) - 1)"
        parts = " || ' ' || ".join(f"t[i - {n - 1 - j}]" for j in range(n))
        return F.explode(F.expr(f"transform({idx}, i -> {parts})"))

    g2 = (
        toks.select("doc_id", grams(2).alias("g"))
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(
            (F.max("count") / F.sum("count")).alias("top_bigram_frac"),
            F.sum("count").alias("n_bigrams"),
        )
    )
    g3 = (
        toks.select("doc_id", grams(3).alias("g"))
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0))
                / F.sum("count")
            ).alias("dup_trigram_frac")
        )
    )
    return (
        g2.join(g3, "doc_id")
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round("top_bigram_frac", 4).alias("top_bigram_frac"),
            F.round("dup_trigram_frac", 4).alias("dup_trigram_frac"),
        )
    )
