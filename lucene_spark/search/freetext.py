"""Free-text (n-gram language model) suggester — "type ahead" next-word
prediction from corpus statistics.

Reference semantics (specification only):
  lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
  FreeTextSuggester.java:116-126 — builds a token n-gram model (bigram by
  default) over the corpus; at lookup, candidates matched at the highest
  gram order score by that order's conditional frequency, and lower
  orders BACK OFF with a constant ALPHA = 0.4 multiplier per level
  ("stupid backoff", Brants et al 2007 — the javadoc's citation).

Spark-first translation with the default bigram model: the "FST of all
grams" is two count tables (one groupBy each — the standard distributed
LM build); lookup is a filtered scan of the bigram table plus the
backed-off unigram tail. At 100 TB the model build is a corpus-bandwidth
aggregation you run once and persist; lookups touch only the context
row-group of the counts table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.pipeline.dedup import tokens_col

ALPHA = 0.4  # FreeTextSuggester.ALPHA


def build_freetext_model(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(unigrams, bigrams) count frames: (w, cnt) and (w1, w2, cnt).
    Non-distinct counts — a language model, unlike dedup's distinct
    shingles. Two shuffles total; persist both as parquet for reuse."""
    toks = docs.select(tokens_col(text_col).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i.cast("int")).alias("w1"),
                        F.element_at("t", (i + 1).cast("int")).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("p")
    )
    bi = (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return uni, bi


def freetext_suggest(
    uni: DataFrame,
    bi: DataFrame,
    context: str,
    k: int = 10,
    alpha: float = ALPHA,
) -> DataFrame:
    """Top-k next words after ``context``'s last token: words seen after
    it score cnt(ctx, w)/cnt(ctx) (the bigram order); every other word
    backs off to alpha * cnt(w)/total (the unigram order, one ALPHA
    level down) — FreeTextSuggester's lookup for the bigram model.
    Ties score DESC then word ASC. Returns (word, score)."""
    from lucene_spark.analysis import analyze

    ctx_toks = analyze(context)
    if not ctx_toks:
        raise ValueError("context analyzed to zero tokens")
    ctx = ctx_toks[-1]

    row = uni.filter(F.col("w") == ctx).select("cnt").head()
    ctx_cnt = int(row["cnt"]) if row is not None else 0
    total = int(uni.agg(F.sum("cnt")).head()[0] or 0)
    if total == 0:
        return uni.select(
            F.col("w").alias("word"), F.lit(0.0).alias("score")
        ).limit(0)

    seen = bi.filter(F.col("w1") == ctx).select(
        F.col("w2").alias("word"),
        (F.col("cnt").cast("double") / F.lit(float(max(ctx_cnt, 1)))).alias(
            "score"
        ),
    )
    backoff = (
        uni.join(seen.select(F.col("word").alias("w")), "w", "left_anti")
        .select(
            F.col("w").alias("word"),
            (
                F.lit(float(alpha))
                * F.col("cnt").cast("double")
                / F.lit(float(total))
            ).alias("score"),
        )
    )
    return (
        seen.unionByName(backoff)
        .orderBy(F.desc("score"), F.asc("word"))
        .limit(k)
    )
