"""Language-model perplexity quality scoring for training-data curation.

The CCNet recipe (Wenzek et al 2019, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data") ranks web documents by the
perplexity of a language model and keeps the low-perplexity head; the
same signal drives quality buckets in most LLM data pipelines. The
reference engine's n-gram machinery is FreeTextSuggester's bigram model
(lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
FreeTextSuggester.java:116-126, stupid backoff ALPHA=0.4 per Brants et
al 2007) — this module scores whole documents under that exact model
instead of predicting next words.

Per-token log-probability (natural log, doubles end-to-end):
  position 1:       ln(cnt_uni(t1) / total)
  seen bigram:      ln(cnt_bi(t_{i-1}, t_i) / cnt_uni(t_{i-1}))
  unseen bigram:    ln(ALPHA * cnt_uni(t_i) / total)
  OOV token:        counts coalesce to 1 (deterministic floor; a model
                    trained on the scored corpus never hits it)
perplexity = exp(-mean logp). Empty docs are excluded.

Plan shape (100 TB): one generate of (pos, prev, w) triples per doc
(JVM higher-order transform, a single cheap pass), then three key-value
joins — two against the unigram table (vocab-sized, broadcastable) and
one against the bigram table (shuffle join on (w1, w2), the standard
distributed LM-scoring shape) — and one final groupBy(doc). No Python
UDFs anywhere; Catalyst/AQE pick broadcast vs shuffle per table size.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.pipeline.dedup import tokens_col
from lucene_spark.search.freetext import ALPHA


def doc_perplexity(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = ALPHA,
) -> DataFrame:
    """(id_col, n_tokens, ppl) for every non-empty document, scored
    under the (uni, bi) count model from build_freetext_model. Sum in
    double, divide, exp — the one canonical op order, replicated by the
    SQL twin so the duel rounds agree."""
    toks = docs.select(F.col(id_col), tokens_col(text_col).alias("t"))
    # guard empty docs (sequence(1, 0) would DESCEND) and position 1
    # (element_at index 0 errors under ANSI mode)
    trips = toks.select(
        id_col,
        F.explode(
            F.when(
                F.size("t") >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.size("t")),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.when(
                            i > 1,
                            F.element_at("t", (i - 1).cast("int")),
                        ).alias("prev"),
                        F.element_at("t", i.cast("int")).alias("w"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("p"),
    ).select(id_col, "p.pos", "p.prev", "p.w")
    total = int(uni.agg(F.sum("cnt")).head()[0] or 0)
    if total == 0:
        return docs.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("ppl"),
        ).limit(0)
    cw = uni.select(F.col("w"), F.col("cnt").alias("cw"))
    cp = uni.select(F.col("w").alias("prev"), F.col("cnt").alias("cprev"))
    cb = bi.select(
        F.col("w1").alias("prev"), F.col("w2").alias("w"),
        F.col("cnt").alias("cbi"),
    )
    j = (
        trips.join(cw, "w", "left")
        .join(cp, "prev", "left")
        .join(cb, ["prev", "w"], "left")
    )
    cw_e = F.coalesce(F.col("cw"), F.lit(1)).cast("double")
    cprev_e = F.coalesce(F.col("cprev"), F.lit(1)).cast("double")
    logp = (
        F.when(F.col("pos") == 1, F.log(cw_e / F.lit(float(total))))
        .when(
            F.col("cbi").isNotNull(),
            F.log(F.col("cbi").cast("double") / cprev_e),
        )
        .otherwise(
            F.log(F.lit(float(alpha)) * cw_e / F.lit(float(total)))
        )
    )
    return (
        j.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(logp).alias("s"),
        )
        .select(
            id_col,
            "n_tokens",
            F.exp(-F.col("s") / F.col("n_tokens").cast("double")).alias(
                "ppl"
            ),
        )
    )


def perplexity_sql(
    alpha: float = ALPHA, text_expr: str = "lower(text)"
) -> str:
    """DuckDB twin of doc_perplexity over a ``documents(doc_id, text)``
    view — identical tokenization, count model, backoff cases, and op
    order (sum double, divide, exp)."""
    return f"""
ta AS (SELECT doc_id,
       list_filter(regexp_split_to_array({text_expr}, '[^a-z0-9]+'),
                   x -> x <> '') AS a FROM documents),
tp AS (SELECT doc_id, unnest(range(1, len(a) + 1)) AS pos,
              unnest(a) AS w FROM ta),
uni AS (SELECT w, count(*)::BIGINT AS cnt FROM tp GROUP BY w),
tot AS (SELECT sum(cnt)::DOUBLE AS total FROM uni),
bi AS (SELECT p.w AS w1, c.w AS w2, count(*)::BIGINT AS cnt
       FROM tp c JOIN tp p ON p.doc_id = c.doc_id AND p.pos = c.pos - 1
       GROUP BY 1, 2),
trip AS (SELECT c.doc_id, c.pos, c.w, p.w AS prev
         FROM tp c LEFT JOIN tp p
           ON p.doc_id = c.doc_id AND p.pos = c.pos - 1),
lp AS (SELECT t.doc_id,
        CASE WHEN t.pos = 1 THEN ln(coalesce(cw.cnt, 1) / (SELECT total FROM tot))
             WHEN cb.cnt IS NOT NULL THEN ln(cb.cnt::DOUBLE / coalesce(cp.cnt, 1))
             ELSE ln({alpha} * coalesce(cw.cnt, 1) / (SELECT total FROM tot))
        END AS logp
       FROM trip t
       LEFT JOIN uni cw ON cw.w = t.w
       LEFT JOIN uni cp ON cp.w = t.prev
       LEFT JOIN bi cb ON cb.w1 = t.prev AND cb.w2 = t.w),
ppl AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
               exp(-sum(logp) / count(*)) AS ppl
        FROM lp GROUP BY doc_id)
"""
