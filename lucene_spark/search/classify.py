"""Classification — the lucene/classification module on DataFrames.

Reference semantics (specification only, no code reuse):
  - classification/KNearestNeighborClassifier.java:52 — MLT query over
    the training corpus, top-k hits, per-class vote weighted by
    score/maxScore.
  - classification/SimpleNaiveBayesClassifier.java — multinomial naive
    Bayes with add-1 smoothing over index statistics, softmax-normalized
    (its normClassificationResults log-sum-exp).

Spark-first mapping: the classifiers are pure compositions of the
engine's existing distributed primitives — MLT term selection + BM25
top-k for kNN, postings ⨝ labels aggregations for naive Bayes. The
training corpus never leaves the cluster: per-class statistics are
one-shuffle aggregates, the label side joins postings on docID (a
broadcast for driver-small label maps, a shuffle join at scale), and
only the final |classes|-row verdicts reach the driver. The batch
variant classifies a whole DataFrame of inputs in one job (per-input
softmax via a window over the tiny (input, class) grid).

All classifier math is double precision so the DuckDB gate oracle
replicates it exactly (gates `knn_classify` / `nb_classify`).
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# kNN (KNearestNeighborClassifier)
# --------------------------------------------------------------------------

def knn_vote(hits: DataFrame, k: int, cls_col: str = "cls",
             score_col: str = "score") -> DataFrame:
    """Per-class vote from top-k scored hits, exactly
    KNearestNeighborClassifier.buildListFromTopDocs:

        boost_c = sum over class hits of (score / maxScore)
        score_c = (count_c * (boost_c / count_c)) / k  ==  boost_c / k
        if sumdoc < k: score_c *= k / sumdoc          (the "correction")

    sumdoc (the number of labeled hits) never exceeds k, so both
    branches reduce to ``boost_c / sumdoc`` — the closed form computed
    here. Null-labeled hits are skipped (the reference skips docs
    without the class field). Returns (cls, vote) with vote unrounded
    double; order downstream by vote DESC, cls ASC."""
    w = hits.where(F.col(cls_col).isNotNull())
    tot = w.agg(
        F.max(score_col).alias("mx"), F.count("*").alias("sumdoc")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .groupBy(cls_col)
        .agg(
            (F.sum(F.col(score_col) / F.col("mx")) / F.first("sumdoc"))
            .alias("vote")
        )
        .select(F.col(cls_col).alias("cls"), "vote")
    )


def knn_classify(searcher, seed_text: str, labels: DataFrame, k: int = 10,
                 **mlt_kwargs) -> DataFrame:
    """Classify ``seed_text`` against the searcher's corpus: MLT top-k
    (the engine's float32 ranking path — rank-identical to the double
    closed form, see tests) joined to ``labels`` (docID, cls), voted by
    knn_vote. Returns (cls, vote) — take the max row for assignClass."""
    hits = searcher.more_like_this(seed_text, k=k, **mlt_kwargs)
    # broadcast the k-row hit side, never the (potentially corpus-sized)
    # label map
    j = labels.join(F.broadcast(hits), "docID").select(
        F.col("cls"), F.col("score").cast("double").alias("score")
    )
    return knn_vote(j, k)


# --------------------------------------------------------------------------
# naive Bayes (SimpleNaiveBayesClassifier)
# --------------------------------------------------------------------------

def _nb_scores(
    searcher, tokens_df: DataFrame, labels: DataFrame,
    terms: list[str] | None = None,
) -> DataFrame:
    """Shared scoring grid for the single and batch variants.

    tokens_df: (qid, term, qtf) — analyzed input tokens with
    multiplicity. labels: (docID, cls). Returns (qid, cls, score) with

        score = ln(df_c) - ln(n_labeled)                       # prior
              + sum_w qtf_w * ln(hits(w, c) + 1)               # matched
              - n_tokens * ln(avg_unique * df_c + n_labeled)   # denom

    where hits(w, c) = docs of class c containing w, avg_unique =
    sumDocFreq / docCount from the index manifest (the reference's
    average unique terms per doc), and unmatched (w, c) pairs contribute
    ln(0 + 1) = 0 — which is why the inner join below is exact."""
    n_labeled = labels.count()
    cls_df = labels.groupBy("cls").agg(F.count("*").alias("dfc"))
    avg_unique = searcher.manifest["sum_doc_freq"] / searcher.doc_count

    # bounded driver materialization: a driver-known term list (single
    # text) or a short batch vocabulary pushes an exact list into the
    # postings scan; huge batch vocabularies stay distributed (full
    # decode + term join) instead of collecting
    if terms is None:
        qterms = tokens_df.select("term").distinct()
        n_terms = qterms.count()
        if n_terms <= 4096:
            terms = [r.term for r in qterms.collect()]
    if terms is not None:
        base = searcher.postings_tf(terms)
    else:
        base = searcher.postings_tf().join(
            tokens_df.select("term").distinct(), "term"
        )
    wc = (
        base.join(labels, "docID")
        .groupBy("cls", "term")
        .agg(F.count("*").alias("hits"))
    )
    matched = (
        tokens_df.join(wc, "term")
        .groupBy("qid", "cls")
        .agg(F.sum(F.col("qtf") * F.log(F.col("hits") + 1)).alias("mll"))
    )
    ntok = tokens_df.groupBy("qid").agg(F.sum("qtf").alias("n_tokens"))
    grid = (
        ntok.crossJoin(F.broadcast(cls_df))
        .join(matched, ["qid", "cls"], "left")
        .na.fill({"mll": 0.0})
    )
    den = F.log(F.lit(avg_unique) * F.col("dfc") + F.lit(float(n_labeled)))
    score = (
        F.log(F.col("dfc")) - F.lit(math.log(n_labeled))
        + F.col("mll") - F.col("n_tokens") * den
    )
    return grid.select("qid", "cls", score.alias("score"))


def _nb_softmax(scores: DataFrame) -> DataFrame:
    """normClassificationResults: per-qid softmax via the log-sum-exp
    trick, computed over the tiny (qid, class) grid with windows."""
    w = Window.partitionBy("qid")
    smax = F.max("score").over(w)
    with_m = scores.withColumn("smax", smax)
    loga = F.col("smax") + F.log(
        F.sum(F.exp(F.col("score") - F.col("smax"))).over(w)
    )
    return with_m.withColumn("prob", F.exp(F.col("score") - loga)).select(
        "qid", "cls", "score", "prob"
    )


def nb_classify(searcher, text: str, labels: DataFrame) -> DataFrame:
    """Classify one text: analyze with the index's analyzer chain
    (tokens with multiplicity, like the reference's tokenize()), score
    every class, softmax. Returns (cls, score, prob)."""
    toks = searcher._parse(text)
    if not toks:
        return searcher.spark.createDataFrame(
            [], "cls string, score double, prob double"
        )
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    tokens_df = searcher.spark.createDataFrame(
        [(0, t, c) for t, c in sorted(tf.items())], "qid long, term string, qtf long"
    )
    return _nb_softmax(
        _nb_scores(searcher, tokens_df, labels, terms=sorted(tf))
    ).select("cls", "score", "prob")


def nb_classify_batch(searcher, docs: DataFrame, labels: DataFrame) -> DataFrame:
    """Classify a whole DataFrame of inputs in ONE job — the 100 TB
    shape. ``docs``: (qid, text). Tokenization runs through the same
    vectorized window tokenizer as the index builder (Arrow batches,
    analyzer chain included), so batch results are identical to
    per-text nb_classify. Returns (qid, cls, score, prob)."""
    import numpy as np
    import pandas as pd

    from lucene_spark.analysis.porter import chain_can_drop
    from lucene_spark.index.builder import _window_codes

    filters = tuple(searcher._token_filters)

    def tok(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes, uniq, dls = _window_codes(
                pdf["text"].tolist(), token_filters=filters
            )[:3]
            if len(codes) == 0:
                continue
            uniq_arr = np.asarray(uniq, dtype=object)
            doc_idx = np.repeat(np.arange(len(pdf)), dls)
            if chain_can_drop(filters):
                # dropping filters leave -1 codes; no positions needed
                keep = codes >= 0
                codes, doc_idx = codes[keep], doc_idx[keep]
                if len(codes) == 0:
                    continue
            key = doc_idx.astype(np.int64) * (len(uniq_arr) + 1) + codes
            uk, cnt = np.unique(key, return_counts=True)
            d, c = uk // (len(uniq_arr) + 1), uk % (len(uniq_arr) + 1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy()[d],
                    "term": uniq_arr[c],
                    "qtf": cnt,
                }
            )

    tokens_df = docs.select("qid", "text").mapInPandas(
        tok, schema="qid long, term string, qtf long"
    )
    return _nb_softmax(_nb_scores(searcher, tokens_df, labels))
