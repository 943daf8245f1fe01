"""Pluggable similarities beyond BM25 — the reference's Similarity
extension point re-expressed as Catalyst score expressions.

Reference semantics (specification only, no code reuse):
  - SimilarityBase (search/similarities/SimilarityBase.java:151-190):
    per-(term,doc) score(stats, freq, docLen) where docLen is the
    QUANTIZED length LENGTH_TABLE[norm byte] — i.e. byte4ToInt(byte4(dl)),
    the same lossy norm every similarity shares.
  - LMDirichletSimilarity (LMDirichletSimilarity.java:76-81):
    score = boost * (ln(1 + tf/(mu*p)) + ln(mu/(docLen+mu))), clamped at
    0; collection model p = (cf+1)/(sumTotalTermFreq+1)
    (LMSimilarity.DefaultCollectionModel, LMSimilarity.java:151-153);
    default mu = 2000.
  - LMJelinekMercerSimilarity (LMJelinekMercerSimilarity.java:68-74):
    score = boost * ln(1 + ((1-lambda)*tf/docLen)/(lambda*p)).
  - ClassicSimilarity / TFIDFSimilarity (ClassicSimilarity.java:45-71,
    TFIDFSimilarity.java:472-476): score = sqrt(tf) * (boost*idf) *
    (1/sqrt(docLen)); idf = ln((docCount+1)/(df+1)) + 1.
  - BooleanSimilarity (BooleanSimilarity.java:50-52): score = boost per
    matching term, statistics ignored.
  - DFISimilarity (DFISimilarity.java:70-81, IndependenceChiSquared.java:33):
    expected = (cf+1)*docLen/(total+1); 0 when freq <= expected, else
    boost * log2(chi2 + 1) with chi2 = (freq-expected)^2/expected.
  - DFRSimilarity I(n)L2 (DFRSimilarity.java:127-131, BasicModelIn.java:34-44,
    AfterEffectL.java:32-34 [aeTimes1pTfn == 1], NormalizationH2.java:56-58):
    tfn = tf * log2(1 + c*avgdl/docLen); score = boost *
    log2((N+1)/(df+0.5)) * (1 - 1/(1+tfn)); default c = 1.
  - IBSimilarity LL/DF/H1 (IBSimilarity.java:115-118,
    DistributionLL.java:33-35, LambdaDF.java:32-39 [lambda computed in
    FLOAT32 — replicated], NormalizationH1.java:56-58):
    tfn = c * tf * avgdl/docLen; lambda = float32((df+1)/(N+1));
    score = boost * -ln(lambda/(tfn+lambda)); default c = 1.
  - AxiomaticF2EXP (Axiomatic.java:106-117 [tf=ln=1, gamma=0, max(0,.)],
    AxiomaticF2EXP.java:58-78): score = max(0, boost *
    freq/(freq + s + s*docLen/avgdl) * ((N+1)/df)^k); defaults
    s = 0.25, k = 0.35.
    avgdl for all three is the EXACT sumTotalTermFreq/docCount double
    (BasicStats.avgFieldLength), while docLen stays quantized.

Fidelity note: the reference evaluates each per-(term,doc) score in
float32 at the SimScorer boundary and sums disjuncts in double; here the
whole pipeline stays double (so a DuckDB oracle can replicate it
bit-for-bit) — ranks can differ from Lucene only where two documents'
scores collide within float32 epsilon. The engine's headline BM25 path
(search/bm25.py) is the one that replicates Lucene's float32 arithmetic
exactly; these alternative similarities follow the gate convention
(double end-to-end, rounded duels).

Plan shape: identical to the BM25 fast path — the tombstone-aware
postings_tf decode (term IN pushdown, positions column pruned), one
broadcast join of the 2-column docmap norms, score as a Catalyst
expression (whole-stage codegen, no UDF), partial-aggregated groupBy,
TakeOrderedAndProject. Nothing here shuffles more than search() does.
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_spark.util.smallfloat import byte4_to_int

SIMILARITIES = (
    "lmdirichlet",
    "lmjelinekmercer",
    "classic",
    "boolean",
    "dfi",
    "dfr_inl2",
    "ib_ll",
    "axiomatic_f2exp",
)


def _length_table_col(norm_col: Column) -> Column:
    """LENGTH_TABLE[norm] (SimilarityBase.java:153-158): the quantized
    document length shared by every non-BM25 similarity. 256 plan-time
    literals indexed by the norm byte — stays inside codegen."""
    table = [int(byte4_to_int(b)) for b in range(256)]
    return F.element_at(
        F.array(*[F.lit(v) for v in table]),
        norm_col.cast("int") + 1,
    ).cast("double")


def similarity_scores(
    searcher,
    terms: list[str],
    sim: str = "lmdirichlet",
    mu: float = 2000.0,
    lam: float = 0.1,
    boost: float = 1.0,
    c: float = 1.0,
    ax_s: float = 0.25,
    ax_k: float = 0.35,
) -> DataFrame | None:
    """(docID, term, s) double-precision per-(term,doc) scores for the
    chosen similarity, or None when no query term exists in the index.
    Absent terms are dropped (a TermQuery on a missing term matches
    nothing in the reference too)."""
    if sim not in SIMILARITIES:
        raise ValueError(f"unknown similarity {sim!r}; one of {SIMILARITIES}")
    stats = searcher.term_stats(terms)
    present = sorted({t for t in terms if t in stats})
    if not present:
        return None
    m = searcher.manifest
    n_docs = float(m["doc_count"])
    total_cf = float(m["sum_total_term_freq"])

    tf = searcher.postings_tf(present)
    dm = searcher.docmap.select("docID", "norm")
    j = tf.join(F.broadcast(dm), "docID")
    dlen = _length_table_col(F.col("norm"))
    tfd = F.col("tf").cast("double")

    if sim == "boolean":
        s = F.lit(float(boost))
    elif sim == "classic":
        idf_map = F.create_map(
            *[
                F.lit(x)
                for t in present
                for x in (
                    t,
                    math.log((n_docs + 1.0) / (stats[t].df + 1.0)) + 1.0,
                )
            ]
        )
        s = (
            F.sqrt(tfd)
            * (F.lit(float(boost)) * idf_map[F.col("term")])
            / F.sqrt(dlen)
        )
    elif sim == "dfi":
        cf_map = F.create_map(
            *[F.lit(x) for t in present for x in (t, float(stats[t].cf))]
        )
        expected = (cf_map[F.col("term")] + 1.0) * dlen / (total_cf + 1.0)
        chi2 = (tfd - expected) * (tfd - expected) / expected
        s = F.when(
            tfd <= expected, F.lit(0.0)
        ).otherwise(F.lit(float(boost)) * F.log2(chi2 + F.lit(1.0)))
    elif sim == "dfr_inl2":
        avgdl = total_cf / n_docs
        a_map = F.create_map(
            *[
                F.lit(x)
                for t in present
                for x in (
                    t,
                    math.log2((n_docs + 1.0) / (stats[t].df + 0.5)),
                )
            ]
        )
        tfn = tfd * F.log2(F.lit(1.0) + F.lit(float(c) * avgdl) / dlen)
        s = (
            F.lit(float(boost))
            * a_map[F.col("term")]
            * (F.lit(1.0) - F.lit(1.0) / (F.lit(1.0) + tfn))
        )
    elif sim == "ib_ll":
        import numpy as np

        avgdl = total_cf / n_docs
        # LambdaDF computes in FLOAT32 (LambdaDF.java:32) — replicate
        lam_map = F.create_map(
            *[
                F.lit(x)
                for t in present
                for x in (
                    t,
                    float(np.float32((stats[t].df + 1.0) / (n_docs + 1.0))),
                )
            ]
        )
        tfn = F.lit(float(c)) * tfd * (F.lit(avgdl) / dlen)
        lw = lam_map[F.col("term")]
        s = F.lit(float(boost)) * -F.log(lw / (tfn + lw))
    elif sim == "axiomatic_f2exp":
        avgdl = total_cf / n_docs
        idf_map = F.create_map(
            *[
                F.lit(x)
                for t in present
                for x in (
                    t,
                    math.pow((n_docs + 1.0) / stats[t].df, float(ax_k)),
                )
            ]
        )
        tfln = tfd / (
            tfd + F.lit(float(ax_s)) + F.lit(float(ax_s)) * dlen / F.lit(avgdl)
        )
        s = F.greatest(
            F.lit(float(boost)) * tfln * idf_map[F.col("term")], F.lit(0.0)
        )
    else:
        # collection model p(w|C) — DefaultCollectionModel
        p_map = F.create_map(
            *[
                F.lit(x)
                for t in present
                for x in (t, (stats[t].cf + 1.0) / (total_cf + 1.0))
            ]
        )
        p = p_map[F.col("term")]
        if sim == "lmdirichlet":
            raw = F.log(F.lit(1.0) + tfd / (F.lit(float(mu)) * p)) + F.log(
                F.lit(float(mu)) / (dlen + F.lit(float(mu)))
            )
            s = F.lit(float(boost)) * F.greatest(raw, F.lit(0.0))
        else:  # lmjelinekmercer
            if not 0.0 < lam <= 1.0:
                raise ValueError("lambda must be in (0, 1]")
            s = F.lit(float(boost)) * F.log(
                F.lit(1.0)
                + (F.lit(1.0 - lam) * tfd / dlen) / (F.lit(float(lam)) * p)
            )
    return j.select("docID", "term", s.alias("s"))


def search_similarity(
    searcher,
    query: str | list[str],
    sim: str = "lmdirichlet",
    k: int = 10,
    mode: str = "or",
    mu: float = 2000.0,
    lam: float = 0.1,
    boost: float = 1.0,
    c: float = 1.0,
    ax_s: float = 0.25,
    ax_k: float = 0.35,
) -> DataFrame:
    """Top-k under an alternative similarity — IndexSearcher.setSimilarity
    analog. mode='and' requires every (present-in-index) query term,
    matching BooleanQuery MUST semantics. Scores double, ties docID ASC."""
    terms = searcher._parse(query)
    scored = similarity_scores(
        searcher, terms, sim=sim, mu=mu, lam=lam, boost=boost,
        c=c, ax_s=ax_s, ax_k=ax_k,
    )
    if scored is None or (
        mode == "and"
        and len({t for t in terms if t in searcher.term_stats(terms)})
        < len(set(terms))
    ):
        return searcher._empty_topk().select(
            "docID", F.col("score").cast("double").alias("score")
        )
    agg = scored.groupBy("docID").agg(
        F.sum("s").alias("score"), F.count("*").alias("nm")
    )
    if mode == "and":
        n_present = len({t for t in terms if t in searcher.term_stats(terms)})
        agg = agg.filter(F.col("nm") == n_present)
    return (
        agg.select("docID", "score")
        .orderBy(F.desc("score"), F.asc("docID"))
        .limit(k)
    )


def length_table_sql() -> str:
    """DuckDB twin of _length_table_col: a literal 256-int list indexed
    by the byte4 norm — lets oracles quantize doc length identically."""
    table = ", ".join(str(int(byte4_to_int(b))) for b in range(256))
    return f"[{table}]"


__all__ = [
    "SIMILARITIES",
    "similarity_scores",
    "search_similarity",
    "length_table_sql",
]
