"""Pluggable similarities (search/similarity.py) vs numpy replicas built
from the shared 400-doc oracle postings.

Reference semantics asserted here:
  - quantized docLen: SimilarityBase.java:151-190 LENGTH_TABLE[norm]
  - LMDirichlet clamp-at-0: LMDirichletSimilarity.java:76-81
  - DefaultCollectionModel p=(cf+1)/(total+1): LMSimilarity.java:151-153
  - ClassicSimilarity tf/idf/lengthNorm: ClassicSimilarity.java:45-71
  - BooleanSimilarity: boost per matching term (BooleanSimilarity.java:50)
"""
import math

import numpy as np
import pytest

from lucene_spark.util.smallfloat import byte4_to_int

TERMS = ["license", "getvalue0", "var0"]


def _numpy_scores(oracle, terms, sim, mu=2000.0, lam=0.1):
    """Double-precision per-doc sums, replicated from oracle postings."""
    n = float(oracle.doc_count)
    total = float(oracle.sum_total_term_freq)
    dlq = byte4_to_int(oracle.norms).astype(np.float64)
    out: dict[int, float] = {}
    for t in terms:
        if t not in oracle.postings:
            continue
        rows, tfs, _ = oracle.postings[t]
        cf = float(tfs.sum())
        df = float(len(rows))
        tfd = tfs.astype(np.float64)
        dl = dlq[rows]
        if sim == "lmdirichlet":
            p = (cf + 1.0) / (total + 1.0)
            s = np.log(1 + tfd / (mu * p)) + np.log(mu / (dl + mu))
            s = np.maximum(s, 0.0)
        elif sim == "lmjelinekmercer":
            p = (cf + 1.0) / (total + 1.0)
            s = np.log(1 + ((1 - lam) * tfd / dl) / (lam * p))
        elif sim == "classic":
            idf = math.log((n + 1.0) / (df + 1.0)) + 1.0
            s = np.sqrt(tfd) * idf / np.sqrt(dl)
        elif sim == "boolean":
            s = np.ones_like(tfd)
        elif sim == "dfi":
            expected = (cf + 1.0) * dl / (total + 1.0)
            chi2 = (tfd - expected) * (tfd - expected) / expected
            s = np.where(tfd <= expected, 0.0, np.log2(chi2 + 1.0))
        elif sim == "dfr_inl2":
            # DFRSimilarity I(n)L2: BasicModelIn.java:34-44 (A = log2(
            # (N+1)/(df+0.5))), AfterEffectL (aeTimes1pTfn == 1),
            # NormalizationH2.java:56-58 (tfn = tf*log2(1 + avgdl/dl))
            avgdl = total / n
            a = math.log2((n + 1.0) / (df + 0.5))
            tfn = tfd * np.log2(1.0 + avgdl / dl)
            s = a * (1.0 - 1.0 / (1.0 + tfn))
        elif sim == "ib_ll":
            # IBSimilarity LL/DF/H1: DistributionLL.java:33-35,
            # LambdaDF.java:32-39 (FLOAT32 lambda), NormalizationH1
            avgdl = total / n
            lam32 = float(np.float32((df + 1.0) / (n + 1.0)))
            tfn = tfd * avgdl / dl
            s = -np.log(lam32 / (tfn + lam32))
        elif sim == "axiomatic_f2exp":
            # Axiomatic.java:106-117 + AxiomaticF2EXP.java:58-78
            avgdl = total / n
            tfln = tfd / (tfd + 0.25 + 0.25 * dl / avgdl)
            s = np.maximum(0.0, tfln * math.pow((n + 1.0) / df, 0.35))
        for r, v in zip(rows, s):
            out[int(r)] = out.get(int(r), 0.0) + float(v)
    return out


@pytest.mark.parametrize(
    "sim",
    [
        "lmdirichlet", "lmjelinekmercer", "classic", "boolean", "dfi",
        "dfr_inl2", "ib_ll", "axiomatic_f2exp",
    ],
)
def test_similarity_replicates_numpy(built_index, sim):
    _, oracle, searcher = built_index
    from lucene_spark.search.similarity import search_similarity

    got = [
        (int(r["docID"]), float(r["score"]))
        for r in search_similarity(searcher, TERMS, sim=sim, k=15).collect()
    ]
    exp_map = _numpy_scores(oracle, TERMS, sim)
    want = sorted(exp_map.items(), key=lambda x: (-x[1], x[0]))[:15]
    assert [d for d, _ in got] == [d for d, _ in want], f"{sim} rank diverged"
    for (gd, gv), (wd, wv) in zip(got, want):
        assert gv == pytest.approx(wv, rel=1e-12), f"{sim} doc {gd}"


def test_lmdirichlet_clamp_active(built_index):
    """The clamp must actually fire on this corpus: 'license' is a
    header term present in every doc (p is large), so its raw Dirichlet
    score goes negative for long docs — without the clamp the ranking
    would differ."""
    _, oracle, _ = built_index
    rows, tfs, _ = oracle.postings["license"]
    total = float(oracle.sum_total_term_freq)
    p = (float(tfs.sum()) + 1.0) / (total + 1.0)
    dlq = byte4_to_int(oracle.norms).astype(np.float64)[rows]
    raw = np.log(1 + tfs / (2000.0 * p)) + np.log(2000.0 / (dlq + 2000.0))
    assert (raw < 0).any(), "corpus never exercises the clamp — vacuous"


def test_similarity_and_mode(built_index):
    _, oracle, searcher = built_index
    from lucene_spark.search.similarity import search_similarity

    q = ["license", "getvalue0"]
    out = search_similarity(searcher, q, sim="classic", mode="and", k=400)
    got = {int(r["docID"]) for r in out.collect()}
    a = set(oracle.postings["license"][0].tolist())
    b = set(oracle.postings["getvalue0"][0].tolist())
    assert got == (a & b)


def test_similarity_absent_everything_empty(built_index):
    _, _, searcher = built_index
    from lucene_spark.search.similarity import search_similarity

    assert search_similarity(searcher, ["zzzznope"], sim="classic").count() == 0


def test_similarity_unknown_raises(built_index):
    _, _, searcher = built_index
    from lucene_spark.search.similarity import similarity_scores

    with pytest.raises(ValueError):
        similarity_scores(searcher, ["license"], sim="nope")


def test_boolean_similarity_counts_terms(built_index):
    _, oracle, searcher = built_index
    from lucene_spark.search.similarity import search_similarity

    out = search_similarity(
        searcher, ["license", "getvalue0"], sim="boolean", k=400
    ).collect()
    both = set(oracle.postings["license"][0]) & set(
        oracle.postings["getvalue0"][0]
    )
    for r in out:
        want = 2.0 if int(r["docID"]) in both else 1.0
        assert float(r["score"]) == want


def test_numeric_docvalues_stats_matches_numpy(spark):
    from lucene_spark.search.facets import numeric_docvalues_stats

    vals = [3, 7, 7, 11, 100, 42]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    row = numeric_docvalues_stats(df, "x").head()
    a = np.array(vals, dtype=np.float64)
    assert row["cnt"] == len(vals)
    assert row["vmin"] == 3 and row["vmax"] == 100
    assert row["vsum"] == int(a.sum())
    assert row["mean"] == pytest.approx(a.mean())
    # POPULATION variance (DocValuesStats.java divides by count)
    assert row["variance"] == pytest.approx(a.var())
    assert row["stdev"] == pytest.approx(a.std())


# -- FeatureField functions ---------------------------------------------------

def test_feature_functions_match_numpy(spark):
    from lucene_spark.search.features import feature_score

    vals = [0.0, 1.0, 37.0, 300.0, 5000.0]
    df = spark.createDataFrame([(v,) for v in vals], "f double")
    out = df.select(
        feature_score("f", "linear", 2.0).alias("lin"),
        feature_score("f", "log", 1.5, scale=1.0).alias("lg"),
        feature_score("f", "saturation", 1.5, pivot=300.0).alias("sat"),
        feature_score("f", "sigmoid", 0.5, pivot=300.0, a=2.0).alias("sig"),
    ).collect()
    for v, r in zip(vals, out):
        assert r["lin"] == pytest.approx(2.0 * v)
        assert r["lg"] == pytest.approx(1.5 * math.log(1.0 + v))
        assert r["sat"] == pytest.approx(1.5 * (1 - 300.0 / (v + 300.0)))
        assert r["sig"] == pytest.approx(
            0.5 * (1 - 300.0**2 / (v**2 + 300.0**2))
        )
    # saturation at the pivot is exactly half the weight (FeatureField
    # javadoc contract), sigmoid likewise
    mid = df.where("f = 300.0").select(
        feature_score("f", "saturation", 1.0, pivot=300.0).alias("s"),
        feature_score("f", "sigmoid", 1.0, pivot=300.0, a=2.0).alias("g"),
    ).head()
    assert mid["s"] == pytest.approx(0.5)
    assert mid["g"] == pytest.approx(0.5)


def test_feature_functions_monotonic(spark):
    from lucene_spark.search.features import feature_score

    df = spark.createDataFrame([(float(i),) for i in range(200)], "f double")
    for fn in ("linear", "log", "saturation", "sigmoid"):
        vals = [
            r["s"]
            for r in df.select(
                feature_score("f", fn, 1.0, pivot=10.0, a=2.0).alias("s")
            ).orderBy("f").collect()
        ]
        assert all(b >= a for a, b in zip(vals, vals[1:])), fn


def test_feature_sql_twin_matches(spark):
    import duckdb

    from lucene_spark.search.features import feature_score, feature_score_sql

    vals = [0.0, 3.0, 77.5, 1234.0]
    df = spark.createDataFrame([(v,) for v in vals], "f double")
    got = [
        r["s"]
        for r in df.select(
            feature_score("f", "sigmoid", 0.7, pivot=55.0, a=3.0).alias("s")
        ).orderBy("f").collect()
    ]
    con = duckdb.connect()
    expr = feature_score_sql("f", "sigmoid", 0.7, pivot=55.0, a=3.0)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM (SELECT unnest({vals}) AS f) ORDER BY f"
        ).fetchall()
    ]
    assert got == pytest.approx(want, rel=1e-12)


def test_feature_unknown_raises():
    from lucene_spark.search.features import feature_score, feature_score_sql

    with pytest.raises(ValueError):
        feature_score("f", "nope")
    with pytest.raises(ValueError):
        feature_score_sql("f", "nope")
