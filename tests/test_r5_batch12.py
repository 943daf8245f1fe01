"""Mixture-weight resampling (pipeline/sample.weighted_mix) — the
per-source up/down-sampling recipe (GPT-3/Pile/Dolma mixture weights),
deterministic via the md5 device shared with hash_sample."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 4}", f"text {i}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _rows(df):
    return sorted((int(r["doc_id"]), int(r["epoch"])) for r in df.collect())


def test_integer_factor_exact_copies(spark, docs):
    from lucene_spark.pipeline.sample import weighted_mix

    out = weighted_mix(docs, {"s0": 3.0, "s1": 1.0}, default=1.0)
    counts = {
        r["source"]: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    assert counts["s0"] == 300  # exactly 3 copies of 100 docs
    assert counts["s1"] == 100 and counts["s2"] == 100 and counts["s3"] == 100
    # epochs 0..2 present for s0, only 0 elsewhere
    eps = {
        (r["source"], r["epoch"])
        for r in out.select("source", "epoch").distinct().collect()
    }
    assert {e for s, e in eps if s == "s0"} == {0, 1, 2}
    assert {e for s, e in eps if s != "s0"} == {0}


def test_zero_drops_and_default_applies(spark, docs):
    from lucene_spark.pipeline.sample import weighted_mix

    out = weighted_mix(docs, {"s0": 0.0}, default=2.0)
    counts = {
        r["source"]: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    assert "s0" not in counts
    assert counts == {"s1": 200, "s2": 200, "s3": 200}


def test_fractional_deterministic_and_unique(spark, docs):
    from lucene_spark.pipeline.sample import weighted_mix

    a = _rows(weighted_mix(docs, {"s0": 2.5, "s1": 0.25}))
    b = _rows(weighted_mix(docs, {"s0": 2.5, "s1": 0.25}))
    assert a == b and len(a) == len(set(a))
    # proportions in a plausible band (md5 is uniform; 100 trials/source)
    n_s0 = sum(1 for d, _ in a if d % 4 == 0)
    n_s1 = sum(1 for d, _ in a if d % 4 == 1)
    assert 220 <= n_s0 <= 280  # 2.5 * 100 = 250 expected
    assert 10 <= n_s1 <= 45  # 25 expected
    # the sure copies are complete
    assert {(d, e) for d, e in a if d % 4 == 0 and e < 2} == {
        (d, e) for d in range(0, 400, 4) for e in (0, 1)
    }


def test_fractional_subset_nesting(spark, docs):
    """A lower factor's kept tail is a SUBSET of a higher one's at the
    same epoch (thresholds nest — same md5, bigger cut)."""
    from lucene_spark.pipeline.sample import weighted_mix

    lo = {_r for _r in _rows(weighted_mix(docs, {"s1": 0.25}, default=0.0))}
    hi = {_r for _r in _rows(weighted_mix(docs, {"s1": 0.75}, default=0.0))}
    assert lo < hi


def test_negative_factor_rejected(spark, docs):
    from lucene_spark.pipeline.sample import weighted_mix

    with pytest.raises(ValueError):
        weighted_mix(docs, {"s0": -1.0})
