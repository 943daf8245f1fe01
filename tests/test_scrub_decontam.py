"""PII scrubbing and benchmark decontamination (pipeline/scrub.py,
pipeline/decontam.py) — exact-semantics tests on planted inputs; the
engine-vs-DuckDB duels live in the gate (pii_scrub / decontam_overlap).
"""
import pytest


def test_scrub_counts_and_redacts(spark):
    from lucene_spark.pipeline.scrub import scrub

    rows = [
        (1, "mail me at bob.smith+x@my-site.co.uk or 192.168.0.1 now"),
        (2, "card 1234567890123456 and 10.0.0.255 and a@b.io"),
        (3, "nothing sensitive here"),
        (4, "two mails a@b.com c@d.org one ip 8.8.8.8 num 999999999"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub(df).collect()}

    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_longdigits"]) == (1, 1, 0)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_longdigits"]) == (1, 1, 1)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_longdigits"]) == (0, 0, 0)
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_longdigits"]) == (2, 1, 1)

    assert out[1]["text_redacted"] == "mail me at <EMAIL> or <IP> now"
    assert out[2]["text_redacted"] == "card <NUM> and <IP> and <EMAIL>"
    assert out[3]["text_redacted"] == "nothing sensitive here"
    assert out[4]["text_redacted"] == "two mails <EMAIL> <EMAIL> one ip <IP> num <NUM>"


def test_scrub_rule_order_email_before_digits(spark):
    """An all-digit email local part must become <EMAIL>, not <NUM> —
    rule order is part of the contract."""
    from lucene_spark.pipeline.scrub import scrub

    df = spark.createDataFrame(
        [(1, "reach 123456789012@digits.example please")],
        "doc_id long, text string",
    )
    r = scrub(df).head()
    assert r["text_redacted"] == "reach <EMAIL> please"
    assert r["n_email"] == 1 and r["n_longdigits"] == 1  # counts are per-rule on the raw text


def test_contamination_exact_fractions(spark):
    from lucene_spark.pipeline.decontam import contamination

    # eval doc: "a b c d e f"; corpus doc 1 shares the 4-gram "c d e f";
    # doc 2 shares nothing; doc 3 IS the eval text (full overlap);
    # doc 4 is shorter than n -> no shingles -> no row
    corpus = spark.createDataFrame(
        [
            (1, "x y c d e f z w"),
            (2, "p q r s t u v"),
            (3, "a b c d e f"),
            (4, "a b c"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "a b c d e f")], "doc_id long, text string")
    rep = {
        r["doc_id"]: r for r in contamination(corpus, ev, n=4).collect()
    }
    assert set(rep) == {1, 3}
    # doc 1: 5 distinct 4-grams, 1 overlapping
    assert rep[1]["n_shingles"] == 5 and rep[1]["n_overlap"] == 1
    assert rep[1]["overlap_frac"] == pytest.approx(0.2)
    # doc 3: all 3 of its 4-grams overlap
    assert rep[3]["n_shingles"] == 3 and rep[3]["n_overlap"] == 3
    assert rep[3]["overlap_frac"] == pytest.approx(1.0)


def test_contamination_eval_broadcast_plan(spark):
    """The eval side must broadcast — the corpus never shuffles by
    shingle (the 100-TB property)."""
    from lucene_spark.pipeline.decontam import contamination

    corpus = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(50)],
        "doc_id long, text string",
    )
    ev = corpus.limit(2)
    plan = (
        contamination(corpus, ev, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# -- FreeTextSuggester ---------------------------------------------------------

def test_freetext_suggest_exact_scores(spark):
    from lucene_spark.search.freetext import build_freetext_model, freetext_suggest

    # "red" is followed by: car x2, bus x1; cnt(red)=4 (one trailing)
    rows = [
        (1, "red car goes fast"),
        (2, "red car red bus"),
        (3, "blue sky and a red"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uni, bi = build_freetext_model(docs)
    out = [(r["word"], r["score"]) for r in freetext_suggest(uni, bi, "red", k=4).collect()]
    # bigram order: car 2/4, bus 1/4; backoff: others 0.4*cnt/total
    # (total tokens = 4 + 4 + 5 = 13)
    assert out[0] == ("car", 0.5)
    assert out[1] == ("bus", 0.25)
    # red never follows red, so it backs off: 0.4 * cnt(red)/total
    assert out[2][0] == "red" and out[2][1] == pytest.approx(0.4 * 4 / 13)


def test_freetext_backoff_excludes_seen(spark):
    from lucene_spark.search.freetext import build_freetext_model, freetext_suggest

    docs = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    uni, bi = build_freetext_model(docs)
    out = {r["word"]: r["score"] for r in freetext_suggest(uni, bi, "a", k=10).collect()}
    # after 'a': b twice, c once; cnt(a)=3
    assert out["b"] == pytest.approx(2 / 3)
    assert out["c"] == pytest.approx(1 / 3)
    # 'a' itself only via backoff: 0.4 * 3/6
    assert out["a"] == pytest.approx(0.4 * 3 / 6)
    assert len(out) == 3


def test_freetext_unknown_context_pure_backoff(spark):
    from lucene_spark.search.freetext import build_freetext_model, freetext_suggest

    docs = spark.createDataFrame([(1, "x y z x")], "doc_id long, text string")
    uni, bi = build_freetext_model(docs)
    out = [(r["word"], r["score"]) for r in freetext_suggest(uni, bi, "qq", k=3).collect()]
    # nothing follows 'qq' -> everything backs off by unigram frequency
    assert out[0] == ("x", pytest.approx(0.4 * 2 / 4))
    assert {w for w, _ in out} == {"x", "y", "z"}
