"""Expressions module tests — the Javascript-like scoring language.

Three-way duel: the pure-Python reference evaluator (exact Java
conversion semantics) vs the Catalyst Column backend vs the DuckDB SQL
backend, over a value grid that exercises NaN/inf/negative-zero/huge
values and every operator and default function. Plus parser goldens
(precedence, literals, fault cases) and the ExpressionRescorer analog
end-to-end on the shared index.

Reference: expressions/src/java/org/apache/lucene/expressions/js/
Javascript.g4 (grammar), JavascriptCompiler.java (semantics; note
truthiness is d2i(x) != 0 so 0.5 is FALSY), JavascriptCompiler.properties
(default function table), ExpressionRescorer.java (rescore).
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_spark.search.expressions import compile_expression

VALS = [
    0.0, 1.0, -1.0, 0.5, -0.5, 2.5, -2.5, 3.0, 7.0, 100.25, -17.75,
    1e9, -1e9, 5e18, 1.5e19, -1.5e19, 1e300, -1e300, float("inf"),
    float("-inf"), float("nan"), 0.1, 63.0, 64.0, 65.0, -3.0, 710.6,
]

# every operator level, conversion boundary, and default function
DUEL_EXPRS = [
    "a + b * 2 - 3 / (b + 0.0001)",
    "a % b",
    "a / b",
    "-a + +b",
    "a > b ? a - b : b - a",
    "(a >= 0 && b >= 0) || a == b",
    "!a",
    "a < b ? 1 : (a <= b ? 2 : 3)",
    "a == b",
    "a != b",
    "~a",
    "a & b",
    "a | b",
    "a ^ b",
    "a << b",
    "a >> b",
    "a >>> b",
    "(a & 255) | (b ^ 16)",
    "(a & b) && 1",
    "(a | 1) ? 7 : 9",
    "abs(a) + min(a, b) + max(a, b)",
    "sqrt(abs(a)) + ln(abs(b) + 1)",
    "ln(a)",
    "log10(a) + logn(2, abs(b) + 2)",
    "logn(b, a)",
    "pow(a, b)",
    "pow(abs(a) + 0.5, 0.25) + exp(min(a, 10))",
    "sin(a) + cos(b) + tan(a * 0.1)",
    "asin(a) + acos(b)",
    "atan(a) + atan2(a, b)",
    "sinh(min(a, 5)) + cosh(min(b, 5)) + tanh(a)",
    "cosh(a) + tanh(b)",
    "asinh(a) + acosh(a) + atanh(a)",
    "ceil(a) + floor(b)",
    "haversin(40.7, -74.0, a / 10, b / 10)",
    "haversinMeters(40.7, -74.0, a / 10, b / 10)",
    "0x1F + 017 + 1.5e2 + .25",
    "a ? 1 : b ? 2 : 3",
    "min(a, b) == max(a, b) ? 0 : (a + b) / 2",
]


def _close(x, y):
    if x is None or y is None:
        return False
    if math.isnan(x) and math.isnan(y):
        return True
    if x == y:
        return True
    if math.isinf(x) or math.isinf(y):
        return x == y
    return abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))


@pytest.fixture(scope="module")
def compiled():
    return {src: compile_expression(src) for src in DUEL_EXPRS}


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(float(a), float(b)) for a in VALS for b in VALS]
    return spark.createDataFrame(rows, "a double, b double")


def test_three_way_duel_spark(spark, grid, compiled):
    cols = [
        e.to_column({"a": F.col("a"), "b": F.col("b")}).alias(f"e{i}")
        for i, e in enumerate(compiled.values())
    ]
    out = grid.select("a", "b", *cols).collect()
    assert len(out) == len(VALS) ** 2
    bad = []
    for r in out:
        for i, (src, e) in enumerate(compiled.items()):
            py = e.evaluate({"a": r["a"], "b": r["b"]})
            if not _close(py, r[f"e{i}"]):
                bad.append((src, r["a"], r["b"], py, r[f"e{i}"]))
    assert not bad, bad[:10]


def test_three_way_duel_duckdb(compiled):
    con = duckdb.connect()
    con.execute("CREATE TABLE grid (a DOUBLE, b DOUBLE)")
    # scalar params keep NaN as NaN (DOUBLE[] list params NULL it out)
    con.executemany(
        "INSERT INTO grid VALUES (?, ?)",
        [(a, b) for a in VALS for b in VALS],
    )
    for src, e in compiled.items():
        sql = e.to_sql({"a": "a", "b": "b"})
        rows = con.execute(f"SELECT a, b, {sql} FROM grid").fetchall()
        for a, b, dk in rows:
            py = e.evaluate({"a": a, "b": b})
            assert _close(py, dk), (src, a, b, py, dk)


# --------------------------------------------------------------------------
# parser / semantics goldens (no engines needed)
# --------------------------------------------------------------------------


def _ev(src, **env):
    return compile_expression(src).evaluate(env)


def test_precedence_goldens():
    assert _ev("1 + 2 * 3") == 7.0
    assert _ev("(1 + 2) * 3") == 9.0
    assert _ev("2 + 3 << 1") == 10.0  # shift binds looser than addsub
    assert _ev("1 | 2 ^ 3 & 5") == 3.0  # & > ^ > |
    assert _ev("4 & 4 == 4") == 0.0  # == binds tighter: 4 & (1) = 0
    assert _ev("1 < 2 == 1") == 1.0
    assert _ev("-2 * -3") == 6.0
    assert _ev("- - 5") == 5.0
    assert _ev("1 ? 2 : 0 ? 3 : 4") == 2.0
    assert _ev("0 ? 2 : 0 ? 3 : 4") == 4.0
    assert _ev("2 * (3 > 1 ? 10 : 20)") == 20.0


def test_literals():
    assert _ev("0x1F") == 31.0
    assert _ev("017") == 15.0
    assert _ev("1.5e2") == 150.0
    assert _ev(".25") == 0.25
    assert _ev("0") == 0.0
    assert _ev("09") == 9.0  # not octal (g4 OCTAL requires [0-7])


def test_truthiness_is_d2i():
    # JavascriptCompiler pushes INT context for conditions: |x| < 1 is
    # FALSE even when nonzero, NaN is FALSE
    assert _ev("0.5 ? 1 : 2") == 2.0
    assert _ev("-0.9 ? 1 : 2") == 2.0
    assert _ev("1.5 ? 1 : 2") == 1.0
    assert _ev("a ? 1 : 2", a=float("nan")) == 2.0
    assert _ev("!0.5") == 1.0
    assert _ev("0.5 && 1") == 0.0
    assert _ev("0.5 || 0") == 0.0


def test_integral_literal_saturates_not_wraps():
    # a decimal literal beyond long range saturates through d2l in the
    # reference (doubles + d2l), never two's-complement wraps
    assert _ev("10000000000000000000 & -1") == float((1 << 63) - 1)
    assert _ev("-10000000000000000000 | 0") == float(-(1 << 63))


def test_cosh_overflow_edge():
    # math.cosh raises just past ~710.476; all backends give +inf
    assert _ev("cosh(a)", a=710.6) == float("inf")
    assert _ev("cosh(a)", a=-710.6) == float("inf")


def test_long_chain_precision():
    # nested bitwise ops stay in long (no double round-trip): (1<<62)|1
    # is odd in long but rounds to even in double
    assert _ev("((1 << 62) | 1) & 1") == 1.0
    # forcing a double boundary (the + is a DADD) rounds the bit away
    assert _ev("(0 + ((1 << 62) | 1)) & 1") == 0.0


def test_shift_count_masking():
    # Java masks long shift counts to 6 bits: 1 << 64 == 1
    assert _ev("1 << 64") == 1.0
    assert _ev("1 << 65") == 2.0
    assert _ev("16 >> 65") == 8.0
    assert _ev("-1 >>> 32") == float((1 << 32) - 1)
    assert _ev("-8 >> 1") == -4.0


def test_java_nan_comparisons():
    n = float("nan")
    assert _ev("a == a", a=n) == 0.0
    assert _ev("a != a", a=n) == 1.0
    assert _ev("a < 1 || a >= 1", a=n) == 0.0


def test_compile_errors():
    with pytest.raises(ValueError):
        compile_expression("1 +")
    with pytest.raises(ValueError):
        compile_expression("nosuchfn(1)")
    with pytest.raises(ValueError):
        compile_expression("min(1)")  # wrong arity
    with pytest.raises(ValueError):
        compile_expression("1 @ 2")
    with pytest.raises(ValueError):
        compile_expression("(1 + 2")


def test_unbound_variable():
    e = compile_expression("a + missing_var")
    assert e.variables == ["a", "missing_var"]
    with pytest.raises(ValueError, match="missing_var"):
        e.evaluate({"a": 1.0})


def test_variable_shapes():
    # VARIABLE grammar: ID ARRAY* ( . ID ARRAY* )* — the raw text is
    # the binding key (SimpleBindings convention)
    e = compile_expression("doc.freq + fields['body'] + arr[0]")
    assert set(e.variables) == {"doc.freq", "fields['body']", "arr[0]"}
    assert e.evaluate(
        {"doc.freq": 1.0, "fields['body']": 2.0, "arr[0]": 3.0}
    ) == 6.0


def test_default_function_goldens():
    assert _ev("max(1, 2)") == 2.0
    assert _ev("min(1, 2)") == 1.0
    assert _ev("abs(-3)") == 3.0
    assert _ev("pow(2, 10)") == 1024.0
    assert _ev("logn(2, 8)") == 3.0
    assert _ev("ln(0)") == float("-inf")
    assert math.isnan(_ev("ln(-1)"))
    assert math.isnan(_ev("sqrt(-1)"))
    assert _ev("floor(2.7)") == 2.0
    assert _ev("ceil(2.2)") == 3.0
    assert _ev("floor(-2.5)") == -3.0
    assert _ev("ceil(-2.5)") == -2.0
    # haversin: NYC -> LA is ~3936 km
    d = _ev("haversin(40.7128, -74.0060, 34.0522, -118.2437)")
    assert 3900 < d < 3970
    assert _close(
        _ev("haversinMeters(40.7128, -74.0060, 34.0522, -118.2437)"),
        d * 1000.0,
    )


# --------------------------------------------------------------------------
# ExpressionRescorer analog e2e
# --------------------------------------------------------------------------


def test_rescore_expression_e2e(spark, built_index):
    manifest, oracle, searcher = built_index
    window = 30
    first = searcher.search(["query", "table"], k=window)
    rows = {r["docID"]: float(r["score"]) for r in first.collect()}
    # per-doc feature: docID parity scaled — deterministic, no corpus dep
    feats = spark.createDataFrame(
        [(d, float(d % 7)) for d in rows], "docID long, boost double"
    )
    src = "ln(1 + score) + (boost > 3 ? 0.5 : 0.0) + sqrt(boost) / 10"
    expr = compile_expression(src)
    got = searcher.rescore_expression(first, src, feats, k=10).collect()
    import numpy as np

    # engine ranks by the float32-cast score (search()'s _topk contract)
    expected = sorted(
        (
            (
                -np.float32(
                    expr.evaluate({"score": s, "boost": float(d % 7)})
                ),
                d,
            )
            for d, s in rows.items()
        ),
    )[:10]
    assert [r["docID"] for r in got] == [d for _, d in expected]
    for r, (neg_s, _) in zip(got, expected):
        assert -neg_s == pytest.approx(r["score"], rel=1e-6)


def test_rescore_expression_score_only(spark, built_index):
    # no doc_features needed when the expression only uses `score`
    _, _, searcher = built_index
    first = searcher.search(["query"], k=20)
    got = searcher.rescore_expression(first, "score * 2 + 1", k=5)
    base = first.orderBy(F.desc("score"), F.asc("docID")).limit(5).collect()
    out = got.collect()
    assert [r["docID"] for r in out] == [r["docID"] for r in base]
    for o, b in zip(out, base):
        assert o["score"] == pytest.approx(2 * b["score"] + 1, rel=1e-6)


def test_rescore_expression_missing_features_errors(spark, built_index):
    _, _, searcher = built_index
    first = searcher.search(["query"], k=5)
    with pytest.raises(ValueError, match="doc_features"):
        searcher.rescore_expression(first, "score + myvar", None, k=5)


def test_rescore_expression_window_bounds_feature_join(spark, built_index):
    """The features frame must be bounded to the window by a broadcast
    join BEFORE the left join — a broadcast hint on the preserved side
    of a left join is unusable and would shuffle the full frame."""
    _, _, searcher = built_index
    n = searcher.manifest["doc_count"]
    feats = spark.createDataFrame(
        [(d, float(d)) for d in range(n)], "docID long, fv double"
    )
    first = searcher.search(["query"], k=10)
    plan = searcher.rescore_expression(
        first, "score + fv / 1000", feats, k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


# --------------------------------------------------------------------------
# ExpressionSortField analog
# --------------------------------------------------------------------------


def test_sort_by_expression(spark, built_index):
    _, _, searcher = built_index
    import numpy as np

    n = searcher.manifest["doc_count"]
    feats = spark.createDataFrame(
        [(d, float((d * 37) % 101), float(d)) for d in range(n)],
        "docID long, fval double, did double",
    )
    src = "ln(1 + fval) * 100 - did / 1000"  # injective
    e = compile_expression(src)
    got = searcher.sort_by_expression(src, feats, k=7).collect()
    want = sorted(
        (
            (-e.evaluate({"fval": float((d * 37) % 101), "did": float(d)}), d)
            for d in range(n)
        ),
    )[:7]
    assert [r["docID"] for r in got] == [d for _, d in want]
    for r, (neg, _) in zip(got, want):
        assert r["sortkey"] == pytest.approx(-neg, rel=1e-12)
    # ascending flips the order
    asc = searcher.sort_by_expression(src, feats, k=7, ascending=True).collect()
    want_asc = sorted(
        (
            (e.evaluate({"fval": float((d * 37) % 101), "did": float(d)}), d)
            for d in range(n)
        ),
    )[:7]
    assert [r["docID"] for r in asc] == [d for _, d in want_asc]


def test_sort_by_expression_match_set_and_missing(spark, built_index):
    _, _, searcher = built_index
    # features only cover part of the corpus: missing docs bind 0.0
    feats = spark.createDataFrame(
        [(d, 100.0 + d) for d in range(5)], "docID long, v double"
    )
    matches = spark.createDataFrame(
        [(d,) for d in (1, 3, 200, 201)], "docID long"
    )
    got = searcher.sort_by_expression(
        "v", feats, matches=matches, k=10
    ).collect()
    assert [r["docID"] for r in got] == [3, 1, 200, 201]
    assert got[0]["sortkey"] == 103.0
    assert got[2]["sortkey"] == 0.0  # missing feature -> 0.0, docID tiebreak


def test_sort_by_expression_rejects_score(spark, built_index):
    _, _, searcher = built_index
    feats = spark.createDataFrame([(0, 1.0)], "docID long, v double")
    with pytest.raises(ValueError, match="score"):
        searcher.sort_by_expression("score + v", feats, k=5)
    with pytest.raises(ValueError, match="lacks"):
        searcher.sort_by_expression("w", feats, k=5)
