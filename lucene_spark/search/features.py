"""FeatureField / FeatureQuery — static ranking signals as score boosts.

Reference semantics (specification only):
  lucene/core/src/java/org/apache/lucene/document/FeatureField.java —
  a per-document feature (pagerank, recency, url length...) indexed so it
  can contribute to the score through a monotonic function, typically as
  a SHOULD clause next to the text query:
    - newLinearQuery        (FeatureField.java:262-270):  w * f
    - newLogQuery           (:355-358):   w * ln(scale + f)
    - newSaturationQuery    (:440-451):   w * (1 - pivot/(f + pivot))
      (the f/(f+pivot) form rewritten so rounding can't make it
      non-monotonic — we keep the same rewritten form)
    - newSigmoidQuery       (:525-532):   w * (1 - pivot^a/(f^a + pivot^a))

The reference smuggles the feature value through the term-frequency slot
of a fake term with a reduced-mantissa encoding (decodeFeatureValue);
on Spark the feature is simply a numeric column, exact — no quantization
(documented deviation; the quantization is a postings-format workaround,
not a semantic).

All functions are pure Catalyst expressions in double; adding one to a
score column costs zero extra jobs and zero shuffles.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FEATURE_FUNCTIONS = ("linear", "log", "saturation", "sigmoid")


def feature_score(
    value_col: str | Column,
    function: str = "saturation",
    weight: float = 1.0,
    pivot: float = 1.0,
    a: float = 1.0,
    scale: float = 1.0,
) -> Column:
    """Score contribution of a per-doc feature column — the FeatureQuery
    family. Add it to a query score (SHOULD-clause semantics: docs keep
    matching via the text query; the feature only boosts)."""
    f = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    w = F.lit(float(weight))
    if function == "linear":
        return w * f
    if function == "log":
        return w * F.log(F.lit(float(scale)) + f)
    if function == "saturation":
        p = F.lit(float(pivot))
        return w * (F.lit(1.0) - p / (f + p))
    if function == "sigmoid":
        ppa = F.lit(float(pivot) ** float(a))
        return w * (F.lit(1.0) - ppa / (F.pow(f, F.lit(float(a))) + ppa))
    raise ValueError(
        f"unknown feature function {function!r}; one of {FEATURE_FUNCTIONS}"
    )


def feature_score_sql(
    value_expr: str,
    function: str = "saturation",
    weight: float = 1.0,
    pivot: float = 1.0,
    a: float = 1.0,
    scale: float = 1.0,
) -> str:
    """ANSI-SQL twin of feature_score (same arithmetic, for oracle
    duels)."""
    if function == "linear":
        return f"({weight!r} * ({value_expr}))"
    if function == "log":
        return f"({weight!r} * ln({scale!r} + ({value_expr})))"
    if function == "saturation":
        return (
            f"({weight!r} * (1.0 - {pivot!r} / (({value_expr}) + {pivot!r})))"
        )
    if function == "sigmoid":
        ppa = float(pivot) ** float(a)
        return (
            f"({weight!r} * (1.0 - {ppa!r} / "
            f"(pow(({value_expr}), {a!r}) + {ppa!r})))"
        )
    raise ValueError(
        f"unknown feature function {function!r}; one of {FEATURE_FUNCTIONS}"
    )
