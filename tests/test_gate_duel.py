"""Local replica of the driver's correctness gate: every oracle-backed
gate query runs on Spark AND in DuckDB over the same sf0.01 parquet;
rows must match as multisets (columns sorted by name, floats to 1e-9 of
the rounded values)."""

import math
import os

import duckdb
import pytest

from lucene_spark import gate

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(gate.oracle_sql().keys()))
def test_gate_duel(spark, ddb, name):
    q = gate.QUERIES[name]
    sql = gate.oracle_sql()[name]

    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column sets differ"
    sn, _ = _norm_rows(s_cols, s_rows)
    dn, _ = _norm_rows(d_cols, d_rows)
    assert len(sn) == len(dn), f"{name}: row counts {len(sn)} vs {len(dn)}"
    mismatches = [
        (a, b) for a, b in zip(sn, dn)
        if not all(
            (isinstance(x, float) and isinstance(y, float)
             and (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)))
            or x == y
            for x, y in zip(a, b)
        )
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches, first: {mismatches[:3]}"


def test_sloppy2_gate_matches_greedy_oracle(spark):
    """The sloppy2 gate's closed-form window spec must equal the greedy
    minimal-window sweep (the engine/oracle spec) — guards against a
    spec error that the Spark-vs-DuckDB duel (same formula on both
    sides) cannot catch."""
    import numpy as np
    import pandas as pd

    from lucene_spark.oracle import OracleIndex

    pdf = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet")).sort_values(
        "doc_id"
    )
    oracle = OracleIndex(pdf["text"].tolist(), doc_ids=pdf["doc_id"].tolist())
    freqs = oracle.sloppy_freqs(list(gate.TERMS_AND), gate.SLOPPY2_SLOP)
    n = oracle.doc_count
    w = 0.0
    for t in gate.TERMS_AND:
        df = float(len(oracle.postings[t][0])) if t in oracle.postings else 0.0
        w += math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    avgdl = oracle.sum_total_term_freq / n
    scored = []
    for row, f in freqs.items():
        dl = float(oracle.dl[row])
        s = w * f / (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
        scored.append((int(oracle.doc_ids[row]), s))
    scored.sort(key=lambda t: (-t[1], t[0]))
    want = [(d, round(s, gate.ROUND)) for d, s in scored[:10]]

    got = [
        (r["doc_id"], r["score"])
        for r in gate.q_sloppy2_top10(spark, SF_DIR).collect()
    ]
    assert got == want
