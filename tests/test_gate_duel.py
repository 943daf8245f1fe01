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
