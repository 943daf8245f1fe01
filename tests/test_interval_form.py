"""Brute-force equivalence of the two-list closed form used by the
`interval_unordered_top10` gate (and its DuckDB oracle) against the real
greedy two-pointer sweep spec in OracleIndex.interval_counts.

The closed form: the minimal unordered window ending at position e is
(largest opposite-list position < e, e); candidate windows that contain
another candidate are dropped; the maxgaps filter runs last. No Spark —
pure-Python property check over random position layouts.
"""

import random

from lucene_spark.oracle import OracleIndex


def closed_form(A, B, max_gaps):
    cand = set()
    for e in A:
        opp = [p for p in B if p < e]
        if opp:
            cand.add((max(opp), e))
    for e in B:
        opp = [p for p in A if p < e]
        if opp:
            cand.add((max(opp), e))
    mini = {
        (s, e)
        for (s, e) in cand
        if not any(
            s2 >= s and e2 <= e and (s2, e2) != (s, e) for (s2, e2) in cand
        )
    }
    return sum(1 for s, e in mini if (e - s) - 1 <= max_gaps)


def doc_from_layout(A, B, length):
    toks = ["xx"] * length
    for p in A:
        toks[p] = "aa"
    for p in B:
        toks[p] = "bb"
    return " ".join(toks)


def test_unordered_closed_form_matches_sweep_oracle():
    rng = random.Random(7)
    docs = []
    layouts = []
    for _ in range(300):
        npos = rng.randint(2, 14)
        pool = rng.sample(range(30), npos)
        rng.shuffle(pool)
        ka = rng.randint(1, len(pool) - 1)
        A, B = pool[:ka], pool[ka:]
        layouts.append((A, B))
        docs.append(doc_from_layout(A, B, 30))
    oracle = OracleIndex(docs)
    for g in (0, 2, 5, 30):
        counts = oracle.interval_counts(["aa", "bb"], max_gaps=g, ordered=False)
        for row, (A, B) in enumerate(layouts):
            assert counts.get(row, 0) == closed_form(A, B, g), (
                f"row {row} A={sorted(A)} B={sorted(B)} gaps={g}"
            )
