"""Porter stemmer as generated DuckDB SQL — the independent oracle twin
of ``lucene_spark.analysis.porter``.

The gate duel (gate.oracle_sql) needs to reproduce a *stemmed* index in
DuckDB, and the sandbox has no network so DuckDB's fts/stem extension
cannot load. This module generates a pure-SQL implementation instead:
a chain of CTEs over the distinct vocabulary, one per algorithm step,
each carrying (term, w, mp) where ``w`` is the in-progress word and
``mp`` its consonant/vowel map ('C'/'V' per char).

Key identities that make the SQL tractable:
 - cons(i) depends only on chars <= i, so the CV map of any *prefix* of
   w is a prefix of w's map — suffix conditions over the stem read
   ``substr(mp, 1, length(w)-l)``.
 - m(stem) > 0  <=>  the stem's map contains an adjacent 'VC' pair;
   m(stem) > 1  <=>  it matches 'VC.*VC' (VC pairs cannot overlap).
 - the y rule (consonant at pos 0, else opposite of its predecessor) is
   a left fold — ``list_reduce`` over the word's characters.

Generated SQL is golden-tested against Porter's official 23k-word
voc/output data in tests/test_porter.py (same data as the Python
implementation), so the two sides of the duel are independently
verified implementations in different media.
"""
from __future__ import annotations

# CV map of an expression: left fold over characters.
def _cvmap(e: str) -> str:
    return (
        f"list_reduce(list_prepend('', regexp_extract_all({e}, '.')), "
        "(acc, c) -> acc || (CASE WHEN c IN ('a','e','i','o','u') THEN 'V' "
        "WHEN c = 'y' THEN (CASE WHEN acc = '' OR substr(acc, -1, 1) = 'V' "
        "THEN 'C' ELSE 'V' END) ELSE 'C' END))"
    )


def _m_gt0(map_expr: str) -> str:
    return f"({map_expr} LIKE '%VC%')"


def _m_gt1(map_expr: str) -> str:
    return f"regexp_matches({map_expr}, 'VC.*VC')"


def _stem_map(l: int) -> str:
    """Map of the stem left after removing an l-char suffix."""
    return f"substr(mp, 1, length(w) - {l})"


def _strip(l: int) -> str:
    return f"substr(w, 1, length(w) - {l})"


def _rule(suf: str, rep: str, gt1: bool = False) -> str:
    """One r(s)-style rule: if w ends with suf and m(stem) > 0 (or > 1
    for step4), replace the suffix; a match with failing measure leaves
    w unchanged but still consumes the word (CASE short-circuit ==
    the reference's switch/break)."""
    l = len(suf)
    cond = _m_gt1(_stem_map(l)) if gt1 else _m_gt0(_stem_map(l))
    out = f"{_strip(l)} || '{rep}'" if rep else _strip(l)
    return (
        f"WHEN w LIKE '%{suf}' THEN (CASE WHEN {cond} THEN {out} ELSE w END)"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"), ("logi", "log"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
    "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
    "ous", "ive", "ize",
]


def porter_ctes(vocab_cte: str = "vocab", col: str = "term") -> str:
    """CTE chain ``p0 .. stems`` stemming ``{vocab_cte}.{col}`` (already
    lowercase) into ``stems(term, stem)``. Splice after a CTE providing
    the distinct vocabulary; possessive-strip is applied first to match
    token_filters=("possessive", "porter")."""
    # possessive + step 1a need no map
    poss = (
        f"CASE WHEN length({col}) >= 2 AND substr({col}, length({col})-1, 1)"
        " IN ('''', '’', '＇') AND substr("
        f"{col}, length({col}), 1) IN ('s','S') "
        f"THEN substr({col}, 1, length({col})-2) ELSE {col} END"
    )
    s1a = (
        "CASE WHEN w LIKE '%sses' THEN substr(w, 1, length(w)-2) "
        "WHEN w LIKE '%ies' THEN substr(w, 1, length(w)-3) || 'i' "
        "WHEN w LIKE '%ss' THEN w "
        "WHEN w LIKE '%s' THEN substr(w, 1, length(w)-1) "
        "ELSE w END"
    )
    # step 1b: eed / ed / ing detection (needs map), then the
    # at/bl/iz/doublec/cvc cleanup on the stripped stem (fresh map)
    s1b_w = (
        "CASE WHEN w LIKE '%eed' THEN (CASE WHEN "
        + _m_gt0(_stem_map(3))
        + f" THEN {_strip(1)} ELSE w END) "
        f"WHEN w LIKE '%ed' AND {_stem_map(2)} LIKE '%V%' THEN {_strip(2)} "
        f"WHEN w LIKE '%ing' AND {_stem_map(3)} LIKE '%V%' THEN {_strip(3)} "
        "ELSE w END"
    )
    s1b_fix = (
        "CASE WHEN w LIKE '%eed' THEN FALSE "
        f"WHEN w LIKE '%ed' AND {_stem_map(2)} LIKE '%V%' THEN TRUE "
        f"WHEN w LIKE '%ing' AND {_stem_map(3)} LIKE '%V%' THEN TRUE "
        "ELSE FALSE END"
    )
    dbl = (
        "length(w) >= 2 AND substr(w, -1, 1) = substr(w, -2, 1) "
        "AND substr(mp, length(w), 1) = 'C'"
    )
    cvc_end = (
        "length(w) >= 3 AND substr(mp, length(w)-2, 3) = 'CVC' "
        "AND substr(w, -1, 1) NOT IN ('w','x','y')"
    )
    s1b_fixup = (
        "CASE WHEN NOT fix THEN w "
        "WHEN w LIKE '%at' OR w LIKE '%bl' OR w LIKE '%iz' THEN w || 'e' "
        f"WHEN {dbl} AND substr(w, -1, 1) NOT IN ('l','s','z') "
        "THEN substr(w, 1, length(w)-1) "
        f"WHEN mp LIKE '%VC%' AND NOT {_m_gt1('mp')} AND {cvc_end} "
        "THEN w || 'e' "
        "ELSE w END"
    )
    s1c = (
        "CASE WHEN w LIKE '%y' AND substr(mp, 1, length(w)-1) LIKE '%V%' "
        "THEN substr(w, 1, length(w)-1) || 'i' ELSE w END"
    )
    s2 = "CASE " + " ".join(_rule(s, r) for s, r in _STEP2) + " ELSE w END"
    s3 = "CASE " + " ".join(_rule(s, r) for s, r in _STEP3) + " ELSE w END"
    s4_rules = []
    for suf in _STEP4:
        l = len(suf)
        if suf == "ion":
            # requires a non-empty stem ending in s/t; on failure the
            # reference falls through to 'ou', which can never match a
            # word ending in 'ion', so no match is behavior-identical
            s4_rules.append(
                "WHEN w LIKE '%ion' THEN (CASE WHEN length(w) >= 4 "
                "AND substr(w, length(w)-3, 1) IN ('s','t') AND "
                + _m_gt1(_stem_map(3))
                + f" THEN {_strip(3)} ELSE w END)"
            )
        else:
            s4_rules.append(
                f"WHEN w LIKE '%{suf}' THEN (CASE WHEN "
                + _m_gt1(_stem_map(l))
                + f" THEN {_strip(l)} ELSE w END)"
            )
    s4 = "CASE " + " ".join(s4_rules) + " ELSE w END"
    # step 5: the e-removal reads m/cvc over the FULL word; the ll
    # check then reads m over the ORIGINAL word's map (j is pinned
    # before the e is dropped) but doublec over the shortened word —
    # prefix-consistency lets both read the same mp
    cvc_k1 = (
        "length(w) >= 4 AND substr(mp, length(w)-3, 3) = 'CVC' "
        "AND substr(w, length(w)-1, 1) NOT IN ('w','x','y')"
    )
    s5e = (
        f"CASE WHEN w LIKE '%e' AND ({_m_gt1('mp')} OR (mp LIKE '%VC%' "
        f"AND NOT {_m_gt1('mp')} AND NOT ({cvc_k1}))) "
        "THEN substr(w, 1, length(w)-1) ELSE w END"
    )
    s5l = (
        "CASE WHEN substr(we, -1, 1) = 'l' AND length(we) >= 2 "
        "AND substr(we, -1, 1) = substr(we, -2, 1) "
        "AND substr(mp, length(we), 1) = 'C' "
        f"AND {_m_gt1('mp')} THEN substr(we, 1, length(we)-1) ELSE we END"
    )
    return f"""
p0 AS (SELECT {col} AS term, {poss} AS w FROM {vocab_cte}),
p1a AS (SELECT term, {s1a} AS w FROM p0),
p1bm AS (SELECT term, w, {_cvmap('w')} AS mp FROM p1a),
p1bw AS (SELECT term, {s1b_w} AS w, {s1b_fix} AS fix FROM p1bm),
p1bf AS (SELECT term, w, fix, {_cvmap('w')} AS mp FROM p1bw),
p1b AS (SELECT term, {s1b_fixup} AS w FROM p1bf),
p1cm AS (SELECT term, w, {_cvmap('w')} AS mp FROM p1b),
p1c AS (SELECT term, {s1c} AS w FROM p1cm),
p2m AS (SELECT term, w, {_cvmap('w')} AS mp FROM p1c),
p2 AS (SELECT term, {s2} AS w FROM p2m),
p3m AS (SELECT term, w, {_cvmap('w')} AS mp FROM p2),
p3 AS (SELECT term, {s3} AS w FROM p3m),
p4m AS (SELECT term, w, {_cvmap('w')} AS mp FROM p3),
p4 AS (SELECT term, {s4} AS w FROM p4m),
p5m AS (SELECT term, w, {_cvmap('w')} AS mp FROM p4),
p5e AS (SELECT term, mp, {s5e} AS we FROM p5m),
p5 AS (SELECT term, {s5l} AS w FROM p5e),
stems AS (SELECT p0.term, CASE WHEN length(p0.w) <= 2 THEN p0.w
                               ELSE p5.w END AS stem
          FROM p0 JOIN p5 USING (term))"""
