"""PorterStemFilter / EnglishPossessiveFilter parity tests.

Golden data: Martin Porter's official 23k-word voc/output pairs, shipped
by the reference as porterTestData.zip (the exact fixture
TestPorterStemFilter.java:62 asserts against). Both the Python filter
(lucene_spark.analysis.porter) and the generated DuckDB SQL twin
(lucene_spark.search.stem_sql) must reproduce it 100%.
"""
import os
import random
import string
import zipfile

import numpy as np
import pytest

from lucene_spark.analysis.porter import (
    TOKEN_FILTERS,
    filter_vocab,
    porter_stem,
    possessive,
)

_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/en/porterTestData.zip"
)


def _golden():
    with zipfile.ZipFile(_ZIP) as z:
        voc = z.read("voc.txt").decode().split()
        out = z.read("output.txt").decode().split()
    assert len(voc) == len(out)
    return voc, out


@pytest.mark.skipif(not os.path.exists(_ZIP), reason="reference data absent")
def test_porter_golden_python():
    voc, out = _golden()
    bad = [(v, porter_stem(v), o) for v, o in zip(voc, out) if porter_stem(v) != o]
    assert not bad, bad[:10]


@pytest.mark.skipif(not os.path.exists(_ZIP), reason="reference data absent")
def test_porter_golden_sql():
    """The DuckDB oracle-side stemmer matches the same golden data —
    keeps the gate duel's two sides independently verified."""
    import duckdb
    import pandas as pd

    from lucene_spark.search.stem_sql import porter_ctes

    voc, out = _golden()
    con = duckdb.connect()
    vdf = pd.DataFrame({"term": voc, "want": out})
    con.register("vdf", vdf)
    res = con.sql(
        "WITH vocab AS (SELECT DISTINCT term FROM vdf),"
        + porter_ctes()
        + " SELECT term, stem FROM stems"
    ).df()
    m = vdf.merge(res, on="term")
    bad = m[m.stem != m.want]
    assert len(bad) == 0, bad.head(10)


def test_sql_python_agree_on_random_tokens():
    """Property: SQL and Python stemmers agree on arbitrary analyzer
    output — digits, y-runs, apostrophes (possessive chain), short
    tokens, the lot."""
    import duckdb
    import pandas as pd

    from lucene_spark.search.stem_sql import porter_ctes

    rng = random.Random(42)
    alpha = string.ascii_lowercase + "y0123456789'"
    toks = list(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(3000)
        }
    )
    toks += ["yyyy", "syzygy", "cyyyy", "dog's", "james'", "x", "", "1999s",
             "don't", "it's", "ing", "eed", "ies", "s", "ss", "sses"]
    toks = [t for t in toks if t]
    chain = [possessive, porter_stem]
    py = {}
    for t in toks:
        w = t
        for fn in chain:
            w = fn(w)
        py[t] = w
    con = duckdb.connect()
    con.register("vdf", pd.DataFrame({"term": toks}))
    res = con.sql(
        "WITH vocab AS (SELECT DISTINCT term FROM vdf),"
        + porter_ctes()
        + " SELECT term, stem FROM stems"
    ).df()
    got = dict(zip(res.term, res.stem))
    bad = [(t, py[t], got[t]) for t in toks if py[t] != got[t]]
    assert not bad, bad[:10]


def test_possessive():
    assert possessive("dog's") == "dog"
    assert possessive("dog’s") == "dog"
    assert possessive("dog＇S") == "dog"
    assert possessive("dogs") == "dogs"
    assert possessive("'s") == ""
    assert possessive("s") == "s"


def test_short_words_unstemmed():
    for w in ("a", "is", "by", "s", ""):
        assert porter_stem(w) == w


def test_filter_vocab_remap():
    uniq = ["running", "run", "jumps", "jump", "query"]
    new_uniq, remap = filter_vocab(uniq, ("possessive", "porter"))
    assert remap.dtype == np.int32
    assert len(remap) == len(uniq)
    # running and run collapse to the same new code
    assert remap[0] == remap[1]
    assert remap[2] == remap[3]
    stems = [new_uniq[c] for c in remap]
    assert stems == ["run", "run", "jump", "jump", "queri"]
    codes = np.array([0, 1, 2, 3, 4, 0], dtype=np.int32)
    assert [new_uniq[c] for c in remap[codes]] == [
        "run", "run", "jump", "jump", "queri", "run"
    ]


def test_token_filters_registry():
    assert set(TOKEN_FILTERS) >= {"possessive", "porter"}
    assert TOKEN_FILTERS["porter"]("conditional") == "condit"
    assert TOKEN_FILTERS["porter"]("rational") == "ration"
