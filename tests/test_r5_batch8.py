"""Exact-substring (repeated k-token span) dedup — Lee et al. 2022
(arXiv:2107.06499) ExactSubstr at k-token resolution.

Expectations come from a pure-python replica built directly on token
lists (dict counting + interval union), so the Spark path's window
functions, hashing, and joins are all independently checked."""

import re
from collections import defaultdict

import pytest

K = 4


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_windows(rows, k):
    """{(doc, pos): window_string} for every positioned k-window."""
    out = {}
    for doc_id, text in rows:
        t = _toks(text)
        for p in range(len(t) - k + 1):
            out[(doc_id, p)] = " ".join(t[p : p + k])
    return out


def _py_dup_stats(rows, k):
    wins = _py_windows(rows, k)
    counts = defaultdict(int)
    for w in wins.values():
        counts[w] += 1
    per_doc = defaultdict(list)
    for (d, p), w in wins.items():
        if counts[w] >= 2:
            per_doc[d].append(p)
    stats = {}
    for d, ps in per_doc.items():
        ps.sort()
        covered, nw = 0, len(ps)
        cur_s, cur_e = None, None
        for p in ps:
            if cur_e is None or p >= cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = p, p + k
            else:
                cur_e = max(cur_e, p + k)
        covered += cur_e - cur_s
        dl = len(_toks(dict(rows)[d]))
        stats[d] = (dl, nw, covered)
    return stats


def _py_removed(rows, k):
    """{doc: set(token positions removed)} under keep-first-occurrence."""
    wins = _py_windows(rows, k)
    by_w = defaultdict(list)
    for key, w in wins.items():
        by_w[w].append(key)
    removed = defaultdict(set)
    for w, keys in by_w.items():
        if len(keys) < 2:
            continue
        keys.sort()
        for d, p in keys[1:]:
            removed[d].update(range(p, p + k))
    return removed


CORPUS = [
    (0, "alpha beta gamma delta epsilon zeta"),          # canonical copy
    (1, "one two three alpha beta gamma delta end"),     # repeats 0's 4-gram
    (2, "alpha beta gamma delta epsilon zeta"),          # exact duplicate of 0
    (3, "unique tokens only here nothing repeats ever"),
    (4, "pad pad2 one two three alpha beta gamma delta"),  # repeats 1's run
    (5, "tiny doc"),                                     # shorter than k
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_duplicate_span_stats_matches_python(spark, corpus_df):
    from lucene_spark.pipeline.substring import duplicate_span_stats

    got = {
        int(r["doc_id"]): (int(r["dl"]), int(r["n_dup_windows"]), int(r["dup_tokens"]))
        for r in duplicate_span_stats(corpus_df, k=K).collect()
    }
    assert got == _py_dup_stats(CORPUS, K)
    # the short doc and the all-unique doc are absent
    assert 3 not in got and 5 not in got


def test_drop_repeated_spans_invariants(spark, corpus_df):
    from lucene_spark.pipeline.substring import drop_repeated_spans

    rows = {
        int(r["doc_id"]): (r["kept_text"], int(r["n_removed_tokens"]))
        for r in drop_repeated_spans(corpus_df, k=K).collect()
    }
    exp_removed = _py_removed(CORPUS, K)
    # every doc present; removal counts match the python replica
    assert set(rows) == {d for d, _ in CORPUS}
    for d, text in CORPUS:
        kept, n_rm = rows[d]
        assert n_rm == len(exp_removed.get(d, set())), f"doc {d}"
        toks = _toks(text)
        exp_kept = " ".join(
            t for i, t in enumerate(toks) if i not in exp_removed.get(d, set())
        )
        assert kept == exp_kept, f"doc {d}"
    # canonical first copy survives intact; the exact duplicate is gutted
    assert rows[0][1] == 0 and rows[0][0] == CORPUS[0][1]
    assert rows[2][0] == "" and rows[2][1] == len(_toks(CORPUS[2][1]))
    # sub-k doc untouched
    assert rows[5] == (CORPUS[5][1], 0)


def test_min_count_threshold(spark, corpus_df):
    from lucene_spark.pipeline.substring import duplicate_span_stats

    # min_count=3: only windows repeated >= 3x survive ("alpha beta
    # gamma delta" appears in docs 0, 1, 2, 4)
    got = {
        int(r["doc_id"]) for r in
        duplicate_span_stats(corpus_df, k=K, min_count=3).collect()
    }
    wins = _py_windows(CORPUS, K)
    counts = defaultdict(int)
    for w in wins.values():
        counts[w] += 1
    exp = {d for (d, p), w in wins.items() if counts[w] >= 3}
    assert got == exp and got  # non-trivial


def test_larger_corpus_self_consistency(spark):
    """On the sf0.001 table: stats' dup_tokens equals the removal's
    per-doc loss for docs where every dup window is non-canonical."""
    from lucene_spark.pipeline.substring import (
        drop_repeated_spans,
        duplicate_span_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    st = {
        int(r["doc_id"]): int(r["dup_tokens"])
        for r in duplicate_span_stats(docs, k=5).collect()
    }
    assert st, "corpus should contain duplicated spans"
    rm = {
        int(r["doc_id"]): int(r["n_removed_tokens"])
        for r in drop_repeated_spans(docs, k=5).collect()
    }
    # removal never exceeds the doc's total duplicated coverage
    for d, cov in st.items():
        assert rm[d] <= cov
    # docs with no dup spans lose nothing
    for d, n in rm.items():
        if d not in st:
            assert n == 0
