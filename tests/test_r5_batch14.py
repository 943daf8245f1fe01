"""FuzzySuggester + TruncateTokenFilter (r5 batch 14).

FuzzySuggester (reference lucene/suggest/src/java/org/apache/lucene/
search/suggest/analyzing/FuzzySuggester.java:63): completion whose
typed text may contain up to maxEdits (default 1) Levenshtein edits,
first nonFuzzyPrefix (default 1) chars exact, no fuzziness below
minFuzzyLength (default 3) typed chars. The engine collapses the
Levenshtein-automaton x suggest-FST intersection to a bounded
LEAST(levenshtein(substring(term,1,L), p)) window; the replica here is
an independent per-term python loop over the oracle vocabulary.

TruncateTokenFilter (reference analysis/miscellaneous/
TruncateTokenFilter.java:33): tokens longer than n are cut to their
first n chars — a 1:1 (never-dropping) parameterized filter pinned in
manifests as ``truncate_<n>``.
"""
import shutil

import pytest

from lucene_spark.analysis.porter import chain_can_drop, resolve_filter
from lucene_spark.analysis.standard import analyze
from lucene_spark.corpus import corpus_spark_df, generate_corpus
from lucene_spark.oracle import OracleIndex


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _replica_fuzzy_suggest(
    oracle,
    p: str,
    k: int = 10,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
):
    e = max_edits if len(p) >= min_fuzzy_length else 0
    out = []
    for term, (rows, _, _) in oracle.postings.items():
        if non_fuzzy_prefix and not term.startswith(p[:non_fuzzy_prefix]):
            continue
        if e == 0:
            ok = term.startswith(p)
        else:
            ok = any(
                _lev(term[:L], p) <= e
                for L in range(max(1, len(p) - e), len(p) + e + 1)
            )
        if ok:
            out.append((term, int(rows.size)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


@pytest.mark.parametrize("typed", ["reurn", "returnn", "pakage", "impor"])
def test_suggest_fuzzy_matches_replica(built_index, typed):
    _, oracle, searcher = built_index
    got = [
        (r["term"], r["df"])
        for r in searcher.suggest_fuzzy(typed, k=10).collect()
    ]
    exp = _replica_fuzzy_suggest(oracle, typed)
    assert got == exp, (typed, got, exp)
    assert exp, f"vacuous duel: no matches for {typed!r}"


def test_suggest_fuzzy_short_input_degrades_to_prefix(built_index):
    _, oracle, searcher = built_index
    # len < minFuzzyLength: zero edits allowed -> plain prefix lookup
    got = [
        (r["term"], r["df"])
        for r in searcher.suggest_fuzzy("cl", k=10).collect()
    ]
    exp = _replica_fuzzy_suggest(oracle, "cl")
    assert got == exp
    assert all(t.startswith("cl") for t, _ in got)
    assert exp


def test_doc_perplexity_matches_replica(spark):
    """Bigram-LM perplexity (pipeline/lm_quality.py) vs an independent
    per-token python loop: first-token unigram, seen-bigram conditional,
    stupid-backoff, OOV floor, empty-doc exclusion."""
    import math

    from lucene_spark.pipeline.lm_quality import doc_perplexity
    from lucene_spark.search.freetext import ALPHA, build_freetext_model

    texts = [
        "the cat sat on the mat",
        "the cat ate the cat food",
        "dog runs",
        "",  # excluded: zero tokens
        "mat mat mat",
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    uni, bi = build_freetext_model(train)
    # score a frame containing an OOV token too
    score_texts = texts + ["zebra the cat"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["ppl"])
        for r in doc_perplexity(docs, uni, bi).collect()
    }

    toks = [t.split() for t in score_texts]
    ucnt: dict[str, int] = {}
    bcnt: dict[tuple, int] = {}
    for t in [t.split() for t in texts]:
        for w in t:
            ucnt[w] = ucnt.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bcnt[(a, b)] = bcnt.get((a, b), 0) + 1
    total = sum(ucnt.values())
    exp = {}
    for i, t in enumerate(toks):
        if not t:
            continue
        s = 0.0
        for j, w in enumerate(t):
            cw = ucnt.get(w, 1)
            if j == 0:
                s += math.log(cw / total)
            elif (t[j - 1], w) in bcnt:
                s += math.log(bcnt[(t[j - 1], w)] / ucnt.get(t[j - 1], 1))
            else:
                s += math.log(ALPHA * cw / total)
        exp[i] = (len(t), math.exp(-s / len(t)))
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        assert abs(got[i][1] - exp[i][1]) < 1e-9, (i, got[i], exp[i])


def test_truncate_resolve_grammar():
    fn = resolve_filter("truncate_4")
    assert fn("elephant") == "elep"
    assert fn("ab") == "ab" and fn("abcd") == "abcd"
    assert not chain_can_drop(("truncate_4", "porter"))
    for bad in ("truncate_0", "truncate_x", "truncate"):
        with pytest.raises(KeyError):
            resolve_filter(bad)


N_DOCS = 150
CHAIN = ("truncate_4",)


@pytest.fixture(scope="module")
def trunc_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.engine import IndexSearcher

    out = str(tmp_path_factory.mktemp("trunc") / "idx")
    docs = corpus_spark_df(spark, N_DOCS, partitions=4)
    build_index(spark, docs, out, partitions=4, token_filters=CHAIN)
    pdf = (
        generate_corpus(N_DOCS)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    oracle = OracleIndex(pdf["content"].tolist(), token_filters=CHAIN)
    searcher = IndexSearcher(spark, out)
    yield oracle, searcher, pdf
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("typed", ["returnclass", "importdef", "classif"])
def test_suggest_word_breaks_matches_replica(built_index, typed):
    """WordBreakSpellChecker.suggestWordBreaks replica: every split
    whose halves are both dictionary terms, summed df DESC, left ASC."""
    _, oracle, searcher = built_index
    got = [
        (r["left"], r["right"], r["freq_sum"])
        for r in searcher.suggest_word_breaks(typed, k=5).collect()
    ]
    df = {t: int(rows.size) for t, (rows, _, _) in oracle.postings.items()}
    exp = sorted(
        (
            (typed[:i], typed[i:], df[typed[:i]] + df[typed[i:]])
            for i in range(2, len(typed) - 1)
            if typed[:i] in df and typed[i:] in df
        ),
        key=lambda r: (-r[2], r[0]),
    )[:5]
    assert got == exp, (typed, got, exp)
    assert exp, f"vacuous: no break found for {typed!r}"


def test_suggest_word_breaks_no_split(built_index):
    _, _, searcher = built_index
    assert searcher.suggest_word_breaks("zzqxzzqx", k=5).count() == 0
    assert searcher.suggest_word_breaks("abc", k=5).count() >= 0


def test_resolve_duplicates_semantics(spark):
    """Cluster resolution: survivor = (quality DESC, id ASC) argmax per
    component, singletons kept, custom quality column honored."""
    import pyspark.sql.functions as F

    from lucene_spark.pipeline.dedup import resolve_duplicates

    # docs 1-2-3 one chain component, 5-6 another, 9 a singleton
    docs = spark.createDataFrame(
        [
            (1, "a b c", 10.0),
            (2, "a b c d e", 30.0),
            (3, "a b", 30.0),
            (5, "x y z w", 7.0),
            (6, "x y", 2.0),
            (9, "solo text", 1.0),
        ],
        "doc_id long, text string, w double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long"
    )
    # default quality = token count: cluster {1,2,3} keeps 2 (5 tokens)
    got = {
        r["doc_id"]: (r["rep"], r["kept"])
        for r in resolve_duplicates(spark, docs, pairs).collect()
    }
    assert got == {
        1: (1, False), 2: (1, True), 3: (1, False),
        5: (5, True), 6: (5, False), 9: (9, True),
    }
    # custom quality: tie at w=30 between 2 and 3 -> lower id wins
    got2 = {
        r["doc_id"]: r["kept"]
        for r in resolve_duplicates(
            spark, docs, pairs, quality_col=F.col("w")
        ).collect()
    }
    assert got2 == {1: False, 2: True, 3: False, 5: True, 6: False, 9: True}


def test_force_merge_exact_gen_budget(spark, tmp_path):
    """forceMerge(maxNumSegments) analog: 4 generations merge down to
    exactly 2, then 1, with rank-identical query results at every step
    and old generation dirs cleaned after the manifest commit."""
    import os

    import pytest as _pytest

    from lucene_spark.search.engine import IndexSearcher
    from lucene_spark.streaming.incremental import (
        _atomic_json,
        _load_state,
        _state_path,
        force_merge,
        refresh,
        write_segment,
    )

    out = str(tmp_path / "fm_idx")
    os.makedirs(out)
    n, n_chunks = 160, 4
    pdf = (
        generate_corpus(n)
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    per = n // n_chunks
    for c in range(n_chunks):
        part = pdf.iloc[c * per : (c + 1) * per]
        state = _load_state(out)
        nd = write_segment(
            spark, spark.createDataFrame(part), out, f"s{c}",
            state["next_doc"], partitions=2,
        )
        state["next_doc"] += nd
        state["segments"].append({"seg": f"s{c}", "num_docs": nd})
        _atomic_json(_state_path(out), state)
        refresh(spark, out, partitions=2)

    def top(k=10):
        s = IndexSearcher(spark, out)
        return [
            (r["docID"], r["score"]) for r in s.search("return", k=k).collect()
        ]

    assert _load_state(out)["gens"] and len(_load_state(out)["gens"]) == 4
    before = top()

    m2 = force_merge(spark, out, max_num_gens=2, partitions=2)
    assert m2["num_gens"] == 2
    assert top() == before
    live = {f"gen={g}" for g in m2["gens"]}
    on_disk = set(os.listdir(os.path.join(out, "postings")))
    assert on_disk == live, "stale generation dirs survived cleanup"

    m1 = force_merge(spark, out, max_num_gens=1, partitions=2)
    assert m1["num_gens"] == 1
    assert top() == before
    # idempotent once under budget
    m1b = force_merge(spark, out, max_num_gens=2, partitions=2)
    assert m1b["num_gens"] == 1
    with _pytest.raises(ValueError):
        force_merge(spark, out, max_num_gens=0)


def test_truncate_vocab_and_stats(trunc_index):
    oracle, searcher, pdf = trunc_index
    terms = {
        r["term"]: r["df"]
        for r in searcher.terms_table.select("term", "df").collect()
    }
    assert terms and all(len(t) <= 4 for t in terms)
    exp = {t: int(rows.size) for t, (rows, _, _) in oracle.postings.items()}
    assert terms == exp
    # 1:1 filter: dl equals the RAW token count (nothing dropped)
    dls = {r["docID"]: r["dl"] for r in searcher.docmap.collect()}
    raw = [len(analyze(t)) for t in pdf["content"].tolist()]
    assert all(dls[r] == raw[r] for r in range(N_DOCS))


def test_truncate_positions_merge_collisions(trunc_index):
    oracle, searcher, _ = trunc_index
    # 'return' and 'retry_...' style identifiers collapse onto 'retu':
    # positions of the merged term are the union, per-doc ascending
    t = "retu"
    rows, _, posmap = oracle.postings[t]
    exp = sorted(
        (int(oracle.doc_ids[r]), int(p))
        for r in rows.tolist()
        for p in posmap[r].tolist()
    )
    got = sorted(
        (r["docID"], r["pos"])
        for r in searcher.postings_positions([t]).collect()
    )
    assert got == exp and exp
