"""explain() and highlight() contracts.

explain (IndexSearcher.explain + BM25Similarity.explainScore,
reference lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java:233-269): per-(doc, term) decomposition equals a
brute-force double-precision BM25 over the analyzed corpus, and the
contribs sum to the doc score.

highlight (UnifiedHighlighter over POSTINGS offsets, reference
lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
UnifiedHighlighter.java): the chosen passage is exactly the
anchored-window density rule replayed in plain Python over
analyze_with_offsets, and the snippet is the text slice.
"""

import math

import pandas as pd
import pytest

from lucene_spark.analysis import analyze
from lucene_spark.analysis.standard import analyze_with_offsets
from lucene_spark.corpus import generate_corpus
from lucene_spark.index.builder import build_index
from lucene_spark.search.engine import IndexSearcher

K1, B = 1.2, 0.75
TERMS = ["query", "index", "tail"]
WINDOW = 30


@pytest.fixture(scope="module")
def hl_idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hl") / "idx")
    pdf = generate_corpus(60)
    extra = pd.DataFrame(
        {
            "repo": ["zz_hl"] * 3,
            "path": [f"f{i}" for i in range(3)],
            "commit": ["0"] * 3,
            "lang": ["txt"] * 3,
            "content": [
                # dense cluster late in the doc beats the early lone match
                "query alone here then filler filler filler "
                "query index query tail query end",
                "index tail " + "pad " * 40 + " query",
                "no match terms at all in this one",
            ],
        }
    )
    pdf = pd.concat([pdf, extra], ignore_index=True)
    build_index(
        spark, spark.createDataFrame(pdf), out, partitions=4,
        store_offsets=True,
    )
    return out, pdf


def _brute(s, pdf):
    """(docID->text, per-doc term tf, df, dl) keyed by the index's own
    docmap (no assumption that pandas and Spark sort identically)."""
    dm = s.docmap.select("docID", "repo", "path", "commit").toPandas()
    key = pdf.set_index(["repo", "path", "commit"])["content"]
    texts = {
        int(r.docID): key.loc[(r.repo, r.path, r.commit)]
        for r in dm.itertuples()
    }
    tfs, dls = {}, {}
    for d, text in texts.items():
        toks = analyze(text)
        dls[d] = len(toks)
        for t in toks:
            tfs[(d, t)] = tfs.get((d, t), 0) + 1
    dfc = {}
    for (d, t) in tfs:
        dfc[t] = dfc.get(t, 0) + 1
    return texts, tfs, dfc, dls


def test_explain_matches_bruteforce(spark, hl_idx):
    out, pdf = hl_idx
    s = IndexSearcher(spark, out)
    texts, tfs, dfc, dls = _brute(s, pdf)
    n = len(texts)
    avgdl = sum(dls.values()) / n

    def contrib(d, t):
        tf = tfs[(d, t)]
        idf = math.log(1 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
        return idf * tf / (tf + K1 * (1 - B + B * dls[d] / avgdl))

    scores = {}
    for (d, t) in tfs:
        if t in TERMS:
            scores[d] = scores.get(d, 0.0) + contrib(d, t)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    exp_rows = {
        (d, t)
        for d, _ in top
        for t in TERMS
        if (d, t) in tfs
    }

    got = s.explain(TERMS, k=10).collect()
    assert {(r["docID"], r["term"]) for r in got} == exp_rows
    for r in got:
        d, t = r["docID"], r["term"]
        assert r["tf"] == tfs[(d, t)]
        assert r["df"] == dfc[t]
        assert r["dl"] == dls[d]
        assert abs(r["contrib"] - contrib(d, t)) < 1e-9
        assert abs(r["score"] - scores[d]) < 1e-9
        assert abs(
            r["idf"] - math.log(1 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
        ) < 1e-9
    # contribs sum to the reported doc score
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["docID"], [0.0, r["score"]])
        by_doc[r["docID"]][0] += r["contrib"]
    for tot, rep in by_doc.values():
        assert abs(tot - rep) < 1e-9


def test_explain_and_mode_and_absent(spark, hl_idx):
    out, _ = hl_idx
    s = IndexSearcher(spark, out)
    assert s.explain(["nosuchterm_xyz"], k=5).count() == 0
    rows = s.explain(["query", "tail"], k=5, mode="and").collect()
    docs = {r["docID"] for r in rows}
    # every AND hit carries exactly both terms
    for d in docs:
        assert {r["term"] for r in rows if r["docID"] == d} == {
            "query", "tail",
        }
    # absent term in AND mode -> empty
    assert s.explain(["query", "nosuchterm_xyz"], k=5, mode="and").count() == 0


def _best_passage(text, window):
    toks, starts, _ = analyze_with_offsets(text)
    ms = [st for tk, st in zip(toks, starts) if tk in TERMS]
    if not ms:
        return None
    best = None
    for a in ms:
        nm = sum(1 for b in ms if a <= b < a + window)
        if best is None or nm > best[1]:
            best = (a, nm)
    p_end = min(best[0] + window, len(text))
    return best[0], p_end, best[1], text[best[0]:p_end]


def test_highlight_matches_bruteforce(spark, hl_idx):
    out, pdf = hl_idx
    s = IndexSearcher(spark, out)
    texts, tfs, dfc, dls = _brute(s, pdf)

    docs_df = spark.createDataFrame(pdf)
    got = {
        r["docID"]: (r["p_start"], r["p_end"], r["n_matches"], r["snippet"])
        for r in s.highlight(
            TERMS, docs_df=docs_df, k=10, window=WINDOW
        ).collect()
    }
    assert got  # the planted docs guarantee hits
    for d, row in got.items():
        exp = _best_passage(texts[d], WINDOW)
        assert exp is not None and row == exp, f"doc {d}"
    # the planted dense-cluster doc picks the late cluster, not the
    # early lone match
    dense = next(
        d for d, t in texts.items() if t.startswith("query alone here")
    )
    if dense in got:
        assert got[dense][0] > 0
        assert got[dense][2] >= 3


def test_highlight_without_docs_df(spark, hl_idx):
    out, _ = hl_idx
    s = IndexSearcher(spark, out)
    rows = s.highlight(TERMS, k=5, window=WINDOW).collect()
    assert rows and "snippet" not in rows[0].asDict()
    for r in rows:
        assert r["p_end"] == r["p_start"] + WINDOW


def test_mlt_terms_matches_bruteforce(spark, hl_idx):
    """mlt_terms == Python replay of MoreLikeThis.java:595-675 selection
    (tf >= min_term_freq, df >= min_doc_freq, rank tf * ClassicSimilarity
    idf, ties score DESC / term ASC, top max_query_terms)."""
    out, pdf = hl_idx
    s = IndexSearcher(spark, out)
    texts, tfs, dfc, dls = _brute(s, pdf)
    n = len(texts)

    seed = next(t for t in texts.values() if t.startswith("query alone"))
    stf = {}
    for t in analyze(seed):
        stf[t] = stf.get(t, 0) + 1
    min_tf, min_df, maxq = 1, 2, 5
    cand = [
        (stf[t] * (math.log((n + 1) / (dfc[t] + 1)) + 1.0), t)
        for t in stf
        if stf[t] >= min_tf and t in dfc and dfc[t] >= min_df
    ]
    cand.sort(key=lambda st: (-st[0], st[1]))
    exp = [t for _, t in cand[:maxq]]

    got = s.mlt_terms(
        seed, max_query_terms=maxq, min_term_freq=min_tf, min_doc_freq=min_df
    )
    assert got == exp

    # defaults: absent/low-df terms filtered, never more than the cap
    terms_default = s.mlt_terms(seed)
    assert len(terms_default) <= 25
    # corpus-scaled thresholds (the Lucene defaults assume a big index:
    # min_doc_freq=5 filters everything on a 63-doc corpus)
    hits = s.more_like_this(
        seed, k=5, min_term_freq=1, min_doc_freq=2
    ).collect()
    assert hits
    # the seed doc itself is a hit (not excluded, matching Lucene)
    seed_doc = next(d for d, t in texts.items() if t == seed)
    assert any(r["docID"] == seed_doc for r in hits)


def test_phrase_prefix_composition(spark, hl_idx):
    """search_phrase_prefix == expand_terms + search_multi_phrase by
    construction; the planted 'query index' adjacency makes 'query ind*'
    hit, an unmatched prefix returns empty, and the expansion respects
    the cap."""
    out, _ = hl_idx
    s = IndexSearcher(spark, out)

    exp = s.expand_terms(prefix="ind", top_terms=True)
    assert "index" in exp
    via_mp = {
        (r["docID"], r["score"])
        for r in s.search_multi_phrase([["query"], exp], k=10).collect()
    }
    got = {
        (r["docID"], r["score"])
        for r in s.search_phrase_prefix("query ind", k=10).collect()
    }
    assert got == via_mp and got  # the planted doc matches

    assert s.search_phrase_prefix("query zzzznope", k=5).count() == 0
    assert s.search_phrase_prefix("", k=5).count() == 0
    assert len(s.expand_terms(prefix="", max_expansions=3, top_terms=True)) == 3
