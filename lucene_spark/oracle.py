"""Straight-line numpy BM25 oracle over uncompressed postings.

This is the independent reference implementation used by the tests to
check the Spark engine for rank-identity, mirroring how the reference
validates pruned vs complete execution
(lucene/test-framework/src/java/org/apache/lucene/tests/search/CheckHits.java:222-246,
score tolerance 1e-6 at :223; tie-break score DESC then docID ASC per
lucene/core/src/java/org/apache/lucene/search/HitQueue.java:76-83).

It shares only the *kernels* (analyzer, byte4, BM25 formulas) with the
engine — the indexing/search dataflow is a deliberately naive in-memory
dict, no compression, no pruning, no Spark.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from lucene_spark.analysis import analyze
from lucene_spark.search.bm25 import BM25Scorer
from lucene_spark.util.smallfloat import int_to_byte4


class OracleIndex:
    def __init__(
        self,
        contents: list[str],
        doc_ids: list[int] | None = None,
        token_filters: tuple[str, ...] = (),
    ):
        """contents[i] is the raw text of docID doc_ids[i] (default i).
        ``token_filters`` replicates the index-side analyzer chain; a
        dropping filter (stop_en) removes the token but keeps its
        position slot (gaps) and shrinks dl to the emitted count —
        StopFilter + FieldInvertState semantics."""
        self.doc_ids = np.asarray(
            doc_ids if doc_ids is not None else range(len(contents)), dtype=np.int64
        )
        fns = []
        sh_n = None
        if token_filters:
            from lucene_spark.analysis.porter import (
                resolve_filter,
                split_chain,
            )

            vocab_chain, sh_n = split_chain(token_filters)
            fns = [resolve_filter(n) for n in vocab_chain]
        post: dict[str, dict[int, list[int]]] = defaultdict(dict)
        dls = np.zeros(len(contents), dtype=np.int64)
        for row, text in enumerate(contents):
            toks: list[str | None] = list(analyze(text))
            for fn in fns:
                toks = [fn(t) if t is not None else None for t in toks]
            if sh_n is not None:
                # stream shingling (drop-combos rejected by split_chain,
                # so no None slots here); gram position = gram slot —
                # the outputUnigrams=False ShingleFilter stream
                from lucene_spark.analysis.porter import shingle_tokens

                toks = shingle_tokens(toks, sh_n)
            dls[row] = sum(1 for t in toks if t is not None)
            for pos, t in enumerate(toks):
                if t is not None:
                    post[t].setdefault(row, []).append(pos)
        self.dl = dls
        self.norms = int_to_byte4(dls)
        self.postings = {
            t: (
                np.array(sorted(d.keys()), dtype=np.int64),
                np.array([len(d[r]) for r in sorted(d.keys())], dtype=np.int64),
                {r: np.array(p, dtype=np.int64) for r, p in d.items()},
            )
            for t, d in post.items()
        }
        self.doc_count = len(contents)
        self.sum_total_term_freq = int(dls.sum())
        self.sum_doc_freq = sum(len(v[0]) for v in self.postings.values())
        self.scorer = BM25Scorer.build(self.doc_count, self.sum_total_term_freq)

    # -- retrieval ---------------------------------------------------------

    def _term_scores(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """(row_indexes, float32 scores) for one term."""
        if term not in self.postings:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        rows, tfs, _ = self.postings[term]
        df = len(rows)
        scores = self.scorer.score(
            tfs.astype(np.float32), self.norms[rows], doc_freq=df
        )
        return rows, scores

    def search(self, terms: list[str], k: int = 10, mode: str = "or"):
        """Top-k [(docID, float32 score)] for an OR/AND bag of terms.

        Per-term float32 scores accumulate in float64 then cast to float32
        (DisjunctionSumScorer.java:40-46 / ConjunctionScorer.java:57-63).

        CONTRACT: repeated query terms are deduplicated and score ONCE —
        same as the engine (which weights by the unique-term dict). This
        diverges from Lucene's BooleanQuery, which keeps duplicate SHOULD
        clauses; asserted in tests/test_e2e_spark.py."""
        terms = list(dict.fromkeys(terms))
        acc = np.zeros(self.doc_count, dtype=np.float64)
        nmatch = np.zeros(self.doc_count, dtype=np.int64)
        present = [t for t in terms if t in self.postings]
        for t in terms:
            rows, scores = self._term_scores(t)
            acc[rows] += scores.astype(np.float64)
            nmatch[rows] += 1
        if mode == "and":
            # Lucene: a MUST clause on a nonexistent term matches nothing
            if len(present) < len(terms):
                return []
            mask = nmatch == len(terms)
        else:
            mask = nmatch > 0
        rows = np.flatnonzero(mask)
        if rows.size == 0:
            return []
        final = acc[rows].astype(np.float32)
        order = np.lexsort((self.doc_ids[rows], -final))
        top = order[:k]
        return [
            (int(self.doc_ids[rows[i]]), float(final[i])) for i in top
        ]

    def search_boolean(
        self,
        should: list[str] | None = None,
        must: list[str] | None = None,
        must_not: list[str] | None = None,
        min_should_match: int = 0,
        k: int = 10,
    ):
        """BooleanQuery reference: MUST all required, SHOULD optional with
        >= min_should_match, MUST_NOT excluded unscored."""
        must = must or []
        should = should or []
        must_not = must_not or []
        if any(t not in self.postings for t in must):
            return []
        acc = np.zeros(self.doc_count, dtype=np.float64)
        nreq = np.zeros(self.doc_count, dtype=np.int64)
        nopt = np.zeros(self.doc_count, dtype=np.int64)
        for t in set(must):
            rows, scores = self._term_scores(t)
            acc[rows] += scores.astype(np.float64)
            nreq[rows] += 1
        for t in should:
            rows, scores = self._term_scores(t)
            acc[rows] += scores.astype(np.float64)
            nopt[rows] += 1
        mask = np.ones(self.doc_count, dtype=bool)
        if must:
            mask &= nreq == len(set(must))
        else:
            mask &= nopt > 0
        if min_should_match > 0:
            mask &= nopt >= min_should_match
        for t in must_not:
            if t in self.postings:
                mask[self.postings[t][0]] = False
        rows = np.flatnonzero(mask)
        if rows.size == 0:
            return []
        final = acc[rows].astype(np.float32)
        order = np.lexsort((self.doc_ids[rows], -final))[:k]
        return [(int(self.doc_ids[rows[i]]), float(final[i])) for i in order]

    def search_dismax(self, queries: list[list[str]], tie_breaker: float = 0.0, k: int = 10):
        """DisjunctionMax reference: per-subquery OR sums, combined as
        max + tieBreaker * (sum - max)."""
        subs = np.zeros((len(queries), self.doc_count), dtype=np.float64)
        matched = np.zeros(self.doc_count, dtype=bool)
        for qi, terms in enumerate(queries):
            for t in terms:
                rows, scores = self._term_scores(t)
                subs[qi, rows] += scores.astype(np.float64)
                matched[rows] = True
        rows = np.flatnonzero(matched)
        if rows.size == 0:
            return []
        mx = subs[:, rows].max(axis=0)
        sm = subs[:, rows].sum(axis=0)
        final = (mx + tie_breaker * (sm - mx)).astype(np.float32)
        order = np.lexsort((self.doc_ids[rows], -final))[:k]
        return [(int(self.doc_ids[rows[i]]), float(final[i])) for i in order]

    def search_synonym(self, terms: list[str], k: int = 10):
        """SynonymQuery reference: union postings as one pseudo-term —
        tf summed, norm = min over contributing terms' norms per doc
        (same doc => same norm anyway), df = |union|."""
        tf_by_row: dict[int, int] = {}
        for t in terms:
            if t not in self.postings:
                continue
            rows, tfs, _ = self.postings[t]
            for r, f in zip(rows, tfs):
                tf_by_row[int(r)] = tf_by_row.get(int(r), 0) + int(f)
        if not tf_by_row:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        rows = np.array(sorted(tf_by_row.keys()), dtype=np.int64)
        f = np.array([tf_by_row[int(r)] for r in rows], dtype=np.float32)
        w = np.float32(idf(len(rows), self.doc_count))
        scores = score_term(f, self.norms[rows], w, self.scorer.cache)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]

    def search_blended(
        self, terms: list[str], k: int = 10, tie_breaker: float = 0.01
    ):
        """BlendedTermQuery reference: every term scored with one BLENDED
        df — the max df across the terms (BlendedTermQuery.java:283-291) —
        then combined as DisjunctionMax(tie_breaker) like the default
        DISJUNCTION_MAX_REWRITE."""
        present = [t for t in terms if t in self.postings]
        if not present:
            return []
        df_blend = max(len(self.postings[t][0]) for t in present)
        mx = np.zeros(self.doc_count, dtype=np.float64)
        sm = np.zeros(self.doc_count, dtype=np.float64)
        matched = np.zeros(self.doc_count, dtype=bool)
        for t in present:
            rows, tfs, _ = self.postings[t]
            sc = self.scorer.score(
                tfs.astype(np.float32), self.norms[rows], doc_freq=df_blend
            ).astype(np.float64)
            mx[rows] = np.maximum(mx[rows], sc)
            sm[rows] += sc
            matched[rows] = True
        rows = np.flatnonzero(matched)
        final = (mx[rows] + tie_breaker * (sm[rows] - mx[rows])).astype(
            np.float32
        )
        order = np.lexsort((self.doc_ids[rows], -final))[:k]
        return [(int(self.doc_ids[rows[i]]), float(final[i])) for i in order]

    def sloppy_freqs(self, terms: list[str], slop: int) -> dict[int, float]:
        """row -> sloppy float freq. SPEC (shared with the engine's
        vectorized matcher): greedy minimal-window sweep over
        offset-adjusted position lists — one pointer per phrase position;
        evaluate the current window, count weight 1/(1+matchLength) when
        max-min <= slop, always advance the minimum pointer; slop=0
        degenerates to exact-alignment counting (ExactPhraseMatcher
        freqs). One pointer list per PHRASE POSITION, so windows may
        reuse a source token for repeated terms (documented deviation
        from Lucene's repeat-group machinery)."""
        if any(t not in self.postings for t in terms):
            return {}
        rowsets = [set(self.postings[t][0].tolist()) for t in terms]
        cand = set.intersection(*rowsets)
        out: dict[int, float] = {}
        for r in cand:
            lists = [
                (self.postings[t][2][r] - i).tolist()
                for i, t in enumerate(terms)
            ]
            ptr = [0] * len(lists)
            freq = 0.0
            while True:
                vals = [lists[i][ptr[i]] for i in range(len(lists))]
                span = max(vals) - min(vals)
                if span <= slop:
                    freq += 1.0 / (1.0 + float(span))
                adv = min(range(len(lists)), key=lambda i: vals[i])
                ptr[adv] += 1
                if ptr[adv] >= len(lists[adv]):
                    break
            if freq > 0:
                out[r] = freq
        return out

    def search_sloppy(self, terms: list[str], slop: int, k: int = 10):
        freqs = self.sloppy_freqs(terms, slop)
        if not freqs:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        w = np.float32(0.0)
        for t in terms:
            w = np.float32(w + idf(len(self.postings[t][0]), self.doc_count))
        rows = np.array(sorted(freqs.keys()), dtype=np.int64)
        f = np.array([freqs[int(r)] for r in rows], dtype=np.float32)
        scores = score_term(f, self.norms[rows], w, self.scorer.cache)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]

    def multi_phrase_freqs(self, alts: list[list[str]]) -> dict[int, int]:
        """row -> exact alignments where slot i matches ANY of alts[i]
        (MultiPhraseQuery); per-slot positions are the union of the
        alternatives' position lists."""
        alts_present = [[t for t in slot if t in self.postings] for slot in alts]
        if any(not slot for slot in alts_present):
            return {}
        slot_rows = [
            set().union(*(set(self.postings[t][0].tolist()) for t in slot))
            for slot in alts_present
        ]
        cand = set.intersection(*slot_rows)
        out = {}
        for r in cand:
            unions = []
            okdoc = True
            for slot in alts_present:
                ps = [self.postings[t][2][r] for t in slot if r in self.postings[t][2]]
                if not ps:
                    okdoc = False
                    break
                unions.append(np.sort(np.concatenate(ps)))
            if not okdoc:
                continue
            base = unions[0]
            ok = np.ones(base.shape, dtype=bool)
            for i in range(1, len(unions)):
                ok &= np.isin(base + i, unions[i])
            freq = int(ok.sum())
            if freq:
                out[r] = freq
        return out

    def search_multi_phrase(self, alts: list[list[str]], k: int = 10):
        freqs = self.multi_phrase_freqs(alts)
        if not freqs:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        w = np.float32(0.0)
        for slot in alts:
            for t in slot:
                if t in self.postings:
                    w = np.float32(w + idf(len(self.postings[t][0]), self.doc_count))
        rows = np.array(sorted(freqs.keys()), dtype=np.int64)
        f = np.array([freqs[int(r)] for r in rows], dtype=np.float32)
        scores = score_term(f, self.norms[rows], w, self.scorer.cache)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]

    def search_combined_field(
        self,
        terms: list[str],
        k: int = 10,
        title_len: int = 8,
        title_weight: float = 2.0,
        body_weight: float = 1.0,
    ):
        """CombinedFieldQuery / BM25F over the title/body positional
        slices (mirror of engine.search_combined_field)."""
        terms = list(dict.fromkeys(terms))
        present = [t for t in terms if t in self.postings]
        if not present:
            return []
        wt, wb, tl = float(title_weight), float(body_weight), int(title_len)
        dl = self.dl.astype(np.float64)
        dl_c = wt * np.minimum(dl, tl) + wb * np.maximum(dl - tl, 0.0)
        avgdl_c = float(dl_c.sum()) / max(1, self.doc_count)
        from lucene_spark.search.bm25 import idf

        acc = np.zeros(self.doc_count, dtype=np.float64)
        hitmask = np.zeros(self.doc_count, dtype=bool)
        k1v = np.float32(self.scorer.k1)
        bv = np.float32(self.scorer.b)
        av = np.float32(avgdl_c)
        for t in present:
            rows, _, posmap = self.postings[t]
            w = np.float32(idf(len(rows), self.doc_count))
            tf_t = np.array(
                [(posmap[int(r)] < tl).sum() for r in rows], dtype=np.float64
            )
            tf_all = np.array([posmap[int(r)].size for r in rows], dtype=np.float64)
            tf_c = (wt * tf_t + wb * (tf_all - tf_t)).astype(np.float32)
            dlc32 = dl_c[rows].astype(np.float32)
            inv = np.float32(1.0) / (k1v * (np.float32(1.0) - bv + bv * dlc32 / av))
            sc = (w - w / (np.float32(1.0) + tf_c * inv)).astype(np.float32)
            acc[rows] += sc.astype(np.float64)
            hitmask[rows] = True
        rows = np.flatnonzero(hitmask)
        final = acc[rows].astype(np.float32)
        order = np.lexsort((self.doc_ids[rows], -final))[:k]
        return [(int(self.doc_ids[rows[i]]), float(final[i])) for i in order]

    def interval_counts(
        self,
        terms: list[str],
        max_gaps: int = 0,
        ordered: bool = True,
        containing: str | None = None,
        not_containing: str | None = None,
        before: str | None = None,
        after: str | None = None,
        max_width: int | None = None,
    ) -> dict[int, int]:
        """row -> number of MINIMAL intervals spanning all terms with
        total gaps <= max_gaps (Intervals.maxgaps); with `containing`,
        only intervals holding >= 1 occurrence of that term count
        (Intervals.containing); `not_containing` is the complement
        (Intervals.notContaining — an absent subtrahend subtracts
        nothing); `before`/`after` keep intervals with some same-doc
        occurrence strictly after the end / before the start
        (Intervals.before/after); `max_width` keeps intervals with
        extent end-start+1 <= w (Intervals.maxwidth). Reference
        implementation with explicit per-doc loops."""
        conj = [t for t in (containing, before, after) if t is not None]
        if any(t not in self.postings for t in terms + conj):
            return {}
        if not_containing is not None and not_containing not in self.postings:
            not_containing = None
        rowsets = [set(self.postings[t][0].tolist()) for t in terms + conj]
        cand = set.intersection(*rowsets)
        out: dict[int, int] = {}
        n = len(terms)
        for r in cand:
            lists = [self.postings[t][2][r] for t in terms]
            intervals = []
            if ordered:
                for p1 in lists[0]:
                    cur = p1
                    okc = True
                    for li in range(1, n):
                        nxt = lists[li][lists[li] > cur]
                        if nxt.size == 0:
                            okc = False
                            break
                        cur = int(nxt[0])
                    if okc:
                        intervals.append((int(p1), cur))
                # minimal: last start per distinct end
                by_end: dict[int, int] = {}
                for s, e in intervals:
                    by_end[e] = max(by_end.get(e, s), s)
                def _fpos(t):
                    if t is None:
                        return None
                    return self.postings[t][2].get(r)

                inner_pos = _fpos(containing)
                nc_pos = _fpos(not_containing)
                bef_pos = _fpos(before)
                aft_pos = _fpos(after)
                cnt = sum(
                    1
                    for e, s in by_end.items()
                    if (e - s) - (n - 1) <= max_gaps
                    and (max_width is None or e - s + 1 <= max_width)
                    and (
                        inner_pos is None
                        or bool(((inner_pos >= s) & (inner_pos <= e)).any())
                    )
                    and (
                        nc_pos is None
                        or not bool(((nc_pos >= s) & (nc_pos <= e)).any())
                    )
                    and (bef_pos is None or bool((bef_pos > e).any()))
                    and (aft_pos is None or bool((aft_pos < s).any()))
                )
            else:
                # greedy sweep windows; minimal = last window per end
                plists = [pl.tolist() for pl in lists]
                ptr = [0] * n
                windows = []
                while True:
                    vals = [plists[i][ptr[i]] for i in range(n)]
                    windows.append((min(vals), max(vals)))
                    adv = min(range(n), key=lambda i: vals[i])
                    ptr[adv] += 1
                    if ptr[adv] >= len(plists[adv]):
                        break
                by_end2: dict[int, int] = {}
                for s, e in windows:
                    by_end2[e] = max(by_end2.get(e, s), s)
                cnt = sum(
                    1
                    for e, s in by_end2.items()
                    if (e - s) - (n - 1) <= max_gaps
                    and (max_width is None or e - s + 1 <= max_width)
                )
            if cnt:
                out[r] = cnt
        return out

    def phrase_freqs(self, terms: list[str]) -> dict[int, int]:
        """row -> exact-phrase occurrence count (ExactPhraseMatcher.java:37-167)."""
        if any(t not in self.postings for t in terms):
            return {}
        rowsets = [set(self.postings[t][0].tolist()) for t in terms]
        cand = set.intersection(*rowsets)
        out = {}
        for r in cand:
            base = self.postings[terms[0]][2][r]
            ok = np.ones(base.shape, dtype=bool)
            for i, t in enumerate(terms[1:], start=1):
                nxt = self.postings[t][2][r]
                ok &= np.isin(base + i, nxt)
            freq = int(ok.sum())
            if freq:
                out[r] = freq
        return out

    def search_phrase(self, terms: list[str], k: int = 10):
        """Top-k for an exact phrase: freq = #occurrences, weight uses the
        summed idf of the phrase's terms (PhraseWeight / idfExplain over
        TermStatistics[], BM25Similarity.java idfExplain(termStats[]))."""
        freqs = self.phrase_freqs(terms)
        if not freqs:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        w = np.float32(0.0)
        for t in terms:
            w = np.float32(w + idf(len(self.postings[t][0]), self.doc_count))
        rows = np.array(sorted(freqs.keys()), dtype=np.int64)
        f = np.array([freqs[int(r)] for r in rows], dtype=np.float32)
        scores = score_term(f, self.norms[rows], w, self.scorer.cache)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]


    def span_freqs(
        self,
        terms: list[str],
        first_end: int | None = None,
        exclude: str | None = None,
        pre: int = 0,
        post: int = 0,
        first_start: int | None = None,
    ) -> dict[int, int]:
        """row -> surviving-span count for an exact include span under the
        SpanFirstQuery end limit and/or SpanNotQuery pre/post exclusion
        (queries/spans/SpanFirstQuery.java:35, SpanNotQuery.java:198-214:
        a span [s, s+L) dies if an exclude occurrence q lies in
        [s-pre, s+L+post-1])."""
        if any(t not in self.postings for t in terms):
            return {}
        rowsets = [set(self.postings[t][0].tolist()) for t in terms]
        cand = set.intersection(*rowsets)
        L = len(terms)
        out: dict[int, int] = {}
        for r in cand:
            base = self.postings[terms[0]][2][r]
            ok = np.ones(base.shape, dtype=bool)
            for i, t in enumerate(terms[1:], start=1):
                ok &= np.isin(base + i, self.postings[t][2][r])
            if first_end is not None:
                ok &= base + L <= first_end
            if first_start is not None:
                ok &= base >= first_start
            if exclude is not None and exclude in self.postings:
                xmap = self.postings[exclude][2]
                if r in xmap:
                    x = xmap[r]
                    for j in np.flatnonzero(ok):
                        s = int(base[j])
                        if np.any((x >= s - pre) & (x <= s + L + post - 1)):
                            ok[j] = False
            freq = int(ok.sum())
            if freq:
                out[r] = freq
        return out

    def search_spans(
        self,
        terms: list[str],
        k: int = 10,
        first_end: int | None = None,
        exclude: str | None = None,
        pre: int = 0,
        post: int = 0,
        first_start: int | None = None,
    ):
        """Top-k for a span query: freq = surviving spans, weight = summed
        include-term idf (SpanNotWeight scores from the include side
        only)."""
        freqs = self.span_freqs(
            terms, first_end, exclude, pre, post, first_start
        )
        if not freqs:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        w = np.float32(0.0)
        for t in terms:
            w = np.float32(w + idf(len(self.postings[t][0]), self.doc_count))
        rows = np.array(sorted(freqs.keys()), dtype=np.int64)
        f = np.array([freqs[int(r)] for r in rows], dtype=np.float32)
        scores = score_term(f, self.norms[rows], w, self.scorer.cache)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]

    def span_near_unordered_freqs(
        self, terms: list[str], slop: int
    ) -> dict[int, float]:
        """row -> float sloppy freq for an UNORDERED SpanNearQuery
        (spans/NearSpansUnordered.java): heap-sweep replica — every
        element of every clause list becomes the window minimum once;
        the state's width = maxEnd - minStart over the current heads
        (first head at-or-after / strictly-after by list order), matches
        when width - totalSpanLength <= slop (atMatch:83-85), and each
        MATCHING state adds 1/(1+width)
        (SpanScorer.setFreqCurrentDoc:112 + width():136)."""
        norm = self._norm_span_clauses(terms)
        if norm is None:
            return {}
        rowsets = [self._clause_rowset(c) for c in norm]
        cand = set.intersection(*rowsets)
        n = len(norm)
        out: dict[int, float] = {}
        for r in cand:
            lists = [self._clause_pos(c, r) for c in norm]
            freq = 0.0
            for i, li in enumerate(lists):
                for e in li.tolist():
                    wmax = e
                    dead = False
                    for j, lj in enumerate(lists):
                        if j == i:
                            continue
                        heads = lj[lj > e] if j < i else lj[lj >= e]
                        if heads.size == 0:
                            dead = True
                            break
                        wmax = max(wmax, int(heads[0]))
                    if dead:
                        continue
                    width = wmax + 1 - e
                    if width - n <= slop:
                        freq += 1.0 / (1.0 + width)
            if freq > 0:
                out[r] = freq
        return out

    def search_span_near_unordered(self, terms: list[str], slop: int, k: int = 10):
        freqs = self.span_near_unordered_freqs(terms, slop)
        if not freqs:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        norm = self._norm_span_clauses(terms) or []
        w = np.float32(0.0)
        for t in dict.fromkeys(t for c in norm for t in c):
            w = np.float32(w + idf(len(self.postings[t][0]), self.doc_count))
        rows = np.array(sorted(freqs.keys()), dtype=np.int64)
        f = np.array([freqs[int(r)] for r in rows], dtype=np.float32)
        scores = score_term(f, self.norms[rows], w, self.scorer.cache)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]

    def _norm_span_clauses(self, clauses) -> list[tuple[str, ...]] | None:
        """Span clause normalization (SpanMultiTermQueryWrapper replica):
        str = one term, tuple/list = alternatives merged into one SpanOr
        clause. Absent members drop; a fully-absent clause returns None
        (the whole near can't match)."""
        out: list[tuple[str, ...]] = []
        for c in clauses:
            c = (c,) if isinstance(c, str) else tuple(c)
            pres = tuple(t for t in c if t in self.postings)
            if not pres:
                return None
            out.append(pres)
        return out

    def _clause_rowset(self, clause: tuple[str, ...]) -> set:
        s: set = set()
        for t in clause:
            s |= set(self.postings[t][0].tolist())
        return s

    def _clause_pos(self, clause: tuple[str, ...], r: int) -> np.ndarray:
        arrs = [
            self.postings[t][2][r] for t in clause if r in self.postings[t][2]
        ]
        if len(arrs) == 1:
            return arrs[0]
        return np.sort(np.concatenate(arrs))

    def span_near_freqs(
        self,
        terms: list[str],
        slop: int,
        contain: str | None = None,
        contain_mode: str = "containing",
    ) -> dict[int, float]:
        """row -> float sloppy freq for an ordered SpanNearQuery
        (spans/NearSpansOrdered.java): for EVERY occurrence p1 of the
        first clause, stretch each later clause to its first position
        strictly after the previous (start_{i+1} >= end_i); a chain with
        matchWidth = (p_n - p_1) - (n-1) <= slop contributes
        1/(1+matchWidth) (SpanScorer.setFreqCurrentDoc:112).

        contain='t' with contain_mode='containing' keeps only big spans
        holding an occurrence of t in [p_1, p_n] (ContainSpans); with
        'within' the freq instead counts occurrences of t covered by a
        valid big span, 1 each (SpanWithinQuery; a term span has width
        0)."""
        norm = self._norm_span_clauses(terms)
        if norm is None or (contain and contain not in self.postings):
            return {}
        rowsets = [self._clause_rowset(c) for c in norm] + (
            [set(self.postings[contain][0].tolist())] if contain else []
        )
        cand = set.intersection(*rowsets)
        out: dict[int, float] = {}
        for r in cand:
            base = self._clause_pos(norm[0], r)
            spans: list[tuple[int, int]] = []  # (start, end) valid chains
            freq = 0.0
            for p1 in base.tolist():
                cur = p1
                dead = False
                for c in norm[1:]:
                    lst = self._clause_pos(c, r)
                    nxt = lst[lst > cur]
                    if nxt.size == 0:
                        dead = True
                        break
                    cur = int(nxt[0])
                if dead:
                    continue
                width = (cur - p1) - (len(terms) - 1)
                if width > slop:
                    continue
                if contain and contain_mode == "containing":
                    cpos = self.postings[contain][2][r]
                    if not np.any((cpos >= p1) & (cpos <= cur)):
                        continue
                spans.append((p1, cur))
                freq += 1.0 / (1.0 + width)
            if contain and contain_mode == "within":
                cpos = self.postings[contain][2][r]
                freq = float(
                    sum(
                        1
                        for q in cpos.tolist()
                        if any(s <= q <= e for s, e in spans)
                    )
                )
            if freq > 0:
                out[r] = freq
        return out

    def search_span_near(
        self,
        terms: list[str],
        slop: int,
        k: int = 10,
        contain: str | None = None,
        contain_mode: str = "containing",
    ):
        """Top-k for SpanNear / SpanContaining / SpanWithin: float freq
        from span_near_freqs, weight = summed idf over DISTINCT terms of
        both sides (SpanWeight.buildSimWeight iterates the deduplicated
        termStates map)."""
        freqs = self.span_near_freqs(terms, slop, contain, contain_mode)
        if not freqs:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        norm = self._norm_span_clauses(terms) or []
        flat = [t for c in norm for t in c] + ([contain] if contain else [])
        w = np.float32(0.0)
        for t in dict.fromkeys(flat):
            w = np.float32(w + idf(len(self.postings[t][0]), self.doc_count))
        rows = np.array(sorted(freqs.keys()), dtype=np.int64)
        f = np.array([freqs[int(r)] for r in rows], dtype=np.float32)
        scores = score_term(f, self.norms[rows], w, self.scorer.cache)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]

    def search_span_or(self, terms: list[str], k: int = 10):
        """SpanOrQuery replica (spans/SpanOrQuery.java): freq = TOTAL tf
        of present clause terms (every occurrence is a width-0 span, slop
        factor 1), scored once with weight = summed idf of the present
        distinct terms."""
        present = [t for t in dict.fromkeys(terms) if t in self.postings]
        if not present:
            return []
        from lucene_spark.search.bm25 import idf, score_term

        w = np.float32(0.0)
        freq = np.zeros(self.doc_count, dtype=np.int64)
        for t in present:
            rows, tfs, _ = self.postings[t]
            freq[rows] += tfs
            w = np.float32(w + idf(len(rows), self.doc_count))
        rows = np.flatnonzero(freq > 0)
        scores = score_term(
            freq[rows].astype(np.float32), self.norms[rows], w, self.scorer.cache
        )
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]

    def search_common_terms(
        self,
        terms: list[str],
        max_term_frequency: float = 0.01,
        low_freq_occur: str = "should",
        high_freq_occur: str = "should",
        low_msm: float = 0.0,
        high_msm: float = 0.0,
        k: int = 10,
    ):
        """CommonTermsQuery replica (queries/CommonTermsQuery.java:130-205):
        df-threshold split, required low clause + optional high clause,
        all-high conjunction rewrite, Java Math.round fractional msm."""
        import math

        if len(terms) == 1:
            return self.search(terms, k=k)
        uniq = list(dict.fromkeys(terms))
        mtf = float(max_term_frequency)
        ceil_cut = int(math.ceil(mtf * float(self.doc_count)))
        low, high = [], []
        for t in uniq:
            df = len(self.postings[t][0]) if t in self.postings else 0
            if df and ((mtf >= 1.0 and df > mtf) or df > ceil_cut):
                high.append(t)
            else:
                low.append(t)

        def _msm(f: float, n_opt: int) -> int:
            if f >= 1.0 or f == 0.0:
                return int(f)
            return int(math.floor(f * n_opt + 0.5))

        low_occ, high_occ = low_freq_occur, high_freq_occur
        low_req = _msm(low_msm, len(low)) if (low_occ == "should" and low) else 0
        high_req = _msm(high_msm, len(high)) if (high_occ == "should" and high) else 0
        if not low and high_req == 0 and high_occ != "must":
            high_occ = "must"

        acc = np.zeros(self.doc_count, dtype=np.float64)
        low_cnt = np.zeros(self.doc_count, dtype=np.int64)
        high_sum = np.zeros(self.doc_count, dtype=np.float64)
        high_cnt = np.zeros(self.doc_count, dtype=np.int64)
        for t in low:
            rows, scores = self._term_scores(t)
            acc[rows] += scores.astype(np.float64)
            low_cnt[rows] += 1
        for t in high:
            rows, scores = self._term_scores(t)
            high_sum[rows] += scores.astype(np.float64)
            high_cnt[rows] += 1
        high_match = (
            high_cnt == len(high) if high_occ == "must" else high_cnt >= max(high_req, 1)
        )
        if low:
            mask = (
                low_cnt == len(low)
                if low_occ == "must"
                else low_cnt >= max(low_req, 1)
            )
            total = acc + np.where(high_match, high_sum, 0.0)
        else:
            mask = high_match & (len(high) > 0)
            total = high_sum
        rows = np.flatnonzero(mask)
        if rows.size == 0:
            return []
        scores = total[rows].astype(np.float32)
        order = np.lexsort((self.doc_ids[rows], -scores))[:k]
        return [(int(self.doc_ids[rows[i]]), float(scores[i])) for i in order]


def assert_rank_identical(expected, got, tol=1e-6, msg=""):
    """CheckHits.checkEqual analog: same docIDs in same order, scores
    within tol."""
    exp_ids = [d for d, _ in expected]
    got_ids = [d for d, _ in got]
    assert exp_ids == got_ids, f"{msg} docID ranks differ:\n exp {expected}\n got {got}"
    for (d, es), (_, gs) in zip(expected, got):
        assert abs(es - gs) <= tol * max(1.0, abs(es)), (
            f"{msg} score mismatch doc {d}: {es} vs {gs}"
        )
