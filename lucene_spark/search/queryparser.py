"""Classic query-string parser + boolean executor (SURVEY.md §3.3).

Grammar — the slice of Lucene's classic QueryParser that covers the
reference benchmark query files (lucene/benchmark/conf/query-terms.txt,
query-phrases.txt, query-wildcards.txt; full grammar in
lucene/queryparser/.../classic/package-info.java):

    term                   analyzed term
    wild*                  prefix wildcard (expanded against the term
                           dictionary, scoring-boolean rewrite)
    "a phrase"             exact phrase
    "a phrase"~N           sloppy phrase with slop N
    term~ / term~N         fuzzy (Levenshtein <= N, default 2, pruned
                           dictionary expansion, top-df rewrite)
    [a TO b] / {a TO b}    term range, inclusive / exclusive endpoints
    /regex/                regexp query (whole-term match)
    clause^B               boost: leaf scores multiplied by B (applies
                           to terms, phrases, ranges, regexps, groups)
    a AND b / a && b       both operands become MUST
    a OR b  / a || b       SHOULD
    NOT a / -a             MUST_NOT
    +a                     MUST
    ( ... )                grouping, one BooleanQuery per paren level
    field:term             field prefix stripped (single-field engine)

Occur assignment mirrors the classic parser: clauses default to SHOULD;
an AND connector promotes BOTH neighbors to MUST; OR resets to SHOULD.

Execution: every leaf produces its full scored doc set (float32 BM25,
same kernels as IndexSearcher); a boolean level unions its children and
aggregates — docs must match every MUST child (count of distinct MUST
children == n), match >= 1 SHOULD when no MUST exists, and not match any
MUST_NOT; the score is the double-sum of matching children's float32
scores (DisjunctionSumScorer semantics), each multiplied by its boost.
Multi-term leaves (wildcard, fuzzy, range, regexp) rewrite to a sum of
per-term BM25 scores over the bounded expansion (scoring-boolean
rewrite; fuzzy keeps the top-df terms like TopTermsRewrite but scores
them unblended — documented deviation from BlendedTermQuery-style fuzzy
scoring). Top-k: score DESC, docID ASC.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType

from lucene_spark.analysis import analyze, lowercase

_LEX_RE = re.compile(
    r'"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?'   # phrase[~slop][^boost]
    r"|[\[\{][^\]\}]*[\]\}](?:\^\d+(?:\.\d+)?)?"  # [a TO b] / {a TO b}
    r"|/[^/\s]+/(?:\^\d+(?:\.\d+)?)?"          # /regex/[^boost]
    r"|\(|\)|&&|\|\|"
    r"|\S+?(?=[()\s]|$)"
)

_BOOST_SUF = re.compile(r"\^(\d+(?:\.\d+)?)$")
_SLOP_SUF = re.compile(r"~(\d+)$")
_FUZZY_SUF = re.compile(r"~(\d*)$")
_RANGE_RE = re.compile(r"^([\[\{])\s*(\S+)\s+TO\s+(\S+)\s*([\]\}])$")

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


@dataclass
class Clause:
    occur: str
    node: "Node"


@dataclass
class Node:
    kind: str   # 'term'|'wild'|'phrase'|'sloppy'|'fuzzy'|'range'|'regexp'|'bool'
    terms: list[str] = field(default_factory=list)
    clauses: list[Clause] = field(default_factory=list)
    slop: int = 0           # sloppy phrase slop / fuzzy max_edits
    boost: float = 1.0
    lo: str | None = None   # range endpoints
    hi: str | None = None
    include_lo: bool = True
    include_hi: bool = True


def _lex(q: str) -> list[str]:
    return [t for t in _LEX_RE.findall(q) if t.strip()]


def _strip_boost(tok: str) -> tuple[str, float]:
    m = _BOOST_SUF.search(tok)
    if m and len(m.group(0)) < len(tok):
        return tok[: m.start()], float(m.group(1))
    return tok, 1.0


def parse(query: str) -> Node:
    toks = _lex(query)
    pos = 0

    def parse_level() -> Node:
        nonlocal pos
        out = Node("bool")
        pending: str | None = None
        while pos < len(toks):
            tok = toks[pos]
            if tok == ")":
                pos += 1
                break
            pos += 1
            if tok in ("AND", "&&"):
                pending = "AND"
                if out.clauses and out.clauses[-1].occur == SHOULD:
                    out.clauses[-1].occur = MUST
                continue
            if tok in ("OR", "||"):
                pending = "OR"
                continue
            if tok == "NOT":
                pending = "NOT"
                continue
            # group boost: `( ... )^2` lexes the suffix as its own token
            if tok.startswith("^") and out.clauses:
                m = _BOOST_SUF.match(tok)
                if m:
                    out.clauses[-1].node.boost *= float(m.group(1))
                    continue

            prefix = ""
            if tok and tok[0] in "+-" and len(tok) > 1:
                prefix, tok = tok[0], tok[1:]

            if tok == "(":
                node = parse_level()
            elif tok.startswith('"'):
                tok, boost = _strip_boost(tok)
                slop = 0
                m = _SLOP_SUF.search(tok)
                if m and tok.endswith('"') is False:
                    slop = int(m.group(1))
                    tok = tok[: m.start()]
                terms = analyze(tok.strip('"'))
                if not terms:
                    pending = None
                    continue
                node = (
                    Node("sloppy", terms=terms, slop=slop, boost=boost)
                    if slop > 0 and len(terms) > 1
                    else Node("phrase", terms=terms, boost=boost)
                )
            elif _RANGE_RE.match(_strip_boost(tok)[0]):
                stripped, boost = _strip_boost(tok)
                m = _RANGE_RE.match(stripped)
                node = Node(
                    "range",
                    lo=lowercase(m.group(2)),
                    hi=lowercase(m.group(3)),
                    include_lo=m.group(1) == "[",
                    include_hi=m.group(4) == "]",
                    boost=boost,
                )
            elif tok.startswith("/") and _strip_boost(tok)[0].endswith("/"):
                stripped, boost = _strip_boost(tok)
                node = Node("regexp", terms=[stripped[1:-1]], boost=boost)
            else:
                if ":" in tok and not tok.startswith(":"):
                    fieldname, rest = tok.split(":", 1)
                    if fieldname.isalnum():
                        tok = rest
                tok, boost = _strip_boost(tok)
                fz = _FUZZY_SUF.search(tok)
                if fz and len(fz.group(0)) < len(tok):
                    stem = analyze(tok[: fz.start()])
                    if not stem:
                        pending = None
                        continue
                    edits = int(fz.group(1)) if fz.group(1) else 2
                    node = Node("fuzzy", terms=[stem[0]], slop=edits, boost=boost)
                elif tok.endswith("*") and len(tok) > 1 and "*" not in tok[:-1]:
                    stem = analyze(tok[:-1])
                    if not stem:
                        pending = None
                        continue
                    node = Node("wild", terms=[stem[0]], boost=boost)
                else:
                    terms = analyze(tok)
                    if not terms:
                        pending = None
                        continue
                    node = (
                        Node("term", terms=terms, boost=boost)
                        if len(terms) == 1
                        else Node(
                            "bool",
                            boost=boost,
                            clauses=[Clause(SHOULD, Node("term", terms=[t])) for t in terms],
                        )
                    )

            if prefix == "-" or pending == "NOT":
                occur = MUST_NOT
            elif prefix == "+" or pending == "AND":
                occur = MUST
            else:
                occur = SHOULD
            out.clauses.append(Clause(occur, node))
            pending = None
        return out

    root = parse_level()
    # collapse single-clause SHOULD/MUST wrapper (keep any group boost)
    while (
        root.kind == "bool"
        and len(root.clauses) == 1
        and root.clauses[0].occur != MUST_NOT
    ):
        inner = root.clauses[0].node
        inner.boost *= root.boost
        root = inner
    return root


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

def _expansion_scores(searcher, expanded: list[str]) -> DataFrame | None:
    """Sum of per-term BM25 over a bounded multi-term expansion
    (scoring-boolean rewrite)."""
    if not expanded:
        return None
    stats = searcher.term_stats(expanded)
    return (
        searcher._scored_postings(expanded, stats)
        .groupBy("docID")
        .agg(F.sum(F.col("score").cast(DoubleType())).alias("score"))
    )


def _leaf_scores(searcher, node: Node) -> DataFrame | None:
    """Full (docID, score:double) set for a leaf. None => matches nothing.
    Applies the node's boost multiplicatively on the way out."""
    if node.kind == "term":
        t = node.terms[0]
        stats = searcher.term_stats([t])
        if t not in stats:
            return None
        scored = (
            searcher._scored_postings([t], stats)
            .select("docID", F.col("score").cast(DoubleType()).alias("score"))
        )
    elif node.kind == "wild":
        # bounded expansion: keep the highest-df terms under the clause
        # cap instead of collecting an unbounded dictionary slice
        # (TopTermsRewrite behavior for scoring multi-term queries)
        scored = _expansion_scores(
            searcher, searcher.expand_terms(prefix=node.terms[0], top_terms=True)
        )
    elif node.kind == "fuzzy":
        scored = _expansion_scores(
            searcher, searcher.expand_fuzzy(node.terms[0], max_edits=node.slop)
        )
    elif node.kind == "range":
        scored = _expansion_scores(
            searcher,
            searcher.expand_terms(
                lo=node.lo,
                hi=node.hi,
                include_lo=node.include_lo,
                include_hi=node.include_hi,
                top_terms=True,
            ),
        )
    elif node.kind == "regexp":
        # RegexpQuery matches the WHOLE term; full-match mode also pushes
        # the pattern's literal prefix into the dictionary scan
        scored = _expansion_scores(
            searcher,
            searcher.expand_terms(
                regex=node.terms[0], regex_full_match=True, top_terms=True
            ),
        )
    elif node.kind == "phrase":
        scored = searcher.phrase_scores(node.terms)
        if scored is not None:
            scored = scored.select(
                "docID", F.col("score").cast(DoubleType()).alias("score")
            )
    elif node.kind == "sloppy":
        scored = searcher.sloppy_scores(node.terms, node.slop)
        if scored is not None:
            scored = scored.select(
                "docID", F.col("score").cast(DoubleType()).alias("score")
            )
    elif node.kind == "all":
        # MatchAllDocsQuery: every live doc at score == boost
        scored = searcher.match_all_scores().select(
            "docID", F.col("score").cast(DoubleType()).alias("score")
        )
    else:
        scored = _bool_scores(searcher, node)
    if scored is None:
        return None
    if node.boost != 1.0:
        scored = scored.select(
            "docID", (F.col("score") * F.lit(float(node.boost))).alias("score")
        )
    return scored


def _bool_scores(searcher, node: Node) -> DataFrame | None:
    must = [c.node for c in node.clauses if c.occur == MUST]
    should = [c.node for c in node.clauses if c.occur == SHOULD]
    must_not = [c.node for c in node.clauses if c.occur == MUST_NOT]

    must_dfs = []
    for n in must:
        d = _leaf_scores(searcher, n)
        if d is None:
            return None  # a MUST clause matching nothing kills the query
        must_dfs.append(d)
    should_dfs = [d for d in (_leaf_scores(searcher, n) for n in should) if d is not None]
    if not must_dfs and not should_dfs:
        return None

    parts = []
    for i, d in enumerate(must_dfs):
        parts.append(d.select("docID", "score", F.lit(i).alias("mid")))
    for d in should_dfs:
        parts.append(d.select("docID", "score", F.lit(-1).alias("mid")))
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    agg = un.groupBy("docID").agg(
        F.sum("score").alias("score"),
        F.count_distinct(F.when(F.col("mid") >= 0, F.col("mid"))).alias("nmust"),
    )
    if must_dfs:
        agg = agg.filter(F.col("nmust") == len(must_dfs))
    out = agg.select("docID", "score")
    for n in must_not:
        d = _leaf_scores(searcher, n)
        if d is not None:
            out = out.join(d.select("docID"), "docID", "left_anti")
    return out


def execute(searcher, query: str, k: int = 10) -> DataFrame:
    """Parse and run a classic query string; (docID, score float32) top-k."""
    root = parse(query)
    scored = _leaf_scores(searcher, root)
    if scored is None:
        return searcher._empty_topk()
    return (
        scored.select("docID", F.col("score").cast(FloatType()).alias("score"))
        .orderBy(F.desc("score"), F.asc("docID"))
        .limit(k)
    )
