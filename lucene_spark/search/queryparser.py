"""Classic query-string parser + boolean executor (SURVEY.md §3.3).

Grammar — the slice of Lucene's classic QueryParser that covers the
reference benchmark query files (lucene/benchmark/conf/query-terms.txt,
query-phrases.txt, query-wildcards.txt; full grammar in
lucene/queryparser/.../classic/package-info.java):

    term                   analyzed term
    wild*                  prefix wildcard (expanded against the term
                           dictionary, scoring-boolean rewrite)
    "a phrase"             exact phrase
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
scores (DisjunctionSumScorer semantics). Top-k: score DESC, docID ASC.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType

from lucene_spark.analysis import analyze

_LEX_RE = re.compile(r'"[^"]*"|\(|\)|&&|\|\||\S+?(?=[()\s]|$)')

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


@dataclass
class Clause:
    occur: str
    node: "Node"


@dataclass
class Node:
    kind: str                     # 'term' | 'wild' | 'phrase' | 'bool'
    terms: list[str] = field(default_factory=list)
    clauses: list[Clause] = field(default_factory=list)


def _lex(q: str) -> list[str]:
    return [t for t in _LEX_RE.findall(q) if t.strip()]


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

            prefix = ""
            if tok and tok[0] in "+-" and len(tok) > 1:
                prefix, tok = tok[0], tok[1:]

            if tok == "(":
                node = parse_level()
            elif tok.startswith('"'):
                terms = analyze(tok.strip('"'))
                if not terms:
                    pending = None
                    continue
                node = Node("phrase", terms=terms)
            else:
                if ":" in tok and not tok.startswith(":"):
                    fieldname, rest = tok.split(":", 1)
                    if fieldname.isalnum():
                        tok = rest
                if tok.endswith("*") and len(tok) > 1 and "*" not in tok[:-1]:
                    stem = analyze(tok[:-1])
                    if not stem:
                        pending = None
                        continue
                    node = Node("wild", terms=[stem[0]])
                else:
                    terms = analyze(tok)
                    if not terms:
                        pending = None
                        continue
                    node = (
                        Node("term", terms=terms)
                        if len(terms) == 1
                        else Node(
                            "bool",
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
    # collapse single-clause SHOULD/MUST wrapper
    while root.kind == "bool" and len(root.clauses) == 1 and root.clauses[0].occur != MUST_NOT:
        root = root.clauses[0].node
    return root


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

def _leaf_scores(searcher, node: Node) -> DataFrame | None:
    """Full (docID, score:double) set for a leaf. None => matches nothing."""
    if node.kind == "term":
        t = node.terms[0]
        stats = searcher.term_stats([t])
        if t not in stats:
            return None
        return (
            searcher._scored_postings([t], stats)
            .select("docID", F.col("score").cast(DoubleType()).alias("score"))
        )
    if node.kind == "wild":
        # bounded expansion: keep the highest-df terms under the clause
        # cap instead of collecting an unbounded dictionary slice
        # (TopTermsRewrite behavior for scoring multi-term queries)
        expanded = searcher.expand_terms(prefix=node.terms[0], top_terms=True)
        if not expanded:
            return None
        stats = searcher.term_stats(expanded)
        return (
            searcher._scored_postings(expanded, stats)
            .groupBy("docID")
            .agg(F.sum(F.col("score").cast(DoubleType())).alias("score"))
        )
    if node.kind == "phrase":
        scored = searcher.phrase_scores(node.terms)
        if scored is None:
            return None
        return scored.select("docID", F.col("score").cast(DoubleType()).alias("score"))
    return _bool_scores(searcher, node)


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
