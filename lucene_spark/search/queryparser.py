"""Classic query-string parser (SURVEY.md §3.3).

Covers the slice of Lucene's classic QueryParser syntax the north rule
needs (reference grammar:
lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/package-info.java,
demo wiring lucene/demo/src/java/org/apache/lucene/demo/SearchFiles.java:108-146):

    term                 bare term (analyzed)
    term1 term2          implicit OR (SHOULD clauses)
    a AND b / a && b     conjunction
    a OR b  / a || b     explicit disjunction
    NOT a / -a           prohibited clause
    +a                   required clause
    "a phrase"           exact phrase

Output is a flat boolean structure (must / should / must_not / phrases)
executed through IndexSearcher — matching the reference's flat
BooleanQuery for this grammar subset (no nested parens, matching the
benchmark query files' shape, lucene/benchmark/conf/query-terms.txt).

AND binds pairwise like the classic parser's default-OR mode: `a AND b c`
=> +a +b c.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from lucene_spark.analysis import analyze

_TOKEN_RE = re.compile(r'"[^"]*"|\S+')


@dataclass
class ParsedQuery:
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[list[str]] = field(default_factory=list)

    @property
    def is_empty(self) -> bool:
        return not (self.must or self.should or self.must_not or self.phrases)


def parse(query: str) -> ParsedQuery:
    out = ParsedQuery()
    raw = _TOKEN_RE.findall(query)
    i = 0
    pending_op: str | None = None  # 'AND' | 'OR' | 'NOT'
    last_bucket: list[str] | None = None
    while i < len(raw):
        tok = raw[i]
        i += 1
        if tok in ("AND", "&&"):
            pending_op = "AND"
            continue
        if tok in ("OR", "||"):
            pending_op = "OR"
            continue
        if tok == "NOT":
            pending_op = "NOT"
            continue

        prefix = ""
        if tok and tok[0] in "+-":
            prefix, tok = tok[0], tok[1:]
        if not tok:
            continue

        if tok.startswith('"') and tok.endswith('"'):
            terms = analyze(tok.strip('"'))
            if terms:
                out.phrases.append(terms)
            pending_op = None
            last_bucket = None
            continue

        # strip field prefix (single-field engine: content is the field)
        if ":" in tok and not tok.startswith(":"):
            fieldname, rest = tok.split(":", 1)
            if fieldname.isalnum():
                tok = rest

        terms = analyze(tok)
        if not terms:
            pending_op = None
            continue
        term = terms[0] if len(terms) == 1 else None

        if prefix == "-" or pending_op == "NOT":
            bucket = out.must_not
        elif prefix == "+":
            bucket = out.must
        elif pending_op == "AND":
            # classic parser: AND promotes BOTH operands to required
            if last_bucket is out.should and out.should:
                out.must.append(out.should.pop())
            bucket = out.must
        else:
            bucket = out.should
        for t in terms if term is None else [term]:
            bucket.append(t)
        last_bucket = bucket
        pending_op = None
    return out


def execute(searcher, query: str, k: int = 10) -> DataFrame:
    """Parse and run a classic query string through the float32 engine.
    Pure term/bool queries use search/search_boolean; a single phrase
    with no other clauses uses search_phrase; mixed phrase+term falls
    back to conjunction of the phrase's terms plus the clauses (phrase
    position check applied by search_phrase when it is the whole query)."""
    p = parse(query)
    if p.is_empty:
        return searcher._empty_topk()
    if p.phrases and not (p.must or p.should or p.must_not):
        if len(p.phrases) == 1:
            return searcher.search_phrase(" ".join(p.phrases[0]), k=k)
    must = list(p.must)
    for ph in p.phrases:  # approximation for mixed queries: phrase terms MUST
        must.extend(ph)
    if not must and not p.must_not and p.should and len(p.should) >= 1:
        return searcher.search(p.should, k=k, mode="or")
    return searcher.search_boolean(
        should=p.should or None,
        must=must or None,
        must_not=p.must_not or None,
        k=k,
    )
