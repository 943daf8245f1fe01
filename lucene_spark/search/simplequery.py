"""SimpleQueryParser — the fault-tolerant human query grammar
(reference lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java).

Grammar (all operators individually flag-gated, like the reference):

    token1+token2        AND             (AND_OPERATOR)
    token1|token2        OR              (OR_OPERATOR)
    -token               NOT             (NOT_OPERATOR; -- cancels)
    "term1 term2"        phrase          (PHRASE_OPERATOR)
    "term1 term2"~N      sloppy phrase   (NEAR_OPERATOR)
    term*                prefix          (PREFIX_OPERATOR, trailing * only)
    term~N / term~       fuzzy, def. 2   (FUZZY_OPERATOR)
    ( ... )              precedence      (PRECEDENCE_OPERATORS)
    \\x                  escape          (ESCAPE_OPERATOR)
    whitespace           implicit default operator (WHITESPACE_OPERATOR)
    *                    (alone) match all docs

Error tolerance mirrors the reference exactly: NOTHING throws — an
unmatched ')' is skipped (parseSubQuery), an unmatched '(' or '"' is
re-read as text (consumeSubQuery/consumePhrase rewind), a dangling
operator is dropped, non-numeric fuzziness parses as 0.

Tree building replicates buildQueryTree's left fold: the first token
becomes the tree; each further token joins under the pending operator
(default OR/SHOULD, SimpleQueryParser.java:140), and an OPERATOR CHANGE
nests the existing tree as the first clause of a fresh boolean level —
yielding the documented right-to-left precedence where
``token1 | token2 + token3`` evaluates ``token1 OR token2`` first
(SimpleQueryParser.java:447-490). Negation wraps the token as
``(MUST_NOT token, SHOULD MatchAllDocs)`` (SimpleQueryParser.java:452).

Execution reuses the classic parser's boolean evaluator (scores are
per-leaf float32 BM25 summed in double; see queryparser.py). Documented
deviations, both shared with the classic parser: fuzzy and prefix
tokens are lowercased through the analyzer before expansion (the
reference's newFuzzyQuery/newPrefixQuery use the raw text), and
multi-term expansions score top-df capped sums rather than blended
weights."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import FloatType

from lucene_spark.analysis import analyze
from lucene_spark.search.queryparser import (
    MUST,
    MUST_NOT,
    SHOULD,
    Clause,
    Node,
    _leaf_scores,
)

AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_WS = " \t\n\r"
_MAX_FUZZY = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "prev_op", "cur_op", "not_")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.index = start
        self.length = end
        self.top: Node | None = None
        self.prev_op: str | None = None
        self.cur_op: str | None = None
        self.not_ = 0


def parse_simple(
    query: str,
    default_operator: str = SHOULD,
    flags: int = ALL_OPERATORS,
) -> Node | None:
    """Parse a simple query string to the shared Node tree; None means
    MatchNoDocsQuery (empty input). `*` alone is MatchAllDocsQuery."""
    if query.strip() == "*":
        return Node("all")
    state = _State(query, 0, len(query))
    _parse_sub_query(state, flags, default_operator)
    return state.top


def _parse_sub_query(state: _State, flags: int, default_op: str) -> None:
    while state.index < state.length:
        c = state.data[state.index]
        if c == "(" and flags & PRECEDENCE_OPERATORS:
            _consume_sub_query(state, flags, default_op)
        elif c == ")" and flags & PRECEDENCE_OPERATORS:
            state.index += 1  # extraneous, ignored
        elif c == '"' and flags & PHRASE_OPERATOR:
            _consume_phrase(state, flags, default_op)
        elif c == "+" and flags & AND_OPERATOR:
            if state.cur_op is None and state.top is not None:
                state.cur_op = MUST
            state.index += 1
        elif c == "|" and flags & OR_OPERATOR:
            if state.cur_op is None and state.top is not None:
                state.cur_op = SHOULD
            state.index += 1
        elif c == "-" and flags & NOT_OPERATOR:
            state.not_ += 1
            state.index += 1
            continue  # the not count survives to the next token
        elif c in _WS and flags & WHITESPACE_OPERATOR:
            state.index += 1
        else:
            _consume_token(state, flags, default_op)
        state.not_ = 0


def _consume_sub_query(state: _State, flags: int, default_op: str) -> None:
    start = state.index = state.index + 1
    precedence = 1
    escaped = False
    while state.index < state.length:
        if not escaped:
            c = state.data[state.index]
            if c == "\\" and flags & ESCAPE_OPERATOR:
                escaped = True
                state.index += 1
                continue
            if c == "(":
                precedence += 1
            elif c == ")":
                precedence -= 1
                if precedence == 0:
                    break
        escaped = False
        state.index += 1
    if state.index == state.length:
        # no closing paren: the '(' is extraneous, re-read the rest
        state.index = start
    elif state.index == start:
        # '()': the pending operation would have applied to it — reset
        state.cur_op = None
        state.index += 1
    else:
        sub = _State(state.data, start, state.index)
        _parse_sub_query(sub, flags, default_op)
        _build_query_tree(state, sub.top, default_op)
        state.index += 1


def _consume_phrase(state: _State, flags: int, default_op: str) -> None:
    start = state.index = state.index + 1
    buf: list[str] = []
    escaped = False
    has_slop = False
    while state.index < state.length:
        if not escaped:
            c = state.data[state.index]
            if c == "\\" and flags & ESCAPE_OPERATOR:
                escaped = True
                state.index += 1
                continue
            if c == '"':
                if (
                    state.length > state.index + 1
                    and state.data[state.index + 1] == "~"
                    and flags & NEAR_OPERATOR
                ):
                    state.index += 1
                    if state.length > state.index + 1:
                        has_slop = True
                    break
                break
        escaped = False
        buf.append(state.data[state.index])
        state.index += 1
    if state.index == state.length:
        state.index = start  # unmatched quote: extraneous
    elif not buf:
        state.cur_op = None
        state.index += 1
    else:
        slop = _parse_fuzziness(state, flags) if has_slop else 0
        terms = analyze("".join(buf))
        branch: Node | None = None
        if terms:
            branch = (
                Node("sloppy", terms=terms, slop=slop)
                if slop > 0 and len(terms) > 1
                else (
                    Node("phrase", terms=terms)
                    if len(terms) > 1
                    else Node("term", terms=terms)
                )
            )
        _build_query_tree(state, branch, default_op)
        state.index += 1


def _consume_token(state: _State, flags: int, default_op: str) -> None:
    buf: list[str] = []
    escaped = False
    prefix = False
    fuzzy = False
    while state.index < state.length:
        if not escaped:
            c = state.data[state.index]
            if c == "\\" and flags & ESCAPE_OPERATOR:
                escaped = True
                prefix = False
                state.index += 1
                continue
            if _token_finished(state, flags):
                break
            if buf and c == "~" and flags & FUZZY_OPERATOR:
                fuzzy = True
                break
            prefix = bool(buf) and c == "*" and bool(flags & PREFIX_OPERATOR)
        escaped = False
        buf.append(state.data[state.index])
        state.index += 1
    if not buf:
        return
    token = "".join(buf)
    branch: Node | None = None
    if fuzzy:
        edits = min(_parse_fuzziness(state, flags), _MAX_FUZZY)
        stem = analyze(token)
        if stem:
            branch = (
                Node("term", terms=[stem[0]])
                if edits == 0
                else Node("fuzzy", terms=[stem[0]], slop=edits)
            )
    elif prefix:
        stem = analyze(token[:-1])
        if stem:
            branch = Node("wild", terms=[stem[0]])
    else:
        terms = analyze(token)
        if terms:
            branch = (
                Node("term", terms=terms)
                if len(terms) == 1
                else Node(
                    "bool",
                    clauses=[
                        Clause(default_op, Node("term", terms=[t])) for t in terms
                    ],
                )
            )
    _build_query_tree(state, branch, default_op)


def _build_query_tree(state: _State, branch: Node | None, default_op: str) -> None:
    if branch is None:
        return
    if state.not_ % 2 == 1:
        branch = Node(
            "bool",
            clauses=[Clause(MUST_NOT, branch), Clause(SHOULD, Node("all"))],
        )
    if state.top is None:
        state.top = branch
    else:
        if state.cur_op is None:
            state.cur_op = default_op
        if state.prev_op != state.cur_op:
            state.top = Node("bool", clauses=[Clause(state.cur_op, state.top)])
        elif state.top.kind != "bool":
            state.top = Node("bool", clauses=[Clause(state.cur_op, state.top)])
        state.top.clauses.append(Clause(state.cur_op, branch))
        state.prev_op = state.cur_op
    state.cur_op = None


def _parse_fuzziness(state: _State, flags: int) -> int:
    if state.index >= state.length or state.data[state.index] != "~":
        return 0
    buf: list[str] = []
    while state.index < state.length:
        state.index += 1
        if state.index < state.length:
            if _token_finished(state, flags):
                break
            buf.append(state.data[state.index])
    try:
        v = int("".join(buf)) if buf else 2
    except ValueError:
        return 0
    return max(v, 0)


def _token_finished(state: _State, flags: int) -> bool:
    c = state.data[state.index]
    return (
        (c == '"' and bool(flags & PHRASE_OPERATOR))
        or (c == "|" and bool(flags & OR_OPERATOR))
        or (c == "+" and bool(flags & AND_OPERATOR))
        or (c in "()" and bool(flags & PRECEDENCE_OPERATORS))
        or (c in _WS and bool(flags & WHITESPACE_OPERATOR))
    )


def execute_simple(
    searcher,
    query: str,
    k: int = 10,
    default_operator: str = SHOULD,
    flags: int = ALL_OPERATORS,
) -> DataFrame:
    """Parse and run a simple query string; (docID, score float32) top-k
    (score DESC, docID ASC). Empty input matches nothing; `*` matches
    every live doc at score 1."""
    root = parse_simple(query, default_operator=default_operator, flags=flags)
    if root is None:
        return searcher._empty_topk()
    scored = _leaf_scores(searcher, root)
    if scored is None:
        return searcher._empty_topk()
    return (
        scored.select("docID", F.col("score").cast(FloatType()).alias("score"))
        .orderBy(F.desc("score"), F.asc("docID"))
        .limit(k)
    )
