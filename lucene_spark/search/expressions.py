"""Lucene expressions module analog — the Javascript-like scoring
expression language compiled to pure Catalyst columns.

Reference surface (expressions/):
  - grammar: ``expressions/src/java/org/apache/lucene/expressions/js/
    Javascript.g4`` (precedence ladder, literals, VARIABLE shape)
  - compiler semantics: ``JavascriptCompiler.java`` — every value is a
    double; bitwise/shift operands convert through long (``d2l``), shift
    counts through int (``d2i``), boolean/conditional truthiness is the
    *int* conversion of the operand (``d2i(x) != 0`` — so ``0.5`` is
    falsy!), comparisons yield 1.0/0.0 with Java NaN semantics (every
    comparison false on NaN except ``!=``), and nested bitwise/shift
    chains stay in long precision (no double round-trip between them)
  - default functions: ``JavascriptCompiler.properties`` (26 entries) +
    ``MathUtil.java:48,102,127,144`` (logn/asinh/acosh/atanh formulas)
    and ``ExpressionMath.java:43`` (haversin)
  - bindings: ``SimpleBindings.java`` — variable names map to per-doc
    double sources; ``score`` conventionally binds the relevance score
  - rescoring: ``ExpressionRescorer.java`` (via ``Expression.
    getRescorer``) — replaces each top-window hit's score with the
    expression value; wired in engine.IndexSearcher.rescore_expression

Spark-first design: compile(source) parses ONCE on the driver into an
AST with three value-identical backends:
  - ``to_column(bindings)``  -> a pyspark Column (pure codegen — the
    whole expression inlines into WholeStageCodegen; no UDF, so it
    vectorizes and survives any scale)
  - ``to_sql(bindings)``     -> a DuckDB-compatible SQL rendering used
    as the oracle twin in gate duels (same precedent as
    features.feature_score_sql / geo.polygon_sql)
  - ``evaluate(bindings)``   -> a pure-Python reference evaluator with
    EXACT Java conversion semantics (d2l saturation, l2i wraparound,
    shift-count masking) — the pytest duel oracle

Documented deviations from the reference:
  - ``haversin``/``haversinMeters`` use the exact haversine formula,
    not SloppyMath's table-driven approximation (reference error bound
    is <= 40cm; we are exact; both duel sides share our formula).
  - ``min``/``max`` propagate NaN like Java's Math.min/max but do not
    reproduce the Java ``-0.0 < 0.0`` ordering (both engines'
    least/greatest treat them equal; only distinguishable by signbit).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

LONG_MIN = -(1 << 63)
LONG_MAX = (1 << 63) - 1
INT_MIN = -(1 << 31)
INT_MAX = (1 << 31) - 1
# |x| >= 2^53 => x is already integral in double, floor/ceil identity
_INTEGRAL = float(1 << 53)


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Node:
    kind: str  # num | var | call | unary | bin | cond
    val: object = None
    args: tuple = ()

    # long-typed nodes keep long precision when consumed by another
    # bitwise/shift op (JavascriptCompiler pushes LONG->LONG without a
    # double round-trip)
    @property
    def is_long(self) -> bool:
        return self.kind in ("unary", "bin") and self.val in (
            "~", "&", "|", "^", "<<", ">>", ">>>",
        )


# --------------------------------------------------------------------------
# Lexer (Javascript.g4 token set)
# --------------------------------------------------------------------------

_TWO_CHAR = ("<<", ">>", "<=", ">=", "==", "!=", "&&", "||")
_ONE_CHAR = set("()!~*/%+-<>&^|?:,")


def _lex(src: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if src.startswith(">>>", i):
            toks.append((">>>", None))
            i += 3
            continue
        if src[i : i + 2] in _TWO_CHAR:
            toks.append((src[i : i + 2], None))
            i += 2
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if c == "0" and i + 1 < n and src[i + 1] in "xX":
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                toks.append(("num", float(int(src[i:j], 16))))
                i = j
                continue
            if (
                c == "0"
                and i + 1 < n
                and src[i + 1] in "01234567"
            ):
                j = i + 1
                while j < n and src[j] in "01234567":
                    j += 1
                # octal only if the run is pure octal and not a decimal
                # like 0.5 / 09 / 08e2 (g4: OCTAL = [0][0-7]+)
                if j >= n or src[j] not in ".89eE":
                    toks.append(("num", float(int(src[i:j], 8))))
                    i = j
                    continue
            j = i
            while j < n and src[j].isdigit():
                j += 1
            if j < n and src[j] == ".":
                j += 1
                while j < n and src[j].isdigit():
                    j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    j = k
                    while j < n and src[j].isdigit():
                        j += 1
            toks.append(("num", float(src[i:j])))
            i = j
            continue
        if c.isalpha() or c in "_$":
            # VARIABLE: ID ARRAY* ( . ID ARRAY* )*  — keep the raw text
            # as the binding key (SimpleBindings uses the full string)
            j = i
            while j < n:
                ch = src[j]
                if ch.isalnum() or ch in "_$.":
                    j += 1
                elif ch == "[":
                    k = j + 1
                    if k < n and src[k] in "'\"":
                        q = src[k]
                        k += 1
                        while k < n and src[k] != q:
                            k += 2 if src[k] == "\\" else 1
                        k += 1
                    else:
                        while k < n and src[k].isdigit():
                            k += 1
                    if k >= n or src[k] != "]":
                        raise ValueError(
                            f"unterminated array access at {j} in {src!r}"
                        )
                    j = k + 1
                else:
                    break
            toks.append(("id", src[i:j]))
            i = j
            continue
        if c in _ONE_CHAR:
            toks.append((c, None))
            i += 1
            continue
        raise ValueError(f"unexpected character {c!r} at {i} in {src!r}")
    toks.append(("eof", None))
    return toks


# --------------------------------------------------------------------------
# Parser — precedence ladder straight from Javascript.g4
# --------------------------------------------------------------------------

_BIN_LEVELS: list[tuple[str, ...]] = [
    ("||",),
    ("&&",),
    ("|",),
    ("^",),
    ("&",),
    ("==", "!="),
    ("<", "<=", ">", ">="),
    ("<<", ">>", ">>>"),
    ("+", "-"),
    ("*", "/", "%"),
]


class _Parser:
    def __init__(self, toks: list[tuple[str, object]], src: str):
        self.toks = toks
        self.pos = 0
        self.src = src

    def peek(self) -> tuple[str, object]:
        return self.toks[self.pos]

    def next(self) -> tuple[str, object]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, kind: str) -> None:
        t = self.next()
        if t[0] != kind:
            raise ValueError(
                f"expected {kind!r}, got {t[0]!r} in {self.src!r}"
            )

    def parse(self) -> Node:
        e = self.conditional()
        self.expect("eof")
        return e

    def conditional(self) -> Node:
        cond = self.binary(0)
        if self.peek()[0] == "?":
            self.next()
            # then-branch: a fresh full conditional (?: nests freely)
            a = self.conditional()
            self.expect(":")
            b = self.conditional()  # right-assoc
            return Node("cond", None, (cond, a, b))
        return cond

    def binary(self, level: int) -> Node:
        if level >= len(_BIN_LEVELS):
            return self.unary()
        ops = _BIN_LEVELS[level]
        left = self.binary(level + 1)
        while self.peek()[0] in ops:
            op = self.next()[0]
            right = self.binary(level + 1)
            left = Node("bin", op, (left, right))
        return left

    def unary(self) -> Node:
        t = self.peek()
        if t[0] in ("!", "~", "+", "-"):
            self.next()
            return Node("unary", t[0], (self.unary(),))
        return self.primary()

    def primary(self) -> Node:
        t = self.next()
        if t[0] == "(":
            e = self.conditional()
            self.expect(")")
            return e
        if t[0] == "num":
            return Node("num", t[1])
        if t[0] == "id":
            if self.peek()[0] == "(":
                self.next()
                args = []
                if self.peek()[0] != ")":
                    args.append(self.conditional())
                    while self.peek()[0] == ",":
                        self.next()
                        args.append(self.conditional())
                self.expect(")")
                return Node("call", t[1], tuple(args))
            return Node("var", t[1])
        raise ValueError(f"unexpected token {t[0]!r} in {self.src!r}")


# --------------------------------------------------------------------------
# Function registry (JavascriptCompiler.properties)
# --------------------------------------------------------------------------

_FUNCTIONS: dict[str, int] = {
    "abs": 1, "acos": 1, "acosh": 1, "asin": 1, "asinh": 1, "atan": 1,
    "atan2": 2, "atanh": 1, "ceil": 1, "cos": 1, "cosh": 1, "exp": 1,
    "floor": 1, "haversin": 4, "haversinMeters": 4, "ln": 1, "log10": 1,
    "logn": 2, "max": 2, "min": 2, "pow": 2, "sin": 1, "sinh": 1,
    "sqrt": 1, "tan": 1, "tanh": 1,
}


# --------------------------------------------------------------------------
# Python reference backend — exact Java conversion semantics
# --------------------------------------------------------------------------


def _d2l(x: float) -> int:
    if math.isnan(x):
        return 0
    if x >= float(LONG_MAX):
        return LONG_MAX
    if x <= float(LONG_MIN):
        return LONG_MIN
    return int(x)  # truncation toward zero


def _d2i(x: float) -> int:
    if math.isnan(x):
        return 0
    if x >= float(INT_MAX):
        return INT_MAX
    if x <= float(INT_MIN):
        return INT_MIN
    return int(x)


def _wrap_long(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v > LONG_MAX else v


def _l2i(v: int) -> int:
    v &= (1 << 32) - 1
    return v - (1 << 32) if v > INT_MAX else v


def _java_rem(a: float, b: float) -> float:
    # JVM DREM == C fmod (sign of dividend), NOT Math.IEEEremainder
    try:
        return math.fmod(a, b)
    except ValueError:  # fmod(inf, y) / fmod(x, 0) -> NaN in Java
        return float("nan")


def _py_haversin_km(lat1, lon1, lat2, lon2) -> float:
    return _py_haversin_m(lat1, lon1, lat2, lon2) / 1000.0


def _nan_trig(f: Callable[[float], float]) -> Callable[[float], float]:
    # Java trig returns NaN on non-finite input; python math raises
    def g(x: float) -> float:
        if not math.isfinite(x):
            return float("nan")
        return f(x)

    return g


def _py_haversin_m(lat1, lon1, lat2, lon2) -> float:
    # exact haversine, mean earth radius 6371008.7714m (SloppyMath's
    # TO_METERS constant base); deviation: the reference approximates.
    # min(1.0, NaN) == 1.0 in all three backends (python min / Spark
    # least / DuckDB least) — non-finite coords do not yield Java's NaN
    to_rad = math.pi / 180.0
    dlat = (lat2 - lat1) * to_rad
    dlon = (lon2 - lon1) * to_rad
    sin, cos = _nan_trig(math.sin), _nan_trig(math.cos)
    h = (
        sin(dlat / 2) ** 2
        + cos(lat1 * to_rad) * cos(lat2 * to_rad) * sin(dlon / 2) ** 2
    )
    root = math.sqrt(h) if h >= 0 else float("nan")
    return 2.0 * 6371008.7714 * math.asin(min(1.0, root))


def _safe1(f: Callable[[float], float]) -> Callable[[float], float]:
    def g(x: float) -> float:
        try:
            return f(x)
        except ValueError:
            return float("nan")
        except OverflowError:
            return math.copysign(float("inf"), x)

    return g


def _py_ln(x: float) -> float:
    # Java Math.log: NaN for x<0 or NaN, -inf at 0, +inf at +inf
    if math.isnan(x) or x < 0.0:
        return float("nan")
    if x == 0.0:
        return float("-inf")
    return math.log(x)


def _ieee_div(a: float, b: float) -> float:
    if b == 0.0:
        if a == 0.0 or math.isnan(a):
            return float("nan")
        return float("inf") if a > 0.0 else float("-inf")
    return a / b


def _py_logn(base: float, x: float) -> float:
    # MathUtil.log(base, x) = ln(x)/ln(base)  (MathUtil.java:48)
    return _ieee_div(_py_ln(x), _py_ln(base))


def _py_asinh(a: float) -> float:
    # sign test is `a < 0`, not signbit: all three backends agree that
    # asinh(-0.0) == +0.0 (deviation from MathUtil's raw-bits check,
    # distinguishable only through Double.doubleToRawLongBits)
    sign = -1.0 if a < 0 else 1.0
    a = abs(a)
    try:
        return sign * math.log(math.sqrt(a * a + 1.0) + a)
    except OverflowError:
        return sign * float("inf")


def _py_acosh(a: float) -> float:
    try:
        return math.log(math.sqrt(a * a - 1.0) + a)
    except ValueError:
        return float("nan")


def _py_atanh(a: float) -> float:
    mult = -0.5 if a < 0 else 0.5  # same -0.0 note as _py_asinh
    a = abs(a)
    if a > 1.0:
        return float("nan")
    if a == 1.0:
        return mult * float("inf")
    return mult * math.log((1.0 + a) / (1.0 - a))


def _py_minmax(f):
    def g(a: float, b: float) -> float:
        if math.isnan(a) or math.isnan(b):
            return float("nan")
        return f(a, b)

    return g


def _py_cosh(x: float) -> float:
    # cosh is even: overflow (math.cosh raises just past ~710.476)
    # saturates to +inf regardless of sign
    if math.isnan(x):
        return float("nan")
    try:
        return math.cosh(x)
    except OverflowError:
        return float("inf")


def _py_pow(a: float, b: float) -> float:
    # Java Math.pow: pow(x, 0) == 1 even for NaN x; |x| == 1 with an
    # infinite exponent is NaN (C99 pow returns 1 there — the Column
    # backend runs the JVM, so python/SQL replicate Java)
    if b == 0.0:
        return 1.0
    if math.isnan(a) or math.isnan(b):
        return float("nan")
    if abs(a) == 1.0 and math.isinf(b):
        return float("nan")
    if a == 0.0 and b < 0:
        # IEEE pow(±0, negative) = ±inf (python's math.pow raises)
        if (
            math.copysign(1.0, a) < 0
            and math.isfinite(b)
            and b == int(b)
            and int(b) % 2 != 0
        ):
            return float("-inf")
        return float("inf")
    try:
        return math.pow(a, b)
    except ValueError:
        return float("nan")
    except OverflowError:
        # sign follows IEEE pow: negative only for a<0 with odd-integer b
        if a < 0 and math.isfinite(b) and b == int(b) and int(b) % 2 != 0:
            return float("-inf")
        return float("inf")


_PY_FUNCS: dict[str, Callable] = {
    "abs": abs,
    "acos": _safe1(math.acos),
    "acosh": _py_acosh,
    "asin": _safe1(math.asin),
    "asinh": _py_asinh,
    "atan": math.atan,
    "atan2": lambda y, x: math.atan2(y, x),
    "atanh": _py_atanh,
    "ceil": _safe1(lambda x: float(math.ceil(x)) if math.isfinite(x) else x),
    "cos": _safe1(math.cos),
    "cosh": lambda x: _py_cosh(x),
    "exp": _safe1(math.exp),
    "floor": _safe1(lambda x: float(math.floor(x)) if math.isfinite(x) else x),
    "haversin": _py_haversin_km,
    "haversinMeters": _py_haversin_m,
    "ln": _py_ln,
    "log10": lambda x: _ieee_div(_py_ln(x), math.log(10.0))
    if (math.isnan(x) or x <= 0.0)
    else math.log10(x),
    "logn": _py_logn,
    "max": _py_minmax(max),
    "min": _py_minmax(min),
    "pow": _py_pow,
    "sin": _safe1(math.sin),
    "sinh": _safe1(math.sinh),
    "sqrt": _safe1(math.sqrt),
    "tan": _safe1(math.tan),
    "tanh": math.tanh,
}


def _py_eval_double(node: Node, env: dict[str, float]) -> float:
    if node.is_long:
        v = _py_eval_long(node, env)
        return float(v)
    if node.kind == "num":
        return float(node.val)
    if node.kind == "var":
        return float(env[node.val])
    if node.kind == "call":
        return float(
            _PY_FUNCS[node.val](*[_py_eval_double(a, env) for a in node.args])
        )
    if node.kind == "unary":
        op = node.val
        if op == "+":
            return _py_eval_double(node.args[0], env)
        if op == "-":
            return -_py_eval_double(node.args[0], env)
        if op == "!":
            return 0.0 if _py_truthy(node.args[0], env) else 1.0
        raise AssertionError(op)
    if node.kind == "cond":
        c, a, b = node.args
        return (
            _py_eval_double(a, env)
            if _py_truthy(c, env)
            else _py_eval_double(b, env)
        )
    # bin
    op = node.val
    if op in ("&&", "||"):
        la = _py_truthy(node.args[0], env)
        if op == "&&":
            return 1.0 if (la and _py_truthy(node.args[1], env)) else 0.0
        return 1.0 if (la or _py_truthy(node.args[1], env)) else 0.0
    a = _py_eval_double(node.args[0], env)
    if op in ("==", "!=", "<", "<=", ">", ">="):
        b = _py_eval_double(node.args[1], env)
        if math.isnan(a) or math.isnan(b):
            return 1.0 if op == "!=" else 0.0
        r = {
            "==": a == b, "!=": a != b, "<": a < b,
            "<=": a <= b, ">": a > b, ">=": a >= b,
        }[op]
        return 1.0 if r else 0.0
    b = _py_eval_double(node.args[1], env)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        if b == 0.0:
            if a == 0.0 or math.isnan(a):
                return float("nan")
            return float("inf") if a > 0.0 else float("-inf")
        return a / b
    if op == "%":
        return _java_rem(a, b)
    raise AssertionError(op)


def _py_eval_long(node: Node, env: dict[str, float]) -> int:
    if node.kind == "num" and float(node.val).is_integer():
        # within long range the integral literal is exact; beyond it,
        # saturate like d2l (JavascriptCompiler pushes the double and
        # converts — it never wraps)
        v = int(node.val)
        if LONG_MIN <= v <= LONG_MAX:
            return v
        return _d2l(float(node.val))
    if node.kind == "unary" and node.val == "~":
        return _wrap_long(~_py_eval_long(node.args[0], env))
    if node.kind == "bin" and node.val in ("&", "|", "^", "<<", ">>", ">>>"):
        a = _py_eval_long(node.args[0], env)
        op = node.val
        if op in ("<<", ">>", ">>>"):
            s = _d2i(_py_eval_double(node.args[1], env)) & 63
            if op == "<<":
                return _wrap_long(a << s)
            if op == ">>":
                return a >> s  # python >> on signed int == arithmetic
            return (a & ((1 << 64) - 1)) >> s if s else a
        b = _py_eval_long(node.args[1], env)
        ua, ub = a & ((1 << 64) - 1), b & ((1 << 64) - 1)
        r = {"&": ua & ub, "|": ua | ub, "^": ua ^ ub}[op]
        return _wrap_long(r)
    return _d2l(_py_eval_double(node, env))


def _py_truthy(node: Node, env: dict[str, float]) -> bool:
    # JavascriptCompiler evaluates boolean operands in INT context:
    # long-typed children go through l2i (wraps!), doubles through d2i
    if node.is_long:
        return _l2i(_py_eval_long(node, env)) != 0
    return _d2i(_py_eval_double(node, env)) != 0


# --------------------------------------------------------------------------
# Spark Column backend
# --------------------------------------------------------------------------


def _col_haversin_m(lat1, lon1, lat2, lon2) -> Column:
    to_rad = math.pi / 180.0
    dlat = (lat2 - lat1) * F.lit(to_rad)
    dlon = (lon2 - lon1) * F.lit(to_rad)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1 * F.lit(to_rad))
        * F.cos(lat2 * F.lit(to_rad))
        * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * 6371008.7714) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h))
    )


def _col_floorceil(x: Column, fn) -> Column:
    # Spark's floor/ceil(double) return LONG; guard the non-finite and
    # >=2^53 range (already integral) so we keep Java's double-in/out
    return F.when(F.isnan(x) | (F.abs(x) >= F.lit(_INTEGRAL)), x).otherwise(
        fn(x).cast("double")
    )


def _col_nan_minmax(fn):
    def g(a: Column, b: Column) -> Column:
        return F.when(
            F.isnan(a) | F.isnan(b), F.lit(float("nan"))
        ).otherwise(fn(a, b))

    return g


def _col_ln(x: Column) -> Column:
    # Spark's log() returns NULL for x <= 0; Java gives -inf at 0, NaN
    # below — NULLs must never escape (they poison every parent op)
    return (
        F.when(F.isnan(x) | (x < 0.0), F.lit(float("nan")))
        .when(x == 0.0, F.lit(float("-inf")))
        .otherwise(F.log(x))
    )


def _col_ieee_div(a: Column, b: Column) -> Column:
    return F.when(b != 0.0, a / b).otherwise(
        F.when(F.isnan(a) | (a == 0.0), F.lit(float("nan"))).otherwise(
            F.when(a > 0.0, F.lit(float("inf"))).otherwise(
                F.lit(float("-inf"))
            )
        )
    )


def _col_logn(base: Column, x: Column) -> Column:
    return _col_ieee_div(_col_ln(x), _col_ln(base))


_COL_FUNCS: dict[str, Callable] = {
    "abs": F.abs,
    "acos": F.acos,
    "acosh": lambda x: _col_ln(F.sqrt(x * x - 1.0) + x),
    "asin": F.asin,
    "asinh": lambda x: F.signum(
        F.when(x == 0.0, F.lit(1.0)).otherwise(x)
    )
    * F.log(F.sqrt(x * x + 1.0) + F.abs(x)),
    "atan": F.atan,
    "atan2": F.atan2,
    "atanh": lambda x: (
        F.when(F.isnan(x) | (F.abs(x) > 1.0), F.lit(float("nan")))
        .when(
            F.abs(x) == 1.0,
            F.signum(x) * F.lit(float("inf")),
        )
        .otherwise(
            F.lit(0.5)
            * F.signum(F.when(x == 0.0, F.lit(1.0)).otherwise(x))
            * F.log((1.0 + F.abs(x)) / (1.0 - F.abs(x)))
        )
    ),
    "ceil": lambda x: _col_floorceil(x, F.ceil),
    "cos": F.cos,
    "cosh": F.cosh,
    "exp": F.exp,
    "floor": lambda x: _col_floorceil(x, F.floor),
    "haversin": lambda a, b, c, d: _col_haversin_m(a, b, c, d) / 1000.0,
    "haversinMeters": _col_haversin_m,
    "ln": _col_ln,
    "log10": lambda x: (
        F.when(F.isnan(x) | (x < 0.0), F.lit(float("nan")))
        .when(x == 0.0, F.lit(float("-inf")))
        .otherwise(F.log10(x))
    ),
    "logn": _col_logn,
    "max": _col_nan_minmax(F.greatest),
    "min": _col_nan_minmax(F.least),
    "pow": lambda a, b: F.when(b == 0.0, F.lit(1.0)).otherwise(F.pow(a, b)),
    "sin": F.sin,
    "sinh": F.sinh,
    "sqrt": F.sqrt,
    "tan": F.tan,
    "tanh": F.tanh,
}


def _col_double(node: Node, env: dict[str, Column]) -> Column:
    if node.is_long:
        return _col_long(node, env).cast("double")
    if node.kind == "num":
        return F.lit(float(node.val))
    if node.kind == "var":
        return env[node.val].cast("double")
    if node.kind == "call":
        return _COL_FUNCS[node.val](
            *[_col_double(a, env) for a in node.args]
        ).cast("double")
    if node.kind == "unary":
        op = node.val
        if op == "+":
            return _col_double(node.args[0], env)
        if op == "-":
            return -_col_double(node.args[0], env)
        if op == "!":
            return (~_col_truthy(node.args[0], env)).cast("double")
        raise AssertionError(op)
    if node.kind == "cond":
        c, a, b = node.args
        return F.when(
            _col_truthy(c, env), _col_double(a, env)
        ).otherwise(_col_double(b, env))
    op = node.val
    if op == "&&":
        return (
            _col_truthy(node.args[0], env) & _col_truthy(node.args[1], env)
        ).cast("double")
    if op == "||":
        return (
            _col_truthy(node.args[0], env) | _col_truthy(node.args[1], env)
        ).cast("double")
    a = _col_double(node.args[0], env)
    b = _col_double(node.args[1], env)
    if op in ("==", "!=", "<", "<=", ">", ">="):
        # Spark orders NaN largest and NaN==NaN true; Java compares all
        # false on NaN except != — guard explicitly
        cmp = {
            "==": a == b, "!=": a != b, "<": a < b,
            "<=": a <= b, ">": a > b, ">=": a >= b,
        }[op]
        return F.when(
            F.isnan(a) | F.isnan(b),
            F.lit(1.0 if op == "!=" else 0.0),
        ).otherwise(cmp.cast("double"))
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        # Spark double Divide returns NULL on zero divisor (non-ANSI);
        # Java gives ±inf / NaN — rebuild the IEEE result explicitly
        # (zero-divisor sign: we treat ±0.0 divisors as +0.0 — telling
        # them apart needs raw double bits; all three backends agree)
        return _col_ieee_div(a, b)
    if op == "%":
        # Spark double Remainder also NULLs on zero divisor; Java -> NaN
        return F.when(b != 0.0, a % b).otherwise(F.lit(float("nan")))
    raise AssertionError(op)


def _col_long(node: Node, env: dict[str, Column]) -> Column:
    if node.kind == "unary" and node.val == "~":
        return F.bitwise_not(_col_long(node.args[0], env))
    if node.kind == "bin" and node.val in ("&", "|", "^", "<<", ">>", ">>>"):
        a = _col_long(node.args[0], env)
        op = node.val
        if op in ("<<", ">>", ">>>"):
            s = _col_d2i(_col_double(node.args[1], env))
            name = {"<<": "shiftleft", ">>": "shiftright",
                    ">>>": "shiftrightunsigned"}[op]
            return F.call_function(name, a, s)
        b = _col_long(node.args[1], env)
        if op == "&":
            return a.bitwiseAND(b)
        if op == "|":
            return a.bitwiseOR(b)
        return a.bitwiseXOR(b)
    return _col_d2l(_col_double(node, env))


def _col_d2l(x: Column) -> Column:
    # Java d2l: NaN->0, truncate toward zero, saturate at long range.
    # Spark 4 runs ANSI by default (cast would THROW on NaN/overflow),
    # so the guard rails are explicit; the in-range cast truncates.
    return (
        F.when(F.isnan(x), F.lit(0).cast("long"))
        .when(x >= float(LONG_MAX), F.lit(LONG_MAX))
        .when(x <= float(LONG_MIN), F.lit(LONG_MIN))
        .otherwise(x.cast("long"))
    )


def _col_d2i(x: Column) -> Column:
    return (
        F.when(F.isnan(x), F.lit(0))
        .when(x >= float(INT_MAX), F.lit(INT_MAX))
        .when(x <= float(INT_MIN), F.lit(INT_MIN))
        .otherwise(x.cast("int"))
    )


def _col_truthy(node: Node, env: dict[str, Column]) -> Column:
    if node.is_long:
        # l2i wraps to the low 32 bits in Java; != 0 needs only them
        return F.pmod(_col_long(node, env), F.lit(1 << 32)) != 0
    x = _col_double(node, env)
    # d2i(x) != 0  <=>  x is not NaN and |x| >= 1 (saturation keeps
    # every |x| >= 1 nonzero; |x| < 1 truncates to 0)
    return F.when(F.isnan(x), F.lit(False)).otherwise(F.abs(x) >= 1.0)


# --------------------------------------------------------------------------
# SQL (DuckDB oracle-twin) backend
# --------------------------------------------------------------------------


def _flit(v: float) -> str:
    if math.isnan(v):
        return "(CAST('nan' AS DOUBLE))"
    if math.isinf(v):
        return f"(CAST('{'-' if v < 0 else ''}inf' AS DOUBLE))"
    return repr(float(v))


def _sql_d2l(x: str) -> str:
    return (
        f"(CASE WHEN isnan({x}) THEN 0 "
        f"WHEN {x} >= 9223372036854775807.0 THEN 9223372036854775807 "
        f"WHEN {x} <= -9223372036854775808.0 THEN -9223372036854775808 "
        f"ELSE CAST(trunc({x}) AS BIGINT) END)"
    )


def _sql_d2i(x: str) -> str:
    return (
        f"(CASE WHEN isnan({x}) THEN 0 "
        f"WHEN {x} >= 2147483647.0 THEN 2147483647 "
        f"WHEN {x} <= -2147483648.0 THEN -2147483648 "
        f"ELSE CAST(trunc({x}) AS INTEGER) END)"
    )


def _sql_l2i(x: str) -> str:
    # low 32 bits, signed
    u = f"(({x}) & 4294967295)"
    return (
        f"(CASE WHEN {u} > 2147483647 THEN {u} - 4294967296 ELSE {u} END)"
    )


def _sql_haversin_m(lat1, lon1, lat2, lon2) -> str:
    tr = repr(math.pi / 180.0)

    def sin(x):
        return f"(CASE WHEN isnan({x}) OR isinf({x}) THEN {_NAN} ELSE sin({x}) END)"

    def cos(x):
        return f"(CASE WHEN isnan({x}) OR isinf({x}) THEN {_NAN} ELSE cos({x}) END)"

    dlat = f"((({lat2})-({lat1}))*{tr})"
    dlon = f"((({lon2})-({lon1}))*{tr})"
    h = (
        f"(pow({sin(f'({dlat}/2)')},2) + {cos(f'(({lat1})*{tr})')}"
        f"*{cos(f'(({lat2})*{tr})')}*pow({sin(f'({dlon}/2)')},2))"
    )
    # least(1.0, NaN) == 1.0 in DuckDB/Spark/python-min alike (see
    # _py_haversin_m note); sqrt(NaN) is NaN in DuckDB, no guard needed
    return f"(2.0*6371008.7714*asin(least(1.0, sqrt({h}))))"


def _sql_sign_nonzero(x: str) -> str:
    return f"(CASE WHEN sign({x}) < 0 THEN -1.0 ELSE 1.0 END)"


_NAN = "CAST('nan' AS DOUBLE)"
_PINF = "CAST('inf' AS DOUBLE)"
_NINF = "CAST('-inf' AS DOUBLE)"


def _sql_ln(x: str) -> str:
    # Java Math.log semantics; DuckDB ln() THROWS on x <= 0
    return (
        f"(CASE WHEN isnan({x}) OR ({x}) < 0.0 THEN {_NAN} "
        f"WHEN ({x}) = 0.0 THEN {_NINF} ELSE ln({x}) END)"
    )


def _sql_ieee_div(a: str, b: str) -> str:
    return (
        f"(CASE WHEN ({b}) <> 0.0 THEN (CAST({a} AS DOUBLE) / ({b})) "
        f"WHEN isnan({a}) OR ({a}) = 0.0 THEN {_NAN} "
        f"WHEN ({a}) > 0.0 THEN {_PINF} ELSE {_NINF} END)"
    )


def _sql_trig(fn: str):
    # DuckDB sin/cos/tan THROW on non-finite input; Java returns NaN
    def g(x: str) -> str:
        return (
            f"(CASE WHEN isnan({x}) OR isinf({x}) THEN {_NAN} "
            f"ELSE {fn}({x}) END)"
        )

    return g


def _sql_sqrt(x: str) -> str:
    return f"(CASE WHEN ({x}) < 0.0 THEN {_NAN} ELSE sqrt({x}) END)"


def _sql_asinacos(fn: str):
    def g(x: str) -> str:
        return (
            f"(CASE WHEN isnan({x}) OR abs({x}) > 1.0 THEN {_NAN} "
            f"ELSE {fn}({x}) END)"
        )

    return g


_SQL_FUNCS: dict[str, Callable] = {
    "abs": lambda x: f"abs({x})",
    "acos": _sql_asinacos("acos"),
    # formula replicated blindly (like py/Column): for x <= -1.34e154,
    # x*x overflows to inf and the result is +inf, matching MathUtil's
    # unguarded arithmetic — a domain guard here would diverge
    "acosh": lambda x: _sql_ln(
        f"({_sql_sqrt(f'(({x})*({x}) - 1.0)')} + ({x}))"
    ),
    "asin": _sql_asinacos("asin"),
    "asinh": lambda x: (
        f"({_sql_sign_nonzero(x)} * "
        f"ln(sqrt(abs({x})*abs({x}) + 1.0) + abs({x})))"
    ),
    "atan": lambda x: f"atan({x})",
    "atan2": lambda y, x: f"atan2({y}, {x})",
    "atanh": lambda x: (
        f"(CASE WHEN isnan({x}) OR abs({x}) > 1.0 THEN {_NAN} "
        f"WHEN abs({x}) = 1.0 THEN {_sql_sign_nonzero(x)} * {_PINF} "
        f"ELSE 0.5 * {_sql_sign_nonzero(x)} * "
        f"ln((1.0 + abs({x})) / (1.0 - abs({x}))) END)"
    ),
    "ceil": lambda x: f"ceil(CAST({x} AS DOUBLE))",
    "cos": _sql_trig("cos"),
    "cosh": lambda x: f"((exp({x}) + exp(-({x}))) / 2.0)",
    "exp": lambda x: f"exp({x})",
    "floor": lambda x: f"floor(CAST({x} AS DOUBLE))",
    "haversin": lambda a, b, c, d: f"({_sql_haversin_m(a, b, c, d)}/1000.0)",
    "haversinMeters": _sql_haversin_m,
    "ln": _sql_ln,
    "log10": lambda x: (
        f"(CASE WHEN isnan({x}) OR ({x}) < 0.0 THEN {_NAN} "
        f"WHEN ({x}) = 0.0 THEN {_NINF} ELSE log10({x}) END)"
    ),
    "logn": lambda b, x: _sql_ieee_div(_sql_ln(x), _sql_ln(b)),
    "max": lambda a, b: (
        f"(CASE WHEN isnan({a}) OR isnan({b}) THEN {_NAN} "
        f"ELSE greatest({a}, {b}) END)"
    ),
    "min": lambda a, b: (
        f"(CASE WHEN isnan({a}) OR isnan({b}) THEN {_NAN} "
        f"ELSE least({a}, {b}) END)"
    ),
    "pow": lambda a, b: (
        f"(CASE WHEN ({b}) = 0.0 THEN 1.0 "
        f"WHEN isnan({a}) OR isnan({b}) THEN {_NAN} "
        f"WHEN abs({a}) = 1.0 AND isinf({b}) THEN {_NAN} "
        f"ELSE pow({a}, {b}) END)"
    ),
    "sin": _sql_trig("sin"),
    "sinh": lambda x: f"((exp({x}) - exp(-({x}))) / 2.0)",
    "sqrt": _sql_sqrt,
    "tan": _sql_trig("tan"),
    "tanh": lambda x: (
        # isnan FIRST: DuckDB orders NaN above every number, so the
        # x > 20 saturation guard would otherwise fire on NaN
        f"(CASE WHEN isnan({x}) THEN {_NAN} "
        f"WHEN ({x}) > 20.0 THEN 1.0 WHEN ({x}) < -20.0 THEN -1.0 "
        f"ELSE (exp(2.0*({x})) - 1.0) / (exp(2.0*({x})) + 1.0) END)"
    ),
}


def _sql_double(node: Node, env: dict[str, str]) -> str:
    if node.is_long:
        return f"(CAST({_sql_long(node, env)} AS DOUBLE))"
    if node.kind == "num":
        return _flit(float(node.val))
    if node.kind == "var":
        return f"(CAST({env[node.val]} AS DOUBLE))"
    if node.kind == "call":
        return (
            f"(CAST({_SQL_FUNCS[node.val](*[_sql_double(a, env) for a in node.args])}"
            f" AS DOUBLE))"
        )
    if node.kind == "unary":
        op = node.val
        if op == "+":
            return _sql_double(node.args[0], env)
        if op == "-":
            return f"(-{_sql_double(node.args[0], env)})"
        if op == "!":
            return (
                f"(CASE WHEN {_sql_truthy(node.args[0], env)} "
                f"THEN 0.0 ELSE 1.0 END)"
            )
        raise AssertionError(op)
    if node.kind == "cond":
        c, a, b = node.args
        return (
            f"(CASE WHEN {_sql_truthy(c, env)} THEN {_sql_double(a, env)} "
            f"ELSE {_sql_double(b, env)} END)"
        )
    op = node.val
    if op in ("&&", "||"):
        j = "AND" if op == "&&" else "OR"
        return (
            f"(CASE WHEN {_sql_truthy(node.args[0], env)} {j} "
            f"{_sql_truthy(node.args[1], env)} THEN 1.0 ELSE 0.0 END)"
        )
    a = _sql_double(node.args[0], env)
    b = _sql_double(node.args[1], env)
    if op in ("==", "!=", "<", "<=", ">", ">="):
        sop = {"==": "=", "!=": "<>"}.get(op, op)
        nan_case = "1.0" if op == "!=" else "0.0"
        return (
            f"(CASE WHEN isnan({a}) OR isnan({b}) THEN {nan_case} "
            f"WHEN {a} {sop} {b} THEN 1.0 ELSE 0.0 END)"
        )
    if op == "%":
        # DuckDB mod() == C fmod (its fmod() is the FLOORED variant!)
        return (
            f"(CASE WHEN ({b}) <> 0.0 THEN mod({a}, {b}) "
            f"ELSE CAST('nan' AS DOUBLE) END)"
        )
    if op == "/":
        return (
            f"(CASE WHEN ({b}) <> 0.0 THEN (CAST({a} AS DOUBLE) / {b}) "
            f"WHEN isnan({a}) OR ({a}) = 0.0 THEN CAST('nan' AS DOUBLE) "
            f"WHEN ({a}) > 0.0 THEN CAST('inf' AS DOUBLE) "
            f"ELSE CAST('-inf' AS DOUBLE) END)"
        )
    return f"({a} {op} {b})"


def _sql_long(node: Node, env: dict[str, str]) -> str:
    if node.kind == "unary" and node.val == "~":
        return f"(~{_sql_long(node.args[0], env)})"
    if node.kind == "bin" and node.val in ("&", "|", "^", "<<", ">>", ">>>"):
        a = _sql_long(node.args[0], env)
        op = node.val
        if op in ("<<", ">>", ">>>"):
            s = f"({_sql_d2i(_sql_double(node.args[1], env))} & 63)"
            if op == "<<":
                # DuckDB << overflows BIGINT (errors); emulate the JVM
                # wraparound via 64-bit multiply in HUGEINT then wrap
                wide = f"(CAST({a} AS HUGEINT) * CAST((CAST(1 AS HUGEINT) << {s}) AS HUGEINT))"
                lo = f"(({wide}) & CAST(18446744073709551615 AS HUGEINT))"
                return (
                    f"(CAST((CASE WHEN {lo} > 9223372036854775807 "
                    f"THEN {lo} - 18446744073709551616 ELSE {lo} END) AS BIGINT))"
                )
            if op == ">>":
                return f"({a} >> {s})"
            # >>> logical: mask after arithmetic shift
            return (
                f"(CASE WHEN {s} = 0 THEN {a} ELSE "
                f"(({a} >> {s}) & (9223372036854775807 >> ({s} - 1))) END)"
            )
        b = _sql_long(node.args[1], env)
        if op == "^":
            return f"xor({a}, {b})"
        return f"({a} {op} {b})"
    return _sql_d2l(_sql_double(node, env))


def _sql_truthy(node: Node, env: dict[str, str]) -> str:
    if node.is_long:
        return f"({_sql_l2i(_sql_long(node, env))} <> 0)"
    return f"({_sql_d2i(_sql_double(node, env))} <> 0)"


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


class CompiledExpression:
    """A compiled scoring expression (JavascriptCompiler.compile analog).

    ``variables`` lists the external bindings the expression needs, in
    first-use order (Expression.variables)."""

    def __init__(self, source: str, root: Node):
        self.source = source
        self.root = root
        self.variables = self._collect_vars(root)

    @staticmethod
    def _collect_vars(root: Node) -> list[str]:
        seen: list[str] = []

        def walk(n: Node) -> None:
            if n.kind == "var" and n.val not in seen:
                seen.append(n.val)
            for a in n.args:
                if isinstance(a, Node):
                    walk(a)

        walk(root)
        return seen

    def _check(self, env: dict) -> None:
        missing = [v for v in self.variables if v not in env]
        if missing:
            raise ValueError(
                f"unbound variables {missing} in {self.source!r}; "
                f"bindings provide {sorted(env)}"
            )

    def to_column(self, bindings: dict[str, Column]) -> Column:
        self._check(bindings)
        return _col_double(self.root, bindings)

    def to_sql(self, bindings: dict[str, str]) -> str:
        self._check(bindings)
        return _sql_double(self.root, bindings)

    def evaluate(self, bindings: dict[str, float]) -> float:
        self._check(bindings)
        return _py_eval_double(self.root, bindings)


def compile_expression(source: str) -> CompiledExpression:
    """JavascriptCompiler.compile analog: parse + validate ``source``.

    Raises ValueError on syntax errors, unknown functions, and wrong
    arity (the reference's ParseException cases)."""
    root = _Parser(_lex(source), source).parse()

    def check(n: Node) -> None:
        if n.kind == "call":
            if n.val not in _FUNCTIONS:
                raise ValueError(
                    f"Unrecognized function call ({n.val}) in {source!r}"
                )
            if len(n.args) != _FUNCTIONS[n.val]:
                raise ValueError(
                    f"Expected ({_FUNCTIONS[n.val]}) arguments for function "
                    f"call ({n.val}), encountered ({len(n.args)})"
                )
        for a in n.args:
            if isinstance(a, Node):
                check(a)

    check(root)
    return CompiledExpression(source, root)
