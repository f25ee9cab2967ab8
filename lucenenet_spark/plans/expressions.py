"""Lucene.Net.Expressions — the JavaScript expression compiler, re-derived
as a recursive-descent parser emitting one Catalyst Column (double typed).

References: Lucene.Net.Expressions/JS/JavascriptCompiler.cs (node cases
:231-475, DEFAULT_FUNCTIONS from JavascriptCompiler.properties),
JS/JavascriptParser.cs (precedence ladder), SimpleBindings.cs (name ->
SortField / sub-expression), ExpressionSortField.cs + ExpressionRescorer.cs
(the two consumption surfaces IndexSearcher.expression_sort/_rescore map to).

Semantics the compiler pins down, matching the reference's emitted IL:
  * every value is a double; comparisons and boolean ops yield 1.0 / 0.0,
    an operand is "true" iff != 0 (AT_BOOL_* / AT_COMP_* cases)
  * bitwise ops convert double -> long (C# truncation toward zero — the
    same rule Spark's double->long cast applies), operate, convert back;
    shift counts are masked to 6 bits like C# long shifts
  * ternary ?: is right-associative and lazy in VALUE only (both Column
    branches are expressions, not side effects, so when/otherwise is exact)
  * hex (0x...) and octal (0...) integer literals parse like the lexer's
    HEX / OCTAL tokens
  * haversin is rejected loudly: SloppyMath.Haversin's table-driven
    approximations have no exact SQL mirror (accepted deviation).

The compiled Column composes into whole-stage codegen — no UDF anywhere.
"""
from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<id>[A-Za-z_$][A-Za-z0-9_$]*(?:\.[A-Za-z_$][A-Za-z0-9_$]*)*)"
    r"|(?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()?:,<>!~&|^])"
    r")"
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"unparsable expression at: {src[pos:]!r}")
        pos = m.end()
        for kind in ("num", "id", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


def _lit(x: float) -> Column:
    return F.lit(float(x)).cast("double")


def _num(tok: str) -> Column:
    if tok.startswith(("0x", "0X")):
        return _lit(int(tok, 16))
    if re.fullmatch(r"0[0-7]+", tok):
        return _lit(int(tok, 8))  # OCTAL token
    return _lit(float(tok))


def _b2d(cond) -> Column:
    return F.when(cond, _lit(1.0)).otherwise(_lit(0.0))


def _truthy(c: Column):
    return c != _lit(0.0)


def _i64(c: Column) -> Column:
    return c.cast("long")


# name -> (arity, builder) — DEFAULT_FUNCTIONS (JavascriptCompiler.properties)
_FUNCTIONS = {
    "abs": (1, lambda a: F.abs(a)),
    "acos": (1, lambda a: F.acos(a)),
    "acosh": (1, lambda a: F.acosh(a)),
    "asin": (1, lambda a: F.asin(a)),
    "asinh": (1, lambda a: F.asinh(a)),
    "atan": (1, lambda a: F.atan(a)),
    "atanh": (1, lambda a: F.atanh(a)),
    "atan2": (2, lambda a, b: F.atan2(a, b)),
    "ceil": (1, lambda a: F.ceil(a).cast("double")),
    "cos": (1, lambda a: F.cos(a)),
    "cosh": (1, lambda a: F.cosh(a)),
    "exp": (1, lambda a: F.exp(a)),
    "floor": (1, lambda a: F.floor(a).cast("double")),
    "ln": (1, lambda a: F.log(a)),
    "log10": (1, lambda a: F.log10(a)),
    # MathUtil.Log(base, x) = ln(x) / ln(base)
    "logn": (2, lambda base, x: F.log(x) / F.log(base)),
    "max": (2, lambda a, b: F.greatest(a, b)),
    "min": (2, lambda a, b: F.least(a, b)),
    "pow": (2, lambda a, b: F.pow(a, b)),
    "sin": (1, lambda a: F.sin(a)),
    "sinh": (1, lambda a: F.sinh(a)),
    "sqrt": (1, lambda a: F.sqrt(a)),
    "tan": (1, lambda a: F.tan(a)),
    "tanh": (1, lambda a: F.tanh(a)),
}


class _Parser:
    def __init__(self, src: str, resolve):
        self.toks = _tokenize(src)
        self.i = 0
        self.resolve = resolve

    def peek(self):
        return self.toks[self.i]

    def take(self, op: str | None = None):
        kind, v = self.toks[self.i]
        if op is not None and (kind != "op" or v != op):
            raise ValueError(f"expected {op!r}, found {v!r}")
        self.i += 1
        return kind, v

    # precedence ladder, lowest first (JavascriptParser.cs conditional ->
    # logical_or -> ... -> unary -> primary)
    def expr(self) -> Column:
        cond = self.or_()
        if self.peek() == ("op", "?"):
            self.take("?")
            a = self.expr()
            self.take(":")
            b = self.expr()
            return F.when(_truthy(cond), a).otherwise(b)
        return cond

    def _chain(self, sub, ops):
        left = sub()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            _k, op = self.take()
            left = ops[op](left, sub())
        return left

    def or_(self):
        return self._chain(
            self.and_, {"||": lambda a, b: _b2d(_truthy(a) | _truthy(b))}
        )

    def and_(self):
        return self._chain(
            self.bitor, {"&&": lambda a, b: _b2d(_truthy(a) & _truthy(b))}
        )

    def bitor(self):
        return self._chain(
            self.bitxor,
            {"|": lambda a, b: _i64(a).bitwiseOR(_i64(b)).cast("double")},
        )

    def bitxor(self):
        return self._chain(
            self.bitand,
            {"^": lambda a, b: _i64(a).bitwiseXOR(_i64(b)).cast("double")},
        )

    def bitand(self):
        return self._chain(
            self.eq,
            {"&": lambda a, b: _i64(a).bitwiseAND(_i64(b)).cast("double")},
        )

    def eq(self):
        return self._chain(
            self.rel,
            {
                "==": lambda a, b: _b2d(a == b),
                "!=": lambda a, b: _b2d(a != b),
            },
        )

    def rel(self):
        return self._chain(
            self.shift,
            {
                "<": lambda a, b: _b2d(a < b),
                ">": lambda a, b: _b2d(a > b),
                "<=": lambda a, b: _b2d(a <= b),
                ">=": lambda a, b: _b2d(a >= b),
            },
        )

    def shift(self):
        def cnt(b):
            return _i64(b).bitwiseAND(F.lit(63).cast("long")).cast("int")

        def sh(fn):
            # the python wrappers take numBits as a literal int; the SQL
            # functions accept a column — call them by name
            return lambda a, b: F.call_function(fn, _i64(a), cnt(b)).cast(
                "double"
            )

        return self._chain(
            self.add,
            {
                "<<": sh("shiftleft"),
                ">>": sh("shiftright"),
                ">>>": sh("shiftrightunsigned"),
            },
        )

    def add(self):
        return self._chain(
            self.mul, {"+": lambda a, b: a + b, "-": lambda a, b: a - b}
        )

    def mul(self):
        return self._chain(
            self.unary,
            {
                "*": lambda a, b: a * b,
                "/": lambda a, b: a / b,
                "%": lambda a, b: a % b,  # double fmod, like C# %
            },
        )

    def unary(self) -> Column:
        kind, v = self.peek()
        if kind == "op" and v in ("-", "!", "~"):
            self.take()
            a = self.unary()
            if v == "-":
                return -a
            if v == "!":
                return _b2d(~_truthy(a))
            return _i64(a).bitwiseXOR(F.lit(-1).cast("long")).cast("double")
        return self.primary()

    def primary(self) -> Column:
        kind, v = self.take()
        if kind == "num":
            return _num(v)
        if kind == "op" and v == "(":
            inner = self.expr()
            self.take(")")
            return inner
        if kind == "id":
            if self.peek() == ("op", "("):
                if v == "haversin":
                    raise NotImplementedError(
                        "haversin has no exact mirror (SloppyMath table "
                        "approximations) — accepted deviation"
                    )
                if v not in _FUNCTIONS:
                    raise ValueError(f"unknown function {v!r}")
                arity, builder = _FUNCTIONS[v]
                self.take("(")
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.expr())
                    while self.peek() == ("op", ","):
                        self.take(",")
                        args.append(self.expr())
                self.take(")")
                if len(args) != arity:
                    raise ValueError(
                        f"{v} expects {arity} argument(s), got {len(args)}"
                    )
                return builder(*args)
            return self.resolve(v)
        raise ValueError(f"unexpected token {v!r}")


def compile_expression(src: str, resolve) -> Column:
    """Compile an expression to a double Column. resolve(name) -> Column
    supplies variable bindings (SimpleBindings.GetValueSource); it should
    raise ValueError for unknown names like the reference does."""
    p = _Parser(src, resolve)
    out = p.expr()
    if p.peek()[0] != "eof":
        raise ValueError(f"trailing input at {p.peek()[1]!r}")
    return out.cast("double")
