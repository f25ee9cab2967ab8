"""Surround query parser — proximity grammar onto the span machinery.

Re-expresses the reference surround language
(Lucene.Net.QueryParser/Surround/Parser/QueryParser.cs — generated from
QueryParser.jj) as a recursive-descent parser producing this engine's
Query IR:

- infix precedence chain ``OR < AND < NOT < N < W`` and the prefix forms
  ``OP(a, b, ...)`` (QueryParser.cs TopSrndQuery -> OrQuery -> AndQuery ->
  NotQuery -> NQuery -> WQuery -> PrimaryQuery); operators are
  case-insensitive;
- distance operators carry an optional 2-99 distance prefix (``3W``,
  ``5N``): W is ORDERED, N is UNORDERED (QueryParser.cs:348-390 — the
  class doc comment has them swapped; the code is authoritative), and a
  DistanceQuery becomes ``SpanNearQuery(slop=distance-1, in_order)``
  exactly like DistanceQuery.cs:107 ``new SpanNearQuery(clauses,
  OpDistance - 1, QueriesOrdered)``;
- distance operands must be distance-compatible (DistanceQuery.cs
  DistanceSubQueryNotAllowed): terms, truncations, OR compositions and
  nested distance queries map to SpanTerm/SpanMultiTermQueryWrapper/
  SpanOr/SpanNear (SpanNearClauseFactory.cs); AND/NOT inside a distance
  operator raise the reference's "does not allow subquery" error;
- ``abc*`` is a prefix query (SrndPrefixQuery.cs) and ``a?c*`` a
  truncation (SrndTruncQuery.cs -> WildcardQuery here); both enforce the
  >= 3 normal-character minimum (QueryParser.cs:63
  minimumPrefixLength / AllowedTruncation, "Too unrestrictive
  truncation");
- ``field :`` prefixes retarget the subquery (FieldsQuery.cs; a list of
  fields ORs per-field copies); distance/truncation queries only run on
  the analyzed text field (keyword columns carry no positions);
- ``^w`` weights multiply into Query.boost (OptionalWeights,
  SrndQuery.Weight);
- terms are matched VERBATIM — the surround parser performs no analysis
  (SrndTermQuery.cs keeps the token image; BasicQueryFactory builds the
  TermQuery with it unchanged).
"""

from __future__ import annotations

import re
from dataclasses import replace

from .query import BooleanQuery, PrefixQuery, Query, TermQuery, WildcardQuery

_MIN_PREFIX = 3  # QueryParser.cs:63 minimumPrefixLength / minimumCharsInTrunc
_TRUNC_ERR = "Too unrestrictive truncation: "  # QueryParser.cs:65

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<colon>:)
  | (?P<carat>\^(?P<weight>\d+(?:\.\d+)?))
  | (?P<quoted>"[^"]*")
  | (?P<word>[^\s(),:^"]+)
    """,
    re.VERBOSE,
)

_DIST_RE = re.compile(r"^([2-9]|[1-9][0-9])?([WwNn])$")
_OPS = {"or", "and", "not"}


def _lex(s: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    for m in _TOKEN_RE.finditer(s):
        if s[pos : m.start()].strip():
            raise ValueError(f"surround: cannot lex {s[pos:m.start()]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "carat":
            toks.append(("carat", m.group("weight")))
        elif kind == "word":
            w = m.group("word")
            dm = _DIST_RE.match(w)
            if w.lower() in _OPS:
                toks.append(("op", w.lower()))
            elif dm:
                toks.append(("dist", w))
            else:
                toks.append(("term", w))
        elif kind == "quoted":
            toks.append(("qterm", m.group("quoted")[1:-1]))
        else:
            toks.append((kind, m.group()))
    if s[pos:].strip():
        raise ValueError(f"surround: cannot lex {s[pos:]!r}")
    return toks


# -- AST ----------------------------------------------------------------------
# (kind, payload, weight): kind in {"term","prefix","trunc","or","and",
# "not","dist","fields"}; weight multiplies into the realized boost.


class _Node:
    __slots__ = ("kind", "args", "text", "dist", "ordered", "fields", "weight")

    def __init__(self, kind, args=(), text="", dist=1, ordered=True, fields=()):
        self.kind = kind
        self.args = list(args)
        self.text = text
        self.dist = dist
        self.ordered = ordered
        self.fields = list(fields)
        self.weight = 1.0


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, kind: str | None = None) -> tuple[str, str]:
        t = self.peek()
        if t is None or (kind is not None and t[0] != kind):
            raise ValueError(
                f"surround: expected {kind or 'token'}, got {t!r} at {self.i}"
            )
        self.i += 1
        return t

    # TopSrndQuery := FieldsQuery <EOF>
    def top(self) -> _Node:
        q = self.fields_query()
        if self.peek() is not None:
            raise ValueError(f"surround: trailing input at token {self.peek()!r}")
        return q

    # FieldsQuery := (term ':')* OrQuery   (QueryParser.cs OptionalFields)
    def fields_query(self) -> _Node:
        fields: list[str] = []
        while (
            self.peek() is not None
            and self.peek()[0] == "term"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1][0] == "colon"
        ):
            fields.append(self.take("term")[1])
            self.take("colon")
        q = self.or_query()
        if fields:
            n = _Node("fields", args=[q], fields=fields)
            return n
        return q

    def _infix(self, sub, opname: str) -> _Node:
        q = sub()
        ops: list[_Node] = [q]
        while True:
            t = self.peek()
            if t is not None and t[0] == "op" and t[1] == opname:
                self.take("op")
                ops.append(sub())
            else:
                break
        if len(ops) == 1:
            return ops[0]
        return _Node(opname, args=ops)

    def or_query(self) -> _Node:
        return self._infix(self.and_query, "or")

    def and_query(self) -> _Node:
        return self._infix(self.not_query, "and")

    def not_query(self) -> _Node:
        return self._infix(self.n_query, "not")

    def _dist_infix(self, sub, letter: str, ordered: bool) -> _Node:
        q = sub()
        ops: list[_Node] = [q]
        dist = 1
        while True:
            t = self.peek()
            if t is not None and t[0] == "dist" and t[1][-1].lower() == letter:
                tok = self.take("dist")[1]
                # GetOpDistance: "W, 2W, 3W etc -> 1, 2, 3"; the infix chain
                # keeps the LAST operator token's distance (QueryParser.cs
                # GetDistanceQuery receives the final consumed token)
                dist = int(tok[:-1]) if len(tok) > 1 else 1
                ops.append(sub())
            else:
                break
        if len(ops) == 1:
            return ops[0]
        return _Node("dist", args=ops, dist=dist, ordered=ordered)

    def n_query(self) -> _Node:
        return self._dist_infix(self.w_query, "n", ordered=False)

    def w_query(self) -> _Node:
        return self._dist_infix(self.primary, "w", ordered=True)

    # PrimaryQuery := '(' FieldsQuery ')' | PrefixOp '(' list ')' | SimpleTerm
    def primary(self) -> _Node:
        t = self.peek()
        if t is None:
            raise ValueError("surround: unexpected end of input")
        if t[0] == "lparen":
            self.take("lparen")
            q = self.fields_query()
            self.take("rparen")
        elif t[0] in ("op", "dist") and self._next_is_lparen():
            q = self.prefix_op()
        elif t[0] in ("term", "qterm", "dist", "op"):
            # a bare W/N/AND/OR token not followed by '(' is a plain term
            q = self.simple_term()
        else:
            raise ValueError(f"surround: unexpected token {t!r}")
        return self.weights(q)

    def _next_is_lparen(self) -> bool:
        return (
            self.i + 1 < len(self.toks) and self.toks[self.i + 1][0] == "lparen"
        )

    def prefix_op(self) -> _Node:
        kind, image = self.take()
        self.take("lparen")
        args = [self.fields_query()]
        # FieldsQueryList: at least 2 operands (QueryParser.cs:473-490)
        self.take("comma")
        args.append(self.fields_query())
        while self.peek() is not None and self.peek()[0] == "comma":
            self.take("comma")
            args.append(self.fields_query())
        self.take("rparen")
        if kind == "op":
            if image == "not":
                raise ValueError(
                    "surround: NOT is infix-only (PrefixOperatorQuery "
                    "accepts OR/AND/W/N)"
                )
            return _Node(image, args=args)
        dist = int(image[:-1]) if len(image) > 1 else 1
        return _Node(
            "dist", args=args, dist=dist, ordered=image[-1].lower() == "w"
        )

    def simple_term(self) -> _Node:
        kind, image = self.take()
        if kind == "qterm":
            return _Node("term", text=image)
        n_norm = sum(1 for c in image if c not in "*?")
        if image.endswith("*") and "*" not in image[:-1] and "?" not in image:
            if len(image) - 1 < _MIN_PREFIX:
                raise ValueError(_TRUNC_ERR + image)
            return _Node("prefix", text=image[:-1])
        if "*" in image or "?" in image:
            if n_norm < _MIN_PREFIX:
                raise ValueError(_TRUNC_ERR + image)
            return _Node("trunc", text=image)
        return _Node("term", text=image)

    def weights(self, q: _Node) -> _Node:
        while self.peek() is not None and self.peek()[0] == "carat":
            q.weight *= float(self.take("carat")[1])
        return q


# -- realization to engine Query IR -------------------------------------------


def _boosted(q: Query, w: float) -> Query:
    return q if w == 1.0 else replace(q, boost=q.boost * w)


def _to_span(n: _Node, field: str):
    """DistanceSubQuery realization (SpanNearClauseFactory.cs): term ->
    SpanTerm, truncation -> SpanMultiTermQueryWrapper, OR -> SpanOr,
    nested distance -> SpanNear. Anything else is rejected with the
    reference's DistanceSubQueryNotAllowed message."""
    from ..operators import spans as sp

    if field != "text":
        raise ValueError(
            f"surround: distance operators need positions; field {field!r} "
            "is a keyword column"
        )
    if n.weight != 1.0:
        raise ValueError(
            "surround: weights on distance subqueries are not supported here"
        )
    if n.kind == "term":
        return sp.SpanTermQuery(term=n.text, field=field)
    if n.kind == "prefix":
        return sp.SpanMultiTermQueryWrapper(
            query=PrefixQuery(prefix=n.text), field=field
        )
    if n.kind == "trunc":
        return sp.SpanMultiTermQueryWrapper(
            query=WildcardQuery(pattern=n.text), field=field
        )
    if n.kind == "or":
        return sp.SpanOrQuery(
            clauses=tuple(_to_span(c, field) for c in n.args)
        )
    if n.kind == "dist":
        return sp.SpanNearQuery(
            clauses=tuple(_to_span(c, field) for c in n.args),
            slop=n.dist - 1,
            in_order=n.ordered,
        )
    if n.kind == "fields":
        if n.fields != [field] and n.fields != ["text"]:
            raise ValueError(
                "surround: field retargeting inside a distance operator is "
                "not supported"
            )
        return _to_span(n.args[0], n.fields[0])
    raise ValueError(
        f"surround: Operator {n.kind.upper()} does not allow subquery "
        "inside a distance operator (DistanceQuery.cs "
        "DistanceSubQueryNotAllowed)"
    )


def _realize(n: _Node, field: str) -> Query:
    if n.kind == "term":
        return _boosted(TermQuery(term=n.text, field=field), n.weight)
    if n.kind == "prefix":
        if field != "text":
            raise ValueError(
                f"surround: truncation on keyword field {field!r} unsupported"
            )
        return _boosted(PrefixQuery(prefix=n.text), n.weight)
    if n.kind == "trunc":
        if field != "text":
            raise ValueError(
                f"surround: truncation on keyword field {field!r} unsupported"
            )
        return _boosted(WildcardQuery(pattern=n.text), n.weight)
    if n.kind == "or":
        # OrQuery.cs MakeLuceneQueryFieldNoBoost: all SHOULD
        return _boosted(
            BooleanQuery(should=tuple(_realize(c, field) for c in n.args)),
            n.weight,
        )
    if n.kind == "and":
        # AndQuery.cs: all MUST
        return _boosted(
            BooleanQuery(must=tuple(_realize(c, field) for c in n.args)),
            n.weight,
        )
    if n.kind == "not":
        # NotQuery.cs: first MUST, rest MUST_NOT
        return _boosted(
            BooleanQuery(
                must=(_realize(n.args[0], field),),
                must_not=tuple(_realize(c, field) for c in n.args[1:]),
            ),
            n.weight,
        )
    if n.kind == "dist":
        from ..operators import spans as sp

        return _boosted(
            sp.SpanNearQuery(
                clauses=tuple(_to_span(c, field) for c in n.args),
                slop=n.dist - 1,
                in_order=n.ordered,
            ),
            n.weight,
        )
    if n.kind == "fields":
        # FieldsQuery.cs MakeLuceneQueryNoBoost: one field applies it;
        # several OR the per-field realizations
        subs = [_realize(n.args[0], f) for f in n.fields]
        q = subs[0] if len(subs) == 1 else BooleanQuery(should=tuple(subs))
        return _boosted(q, n.weight)
    raise AssertionError(n.kind)


def parse_surround(s: str, default_field: str = "text") -> Query:
    """Parse a surround query string into this engine's Query tree.

    ``parse_surround("value 3W table")`` -> ordered SpanNear slop 2;
    ``parse_surround("2N(hash, join)")`` -> unordered SpanNear slop 1;
    ``parse_surround("table AND (value OR row*)")`` -> boolean over
    term/prefix queries. Terms are NOT analyzed (reference parity)."""
    toks = _lex(s)
    if not toks:
        raise ValueError("surround: empty query")
    return _realize(_Parser(toks).top(), default_field)
