"""Flexible query parser — StandardQueryParser + PrecedenceQueryParser.

Re-expresses the reference's flexible parser framework
(Lucene.Net.QueryParser/Flexible/Standard/StandardQueryParser.cs) as a
recursive-descent parse over the classic lexer plus the processor-pipeline
semantics that differ from the classic grammar:

- the StandardSyntaxParser grammar has real operator precedence
  (StandardSyntaxParser.cs:170-172):
      Query     ::= DisjQuery ( DisjQuery )*        juxtaposition
      DisjQuery ::= ConjQuery ( OR ConjQuery )*
      ConjQuery ::= ModClause ( AND ModClause )*
  but StandardQueryParser then FLATTENS nested boolean nodes back into
  their boolean root ("no precedence",
  Processors/BooleanQuery2ModifierNodeProcessor.cs:146-151), tagging
  AndQueryNode children MUST (and, under default_operator=AND, the
  default juxtaposition node's children too) without overriding explicit
  +/-/NOT modifiers. Parenthesized groups (GroupQueryNode) stop the
  flattening, so `(a b) c` keeps its nesting while `a AND b OR c`
  flattens to must=[a,b], should=[c];
- PrecedenceQueryParser keeps the nesting (Flexible/Precedence/
  Processors/BooleanModifiersQueryNodeProcessor.cs applies the same
  modifier rules WITHOUT the flatten), so `a AND b OR c` scores as
  OR(AND(a,b), c);
- NOT is a prefix modifier equivalent to `-`/`!` (StandardSyntaxParser
  Modifiers()), not the classic binary operator; `&&`/`||` alias AND/OR;
- open-range operator syntax `field:>v  >=v  <v  <=v`
  (StandardSyntaxParser.cs:376-420 OP_LESSTHAN..OP_MORETHANEQ ->
  TermRangeQueryNode with one bound open, OpenRangeQueryNodeProcessor.cs)
  and `field=v` as a synonym for `field:v` (OP_EQUAL) — open ranges
  compile to the engine's typed-column pushdown FilteredQuery exactly
  like the classic `field:[a TO b]` production;
- multi-field expansion (Processors/MultiFieldQueryNodeProcessor.cs:
  95-104): an UNFIELDED field-able leaf is cloned once per configured
  field and the clones grouped under an OR — here a nested SHOULD
  BooleanQuery leaf (the group keeps it from flattening). The default
  text field analyzes as usual; keyword fields match the raw token
  verbatim (this engine's PerFieldAnalyzerWrapper convention). Multiterm
  tokens (wildcard/prefix/fuzzy/regexp) only exist over the analyzed
  text field's terms dictionary, so expanding one onto a keyword field
  raises loudly instead of silently matching nothing;
- group boosts `( ... )^2` (BoostQueryNodeProcessor.cs) multiply down
  into the group's clauses at parse time, float32 per level, exactly the
  reference's topLevelBoost fold at Weight-creation time.

Everything atom-level (terms, phrases, fuzzy, wildcard, regexp, ranges,
analysis) is shared with the classic parser (`plans/parser.py`) — the
flexible framework reuses the same leaf productions.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass

import numpy as np

from .parser import _atom_query, _field_range_query, _lex
from .query import (
    BooleanQuery,
    Query,
    TermQuery,
    simplify,
)


class ParserException(ValueError):
    """Flexible/Core/QueryNodeParseException — bad or unsupported syntax."""


# -- parse-tree nodes (the IQueryNode shapes that matter) ---------------------


@dataclass
class _NBool:
    kind: str  # "default" (juxtaposition) | "and" | "or"
    children: list


@dataclass
class _NMod:
    mod: str  # "+" | "-"
    child: object


@dataclass
class _NGroup:
    inner: _NBool
    boost: float = 1.0


@dataclass
class _NLeaf:
    query: Query


_FIELD_COLON = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):$")
_OPEN_RANGE = re.compile(
    r"^([A-Za-z_][A-Za-z0-9_]*):(>=|<=|>|<)(.*)$", re.S
)
_FIELD_EQUAL = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)=(.+)$", re.S)
_BOOST_TOK = re.compile(r"^\^(\d+(?:\.\d+)?)$")
_MULTITERM = re.compile(r"[*?~]|^/.*/$")


def _apply_boost(q: Query, b: float) -> Query:
    """Fold a group boost down into the clauses, float32 per level — the
    reference multiplies boost into child Weights at CreateWeight time
    (topLevelBoost), so nested group boosts compound in float32."""
    if b == 1.0 or q is None:
        return q
    if isinstance(q, BooleanQuery):
        f = lambda c: _apply_boost(c, b)  # noqa: E731
        return dataclasses.replace(
            q,
            must=tuple(f(c) for c in q.must),
            should=tuple(f(c) for c in q.should),
        )
    return dataclasses.replace(
        q, boost=float(np.float32(np.float32(q.boost) * np.float32(b)))
    )


class _Parser:
    def __init__(self, fields: tuple[str, ...], analyzer: str):
        if not fields:
            raise ParserException("at least one field is required")
        self.fields = tuple(fields)
        self.analyzer = analyzer
        self.toks: list[str] = []
        self.pos = 0

    # -- token helpers ---------------------------------------------------------

    def _peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self) -> str:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    # -- grammar (StandardSyntaxParser.cs:170-172) ------------------------------

    def parse(self, s: str) -> _NBool:
        self.toks = _lex(s)
        self.pos = 0
        root = self._query(0)
        if self._peek() is not None:
            raise ParserException(f"unbalanced ) at token {self._peek()!r}")
        return root

    def _query(self, depth: int) -> _NBool:
        children = []
        while self._peek() is not None and self._peek() != ")":
            c = self._disj(depth)
            if c is not None:
                children.append(c)
        return _NBool("default", children)

    def _disj(self, depth: int):
        items = []
        first = self._conj(depth)
        if first is not None:
            items.append(first)
        while self._peek() in ("OR", "||"):
            self._next()
            c = self._conj(depth)
            if c is not None:
                items.append(c)
        if not items:
            return None
        return items[0] if len(items) == 1 else _NBool("or", items)

    def _conj(self, depth: int):
        items = []
        first = self._mod_clause(depth)
        if first is not None:
            items.append(first)
        while self._peek() in ("AND", "&&"):
            self._next()
            c = self._mod_clause(depth)
            if c is not None:
                items.append(c)
        if not items:
            return None
        return items[0] if len(items) == 1 else _NBool("and", items)

    def _mod_clause(self, depth: int):
        # Modifiers(): [ + | - | NOT | ! ] — a prefix modifier, NOT the
        # classic binary NOT operator
        mod: str | None = None
        while True:
            t = self._peek()
            if t == "+":
                mod = "+"
                self._next()
            elif t in ("-", "NOT", "!"):
                mod = "-"
                self._next()
            elif t is not None and t.startswith("!") and len(t) > 1:
                mod = "-"
                self.toks[self.pos] = t[1:]
                break
            else:
                break
        c = self._clause(depth)
        if c is None:
            return None
        return _NMod(mod, c) if mod else c

    def _clause(self, depth: int):
        t = self._peek()
        if t is None:
            return None
        if t == "(":
            self._next()
            inner = self._query(depth + 1)
            if self._peek() != ")":
                raise ParserException("unbalanced (")
            self._next()
            boost = 1.0
            nxt = self._peek()
            if nxt is not None:
                bm = _BOOST_TOK.match(nxt)
                if bm:
                    boost = float(bm.group(1))
                    self._next()
            if not inner.children:
                return None
            return _NGroup(inner, boost)
        if t in ("[", "{"):
            return self._bare_range()
        m = _OPEN_RANGE.match(t)
        if m and m.group(3):
            self._next()
            return self._open_range(m.group(1), m.group(2), m.group(3))
        fm = _FIELD_COLON.match(t)
        if fm:
            # split-token forms: `field: >= 5`, `field: [a TO b]`,
            # `field: term`
            nxt = self.toks[self.pos + 1] if self.pos + 1 < len(self.toks) else None
            if nxt in ("[", "{"):
                self._next()
                return self._field_range(fm.group(1))
            if nxt is not None and re.fullmatch(r">=|<=|>|<", nxt):
                self._next()
                op = self._next()
                if self._peek() is None:
                    raise ParserException(f"{t}{op} needs a bound")
                return self._open_range(fm.group(1), op, self._next())
            if nxt is not None and nxt not in (")", "(", "]", "}"):
                self._next()
                val = self._next()
                return self._atom(f"{fm.group(1)}:{val}")
            raise ParserException(f"dangling field token {t!r}")
        em = _FIELD_EQUAL.match(t)
        if em and ":" not in t:
            # OP_EQUAL: `field=value` is a synonym for `field:value`
            self._next()
            return self._atom(f"{em.group(1)}:{em.group(2)}")
        self._next()
        return self._atom(t)

    def _bare_range(self):
        opener = self._next()
        lo = self._next()
        if self._next() != "TO":
            raise ParserException("range syntax: [a TO b]")
        hi = self._next()
        closer = self._next()
        if closer not in ("]", "}"):
            raise ParserException("range syntax: [a TO b]")
        from .query import TermRangeQuery

        return _NLeaf(
            TermRangeQuery(
                lower=None if lo == "*" else lo.lower(),
                upper=None if hi == "*" else hi.lower(),
                include_lower=opener == "[",
                include_upper=closer == "]",
            )
        )

    def _field_range(self, field: str):
        opener = self._next()
        lo = self._next()
        if self._next() != "TO":
            raise ParserException("range syntax: field:[a TO b]")
        hi = self._next()
        closer = self._next()
        return _NLeaf(
            _field_range_query(field, lo, hi, opener == "[", closer == "]")
        )

    def _open_range(self, field: str, op: str, bound: str):
        # OP_LESSTHAN/..EQ/OP_MORETHAN/..EQ -> TermRangeQueryNode with one
        # open bound (OpenRangeQueryNodeProcessor.cs OPEN_RANGE_TOKEN) ->
        # the same typed-column pushdown as field:[a TO b]
        if field == "text":
            raise ParserException(
                "open-range operators apply to typed doc columns, not the "
                "analyzed text field"
            )
        if op in (">", ">="):
            return _NLeaf(
                _field_range_query(field, bound, "*", op == ">=", True)
            )
        return _NLeaf(_field_range_query(field, "*", bound, True, op == "<="))

    # -- leaves: multi-field expansion ------------------------------------------

    def _atom(self, tok: str):
        fm = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", tok, re.S)
        if fm:
            q = _atom_query(tok, self.analyzer)
            return _NLeaf(q) if q is not None else None
        # unfielded: MultiFieldQueryNodeProcessor clones the leaf per field
        # and groups the clones under an OR (GroupQueryNode(OrQueryNode))
        per_field: list[Query] = []
        for f in self.fields:
            q = self._atom_for_field(tok, f)
            if q is not None:
                per_field.append(q)
        if not per_field:
            return None
        if len(per_field) == 1:
            return _NLeaf(per_field[0])
        return _NLeaf(BooleanQuery(should=tuple(per_field)))

    def _atom_for_field(self, tok: str, field: str) -> Query | None:
        if field == "text":
            return _atom_query(tok, self.analyzer)
        if _MULTITERM.search(tok):
            raise ParserException(
                f"multiterm token {tok!r} cannot expand onto keyword field "
                f"{field!r} — wildcard/fuzzy/regexp rewrite against the "
                "analyzed text field's terms dictionary only"
            )
        boost = 1.0
        bm = re.search(r"\^(\d+(?:\.\d+)?)$", tok)
        if bm:
            boost = float(bm.group(1))
            tok = tok[: bm.start()]
        if tok.startswith('"') and tok.endswith('"') and len(tok) > 1:
            tok = tok[1:-1]  # keyword fields match the quoted value verbatim
        return TermQuery(term=tok, field=field, boost=boost)


# -- modifier application + flatten/keep --------------------------------------


def _leaf_query(node, usingAnd: bool) -> Query | None:
    if isinstance(node, _NLeaf):
        return node.query
    if isinstance(node, _NGroup):
        q = _finalize_flat(node.inner, usingAnd)
        return _apply_boost(q, node.boost)
    raise AssertionError(type(node))


def _finalize_flat(root: _NBool, usingAnd: bool) -> Query | None:
    """BooleanQuery2ModifierNodeProcessor: flatten nested boolean nodes
    into the boolean root (TAG_REMOVE), tag And-children MUST, apply
    modifiers without overriding explicit ones. Groups stop the flatten."""
    buf: list[tuple[Query, str | None]] = []

    def collect(node: _NBool):
        req = node.kind == "and" or (usingAnd and node.kind == "default")
        for c in node.children:
            if isinstance(c, _NBool):
                collect(c)
                continue
            mod: str | None = None
            inner = c
            if isinstance(c, _NMod):
                mod = c.mod
                inner = c.child
            if isinstance(inner, _NBool):
                # a modifier on a bare boolean production cannot occur: the
                # grammar only modifies Clause (leaf/group) nodes
                collect(inner)
                continue
            q = _leaf_query(inner, usingAnd)
            if q is None:
                continue
            if mod is None and req:
                mod = "+"
            buf.append((q, mod))

    collect(root)
    if not buf:
        return None
    return simplify(
        BooleanQuery(
            must=tuple(q for q, m in buf if m == "+"),
            should=tuple(q for q, m in buf if m is None),
            must_not=tuple(q for q, m in buf if m == "-"),
        )
    )


def _finalize_nested(node, usingAnd: bool) -> Query | None:
    """Precedence/Processors/BooleanModifiersQueryNodeProcessor: the same
    modifier rules, but nested boolean nodes KEEP their structure."""
    if isinstance(node, _NLeaf):
        return node.query
    if isinstance(node, _NGroup):
        return _apply_boost(_finalize_nested(node.inner, usingAnd), node.boost)
    if isinstance(node, _NMod):
        raise AssertionError("modifiers are applied by the parent boolean")
    assert isinstance(node, _NBool)
    req = node.kind == "and" or (usingAnd and node.kind == "default")
    must: list[Query] = []
    should: list[Query] = []
    must_not: list[Query] = []
    for c in node.children:
        mod: str | None = None
        inner = c
        if isinstance(c, _NMod):
            mod = c.mod
            inner = c.child
        q = _finalize_nested(inner, usingAnd)
        if q is None:
            continue
        if mod == "-":
            must_not.append(q)
        elif mod == "+" or (mod is None and req):
            must.append(q)
        else:
            should.append(q)
    if not must and not should and not must_not:
        return None
    return simplify(
        BooleanQuery(
            must=tuple(must), should=tuple(should), must_not=tuple(must_not)
        )
    )


# -- public API ----------------------------------------------------------------


def standard_parse(
    s: str,
    fields: tuple[str, ...] = ("text",),
    default_operator: str = "OR",
    analyzer: str = "standard",
) -> Query:
    """StandardQueryParser.Parse (StandardQueryParser.cs:140-152): the
    precedence-aware grammar whose nested boolean nodes are then flattened
    ("no precedence"), with multi-field expansion when `fields` names more
    than one field (SetMultiFields)."""
    root = _Parser(fields, analyzer).parse(s)
    q = _finalize_flat(root, default_operator == "AND")
    return q if q is not None else BooleanQuery()


def precedence_parse(
    s: str,
    fields: tuple[str, ...] = ("text",),
    default_operator: str = "OR",
    analyzer: str = "standard",
) -> Query:
    """PrecedenceQueryParser (Flexible/Precedence/PrecedenceQueryParser.cs):
    identical grammar and modifier rules, but AND/OR precedence is KEPT —
    `a AND b OR c` scores as OR(AND(a, b), c)."""
    root = _Parser(fields, analyzer).parse(s)
    q = _finalize_nested(root, default_operator == "AND")
    return q if q is not None else BooleanQuery()
