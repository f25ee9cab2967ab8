"""Classic query-string parser (subset of Lucene's classic syntax).

Grammar supported (reference: Lucene.Net.QueryParser/Classic/QueryParser.cs):
  term            free text token (analyzed with the index analyzer —
                  REQUIRED for parity, Util/QueryBuilder.cs)
  +term / -term   required / prohibited
  AND OR NOT      boolean operators (default OR, like QueryParser)
  ( ... )         grouping
  term^2.5        boost
  prefix*         PrefixQuery;   wild*card / wi?ld  WildcardQuery
  /regex/         RegexpQuery
  term~  term~1   FuzzyQuery (default max_edits 2)
  [a TO b] {a TO b}  TermRangeQuery (incl/excl bounds)
  "a phrase"      exact PhraseQuery;  "a phrase"~2  sloppy (slop=2)
  field:term      per-field term: text: analyzes as usual, any other field
                  is a keyword whose value matches verbatim (role:user,
                  tool:"web search")
"""

from __future__ import annotations

import re

from ..functions.analysis import tokenize_text
from .query import (
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    simplify,
)

_TOKEN_SPLIT = re.compile(
    r"""\s*(\(|\)|\[|\]|\{|\}|AND\b|OR\b|NOT\b|\+|-|/[^/]*/|(?:\w+:)?"[^"]*"[~^0-9.]*|[^\s()\[\]{}]+)"""
)

_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", re.S)


def _lex(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_SPLIT.match(s, pos)
        if not m:
            break
        out.append(m.group(1))
        pos = m.end()
    return out


_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2})?)?$")
_INT_RE = re.compile(r"^-?\d+$")


def _field_range_query(
    field: str, lo: str, hi: str, incl_lo: bool, incl_hi: bool
) -> Query:
    """field:[a TO b] over a typed doc column — NumericRangeQuery /
    DateTools semantics (Search/NumericRangeQuery.cs:1,
    Document/DateTools.cs): bounds parse as ints or ISO dates ('*' = open);
    the match set is a constant-score filter whose predicate pushes down to
    the typed parquet column (FilteredQuery over MatchAll)."""
    from .query import FilteredQuery, MatchAllQuery

    def lit(v: str) -> str:
        if _INT_RE.match(v):
            return v
        if _DATE_RE.match(v):
            iso = v.replace("T", " ")
            if len(iso) == 10:
                iso += " 00:00:00"
            elif len(iso) == 16:
                iso += ":00"
            return f"timestamp'{iso}'"
        return "'" + v.replace("'", "''") + "'"

    conds = []
    if lo != "*":
        conds.append(f"{field} >{'=' if incl_lo else ''} {lit(lo)}")
    if hi != "*":
        conds.append(f"{field} <{'=' if incl_hi else ''} {lit(hi)}")
    where = " AND ".join(conds) if conds else "TRUE"
    return FilteredQuery(query=MatchAllQuery(), where=where)


def _atom_query(tok: str, analyzer: str = "standard", phrase_fn=None) -> Query | None:
    boost = 1.0
    bm = re.search(r"\^(\d+(?:\.\d+)?)$", tok)
    if bm:
        boost = float(bm.group(1))
        tok = tok[: bm.start()]
    # field:term production (QueryParserBase.cs:171-244). The default text
    # field analyzes as usual; any other field is a keyword (StringField)
    # whose value matches VERBATIM — no analysis, like KeywordAnalyzer under
    # PerFieldAnalyzerWrapper.
    fm = _FIELD_RE.match(tok)
    if fm and fm.group(1) != "text":
        field, value = fm.group(1), fm.group(2)
        if value.startswith('"') and value.endswith('"') and len(value) > 1:
            value = value[1:-1]  # quoted keyword value (may contain spaces)
        return TermQuery(term=value, field=field, boost=boost)
    if fm:
        tok = fm.group(2)  # text: prefix is the default field
    if tok.startswith('"'):
        # "exact phrase" / "sloppy phrase"~2 — analyzed with the index
        # analyzer; query positions keep stopword/too-long gaps
        # (QueryParserBase.cs:244 PhraseSlop, QueryBuilder analyzed phrase).
        # "(a|b) c" — per-slot alternatives -> MultiPhraseQuery (the classic
        # parser has no such syntax; Lucene builds these programmatically —
        # MultiPhraseQuery.cs usage docs — this is our surface for it)
        pm = re.match(r'"([^"]*)"(?:~(\d+))?$', tok)
        if not pm:
            raise ValueError(f"malformed phrase token {tok!r}")
        body, slop = pm.group(1), int(pm.group(2) or 0)
        if phrase_fn is not None:
            # ComplexPhraseQueryParser route: phrase contents may hold
            # wildcards/fuzzy/negations and compile to span queries
            return phrase_fn(body, slop, boost)
        if re.search(r"\(.*\|.*\)", body):
            return _multi_phrase(body, slop, boost, analyzer)
        from ..functions.analysis import tokenize_with_positions

        toks, poss = tokenize_with_positions(body, analyzer)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(term=toks[0], boost=boost)
        return PhraseQuery(
            terms=tuple(toks),
            positions=tuple(poss),
            slop=slop,
            boost=boost,
        )
    fuzz = re.search(r"~(\d*)$", tok)
    if fuzz:
        base = tok[: fuzz.start()].lower()
        edits = int(fuzz.group(1)) if fuzz.group(1) else 2
        return FuzzyQuery(term=base, max_edits=edits, boost=boost)
    if tok.startswith("/") and tok.endswith("/") and len(tok) > 1:
        return RegexpQuery(pattern=tok[1:-1], boost=boost)
    if "*" in tok or "?" in tok:
        low = tok.lower()
        if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
            return PrefixQuery(prefix=low[:-1], boost=boost)
        return WildcardQuery(pattern=low, boost=boost)
    # plain term: run through the same analyzer as indexing (QueryBuilder.cs)
    toks = tokenize_text(tok, analyzer)
    if not toks:
        return None  # stopword/empty -> no clause, like the analyzer dropping it
    if len(toks) == 1:
        return TermQuery(term=toks[0], boost=boost)
    return BooleanQuery(should=tuple(TermQuery(term=t) for t in toks), boost=boost)


def _multi_phrase(
    body: str, slop: int, boost: float, analyzer: str = "standard"
) -> Query | None:
    """'(a|b) c' phrase body -> MultiPhraseQuery. One position slot per
    whitespace spec; a (x|y) group's alternatives are analyzed individually;
    specs that analyze away (stopwords) leave a position gap, like the
    analyzed-phrase path."""
    from .query import MultiPhraseQuery

    arrays: list[tuple[str, ...]] = []
    positions: list[int] = []
    pos_i = 0
    for spec in body.split():
        gm = re.fullmatch(r"\((.*)\)", spec)
        alts = gm.group(1).split("|") if gm else [spec]
        terms: list[str] = []
        for a in alts:
            terms.extend(tokenize_text(a, analyzer))
        if terms:
            arrays.append(tuple(dict.fromkeys(terms)))
            positions.append(pos_i)
        pos_i += 1  # dropped (stopword) specs still consume a position
    if not arrays:
        return None
    if len(arrays) == 1 and len(arrays[0]) == 1:
        return TermQuery(term=arrays[0][0], boost=boost)
    return MultiPhraseQuery(
        term_arrays=tuple(arrays),
        positions=tuple(positions),
        slop=slop,
        boost=boost,
    )


def parse(
    s: str, default_operator: str = "OR", analyzer: str = "standard",
    phrase_fn=None,
) -> Query:
    """Parse a classic query string into a Query tree.

    `analyzer` runs term/phrase words through the same chain as indexing
    (QueryParser(analyzer) semantics — "english" stems, so parse("merging",
    analyzer="english") searches the stemmed index term "merg"). Wildcard/
    prefix/regexp/range/fuzzy tokens bypass analysis like the classic QP.
    `phrase_fn(body, slop, boost)` overrides quoted-phrase compilation
    (the ComplexPhraseQueryParser hook).
    """
    toks = _lex(s)
    pos = 0

    def parse_clauses(depth: int) -> Query:
        nonlocal pos
        must: list[Query] = []
        should: list[Query] = []
        must_not: list[Query] = []
        pending_op: str | None = None
        pending_mod: str | None = None

        def add(q: Query | None):
            nonlocal pending_op, pending_mod
            if q is None:
                pending_op = pending_mod = None
                return
            if pending_mod == "+":
                must.append(q)
            elif pending_mod == "-":
                must_not.append(q)
            elif pending_op == "AND":
                # classic parser: AND promotes previous+this to required
                if should:
                    must.append(should.pop())
                must.append(q)
            elif pending_op == "NOT":
                must_not.append(q)
            else:
                if default_operator == "AND" and pending_op != "OR":
                    must.append(q)
                else:
                    should.append(q)
            pending_op = pending_mod = None

        while pos < len(toks):
            t = toks[pos]
            if t == ")":
                if depth == 0:
                    raise ValueError("unbalanced )")
                pos += 1
                break
            pos += 1
            if t == "(":
                add(parse_clauses(depth + 1))
            elif t in ("AND", "OR", "NOT"):
                pending_op = t
            elif t in ("+", "-"):
                pending_mod = t
            elif t in ("[", "{"):
                lo = toks[pos]
                assert toks[pos + 1] == "TO", "range syntax: [a TO b]"
                hi = toks[pos + 2]
                closer = toks[pos + 3]
                pos += 4
                add(
                    TermRangeQuery(
                        lower=None if lo == "*" else lo.lower(),
                        upper=None if hi == "*" else hi.lower(),
                        include_lower=t == "[",
                        include_upper=closer == "]",
                    )
                )
            elif (
                re.fullmatch(r"\w+:", t)
                and pos + 4 < len(toks) + 1
                and pos < len(toks)
                and toks[pos] in ("[", "{")
            ):
                # field:[a TO b] — numeric/date/keyword range on a typed doc
                # column: NumericRangeQuery/DateTools semantics
                # (Search/NumericRangeQuery.cs:1, Document/DateTools.cs) —
                # constant-score filter, predicate pushed to the typed
                # parquet column via FilteredQuery
                field = t[:-1]
                opener = toks[pos]
                lo = toks[pos + 1]
                assert toks[pos + 2] == "TO", "range syntax: field:[a TO b]"
                hi = toks[pos + 3]
                closer = toks[pos + 4]
                pos += 5
                add(
                    _field_range_query(
                        field, lo, hi, opener == "[", closer == "]"
                    )
                )
            else:
                add(_atom_query(t, analyzer, phrase_fn))
        return simplify(
            BooleanQuery(must=tuple(must), should=tuple(should), must_not=tuple(must_not))
        )

    q = parse_clauses(0)
    return q


# ---------------------------------------------------------------------------
# SimpleQueryParser: lenient human-input grammar, never raises
# ---------------------------------------------------------------------------


def simple_parse(
    s: str, analyzer: str = "standard", default_operator: str = "OR"
) -> Query:
    """SimpleQueryParser (Lucene.Net.QueryParser/Simple/SimpleQueryParser.cs):
    interpret whatever the user typed, ignoring syntax errors.

    Grammar: whitespace = default operator (OR); `+` AND; `|` OR; leading
    `-` negates one token; `"..."` phrase (+~N near slop); trailing `*`
    prefix; `~N` fuzzy on terms; `( )` precedence; `\\` escapes
    + | " ( ) ' \\ and leading -/trailing *. Left-associative folding: the
    accumulated tree becomes one operand when the operator changes
    (`t1 | t2 + t3` -> AND(OR(t1, t2), t3)). Unbalanced quotes/parens and
    dangling operators are ignored, never raised."""
    items = _sqp_items(s, analyzer)
    return _sqp_fold(items, default_operator)


def _sqp_items(s: str, analyzer: str) -> list:
    """Lex + atomize: list of ("op", op) / ("operand", neg, Query)."""
    out: list = []
    i, n = 0, len(s)
    neg = False

    def flush_term(buf: list[str], prefix: bool, fuzzy: int | None):
        text = "".join(buf)
        if not text:
            return None
        if prefix:
            return PrefixQuery(prefix=text.lower())
        if fuzzy is not None:
            return FuzzyQuery(term=text.lower(), max_edits=fuzzy)
        toks = tokenize_text(text, analyzer)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(term=toks[0])
        return BooleanQuery(should=tuple(TermQuery(term=t) for t in toks))

    while i < n:
        c = s[i]
        if c in " \t\r\n":
            out.append(("op", None))  # default operator slot
            i += 1
            continue
        if c == "+":
            out.append(("op", "AND"))
            i += 1
            continue
        if c == "|":
            out.append(("op", "OR"))
            i += 1
            continue
        if c == "-":
            neg = True
            i += 1
            continue
        if c == "(":
            depth, j = 1, i + 1
            while j < n and depth:
                if s[j] == "\\":
                    j += 1
                elif s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            inner = s[i + 1 : j - 1] if depth == 0 else s[i + 1 :]
            sub = simple_parse(inner, analyzer)
            if not _sqp_empty(sub):
                out.append(("operand", neg, sub))
            neg = False
            i = j
            continue
        if c == ")":
            i += 1  # unbalanced: ignore
            continue
        if c == '"':
            j = i + 1
            buf: list[str] = []
            while j < n and s[j] != '"':
                if s[j] == "\\" and j + 1 < n:
                    buf.append(s[j + 1])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            j += 1  # past the closing quote (or end)
            slop = 0
            m = re.match(r"~(\d+)", s[j:])
            if m:
                slop = int(m.group(1))
                j += m.end()
            from ..functions.analysis import tokenize_with_positions

            toks, poss = tokenize_with_positions("".join(buf), analyzer)
            q: Query | None
            if not toks:
                q = None
            elif len(toks) == 1:
                q = TermQuery(term=toks[0])
            else:
                q = PhraseQuery(
                    terms=tuple(toks), positions=tuple(poss), slop=slop
                )
            if q is not None:
                out.append(("operand", neg, q))
            neg = False
            i = j
            continue
        # term: read until an (unescaped) delimiter
        buf = []
        escaped: list[bool] = []
        while i < n and s[i] not in ' \t\r\n+|"()':
            if s[i] == "\\" and i + 1 < n:
                buf.append(s[i + 1])
                escaped.append(True)
                i += 2
            else:
                buf.append(s[i])
                escaped.append(False)
                i += 1
        prefix = False
        fuzzy: int | None = None
        if buf and buf[-1] == "*" and not escaped[-1]:
            buf.pop()
            prefix = True
        else:
            m = re.search(r"~(\d*)$", "".join(buf))
            if m and m.start() > 0:
                fuzzy = int(m.group(1)) if m.group(1) else 2
                buf = list("".join(buf)[: m.start()])
        q = flush_term(buf, prefix, fuzzy)
        if q is not None:
            out.append(("operand", neg, q))
        neg = False
    return out


def _sqp_empty(q: Query) -> bool:
    return isinstance(q, BooleanQuery) and not q.must and not q.should and not q.must_not


def _sqp_fold(items: list, default_operator: str) -> Query:
    """Left-associative fold; negated operands attach as MUST_NOT to the
    boolean level under construction."""
    cur_op: str | None = None
    clauses: list[Query] = []
    nots: list[Query] = []
    pending: str | None = None

    def finalize() -> Query:
        if len(clauses) == 1 and not nots:
            return clauses[0]
        if cur_op == "AND":
            return BooleanQuery(must=tuple(clauses), must_not=tuple(nots))
        return BooleanQuery(should=tuple(clauses), must_not=tuple(nots))

    for it in items:
        if it[0] == "op":
            if clauses or nots:
                pending = it[1] or default_operator if pending is None else (
                    it[1] or pending
                )
            continue
        _kind, neg, q = it
        if neg:
            nots.append(q)
            pending = None
            continue
        if not clauses:
            clauses.append(q)
        else:
            op = pending or default_operator
            if cur_op is None or op == cur_op:
                cur_op = op
                clauses.append(q)
            else:
                grouped = finalize()
                clauses = [grouped, q]
                nots = []
                cur_op = op
        pending = None
    if not clauses and not nots:
        return BooleanQuery()
    if not clauses:  # only negations: match nothing positive
        return BooleanQuery(must_not=tuple(nots))
    return finalize()


# ---------------------------------------------------------------------------
# ComplexPhraseQueryParser: wildcards/fuzzy/negation INSIDE quoted phrases
# ---------------------------------------------------------------------------


def _span_atom(tok: str, analyzer: str):
    """One phrase element -> SpanQuery (or None when the analyzer drops it).

    Mirrors the reference's pass-2 clause handling
    (ComplexPhraseQueryParser.cs Rewrite): a multiterm clause becomes a
    SpanMultiTermQueryWrapper (rewritten to SpanOr over matching terms at
    search time — 'one* becomes (one OR onerous)'), a plain term a
    SpanTermQuery analyzed with the index chain."""
    from ..operators import spans as sp

    fuzz = re.search(r"~(\d*)$", tok)
    if fuzz and fuzz.start() > 0:
        base = tok[: fuzz.start()].lower()
        edits = int(fuzz.group(1)) if fuzz.group(1) else 2
        return sp.SpanMultiTermQueryWrapper(
            query=FuzzyQuery(term=base, max_edits=edits)
        )
    if "*" in tok or "?" in tok:
        low = tok.lower()
        if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
            return sp.SpanMultiTermQueryWrapper(query=PrefixQuery(prefix=low[:-1]))
        return sp.SpanMultiTermQueryWrapper(query=WildcardQuery(pattern=low))
    toks = tokenize_text(tok, analyzer)
    if not toks:
        return None
    return sp.SpanTermQuery(term=toks[0])


def _complex_phrase(
    body: str, slop: int, boost: float, analyzer: str, in_order: bool = True
):
    """Compile quoted-phrase contents to spans — ComplexPhraseQuery.Rewrite
    (QueryParser/ComplexPhrase/ComplexPhraseQueryParser.cs:256-371):

    - each whitespace element is one SpanNear position clause;
    - (a b) groups become SpanOr (AddComplexPhraseClause), group-internal
      negations SpanNot(or, orNots);
    - a single plain-term phrase collapses to the TermQuery itself
      ('contents is TermQuery'); a single MULTITERM element raises, exactly
      the reference's ArgumentException on non-Boolean contents;
    - top-level negations build SpanNot(include, exclude) where include =
      the positives at slop+numNegatives and exclude = the full sequence at
      slop (the 'mixed positives and negatives' branch)."""
    from ..operators import spans as sp

    clauses: list[tuple[object, bool]] = []
    # group-aware split: '(a b)' is ONE position clause (may be negated)
    for spec in re.findall(r"-?\([^)]*\)|\S+", body):
        neg = spec.startswith("-")
        if neg:
            spec = spec[1:]
        gm = re.fullmatch(r"\((.*)\)", spec)
        if gm:
            ors, nots = [], []
            for alt in re.split(r"[|\s]+", gm.group(1)):
                if not alt:
                    continue
                a_neg = alt.startswith("-")
                sq = _span_atom(alt[1:] if a_neg else alt, analyzer)
                if sq is None:
                    continue
                (nots if a_neg else ors).append(sq)
            if not ors:
                # 'Dummy clause because no terms found - must match nothing'
                clauses.append((sp.SpanTermQuery(term="\x00never"), neg))
                continue
            soq = ors[0] if len(ors) == 1 else sp.SpanOrQuery(clauses=tuple(ors))
            if nots:
                exc = nots[0] if len(nots) == 1 else sp.SpanOrQuery(clauses=tuple(nots))
                soq = sp.SpanNotQuery(include=soq, exclude=exc)
            clauses.append((soq, neg))
            continue
        sq = _span_atom(spec, analyzer)
        if sq is None:
            continue  # analyzer dropped it, like the pass-2 classic parse
        clauses.append((sq, neg))
    if not clauses:
        return None
    from ..operators import spans as sp2

    if len(clauses) == 1 and not clauses[0][1]:
        only = clauses[0][0]
        if isinstance(only, sp2.SpanTermQuery):
            return TermQuery(term=only.term, field=only.field, boost=boost)
        raise ValueError(
            f"complex phrase {body!r} has a single multiterm element — the "
            "reference rejects non-Boolean phrase contents "
            "(ComplexPhraseQueryParser.cs Rewrite ArgumentException)"
        )
    all_spans = tuple(c for c, _ in clauses)
    positives = tuple(c for c, n in clauses if not n)
    num_neg = len(all_spans) - len(positives)
    if num_neg == 0:
        return sp2.SpanNearQuery(
            clauses=all_spans, slop=slop, in_order=in_order, boost=boost
        )
    include = (
        positives[0]
        if len(positives) == 1
        else sp2.SpanNearQuery(
            clauses=positives, slop=slop + num_neg, in_order=in_order
        )
    )
    exclude = sp2.SpanNearQuery(clauses=all_spans, slop=slop, in_order=in_order)
    return sp2.SpanNotQuery(include=include, exclude=exclude, boost=boost)


def parse_complex(
    s: str, default_operator: str = "OR", analyzer: str = "standard",
    in_order: bool = True,
) -> Query:
    """ComplexPhraseQueryParser (ComplexPhraseQueryParser.cs:1): the classic
    grammar, but quoted phrases may contain wildcards, prefixes, fuzzy
    terms, (a b) alternative groups and -negations, compiled onto the span
    machinery (SpanNear/SpanOr/SpanNot/SpanMultiTermQueryWrapper).
    in_order mirrors the parser's InOrder property (default true)."""
    return parse(
        s,
        default_operator,
        analyzer,
        phrase_fn=lambda body, slop, boost: _complex_phrase(
            body, slop, boost, analyzer, in_order
        ),
    )
