"""XML query parser — Lucene's CoreParser element grammar onto the query IR.

Re-expresses the reference XML query syntax
(Lucene.Net.QueryParser/Xml/CoreParser.cs and its Builders/*) as a
recursive element -> Query mapping over ``xml.etree.ElementTree``:

- query elements (CoreParser.cs ctor registrations): TermQuery, TermsQuery,
  MatchAllDocsQuery, BooleanQuery (Clause children with ``occurs`` =
  must|mustNot|should, minimumNumberShouldMatch), DisjunctionMaxQuery
  (tieBreaker, all child elements are disjuncts), NumericRangeQuery,
  UserQuery (classic-parser text), FilteredQuery (Filter + Query children),
  ConstantScoreQuery (first child is a filter), BoostingTermQuery
  (-> PayloadTermQuery with AveragePayloadFunction,
  Builders/BoostingTermBuilder.cs), and every span element;
- span elements (Builders/Span*.cs): SpanTerm, SpanOr, SpanOrTerms
  (analyzed text -> SpanOr of SpanTerms), SpanNear (``slop`` REQUIRED,
  ``inOrder`` defaults false like SpanNearBuilder.cs), SpanFirst
  (``end`` defaults 1), SpanNot (Include / Exclude wrapper children);
- filter elements: RangeFilter (TermRangeFilter string bounds — here a
  doc-column string-range predicate; empty/missing bound = open) and
  NumericRangeFilter (typed int/long/float/double bounds,
  Builders/NumericRangeFilterBuilder.cs) — both compile to the engine's
  FilteredQuery pushdown predicate over the typed docs columns, the same
  plan NumericRangeQuery takes (native parquet pushdown, no term scan);
- ``fieldName`` resolves with ancestor inheritance
  (DOMUtils.GetAttributeWithInheritance walks parent elements);
- ``boost`` attributes land in Query.boost everywhere the reference sets
  .Boost.

Per-field analysis follows this engine's PerFieldAnalyzerWrapper
convention (same as the classic parser): the default text field analyzes
TermsQuery/SpanOrTerms/UserQuery content with the index analyzer; any
other field is a keyword whose values match verbatim. TermQuery/SpanTerm
values are verbatim in the reference too (TermQueryBuilder.cs performs no
analysis).

Loud rejections instead of silent divergence: unknown element tags
(QueryBuilderFactory.cs GetQueryBuilder null -> ParserException),
``disableCoord`` (this engine's boolean scorer keeps coord semantics
uniform per similarity), RangeFilter on the analyzed text field (string
ranges over analyzed positions would need the terms dictionary — use
TermRangeQuery via UserQuery instead).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..functions.analysis import tokenize_text
from ..operators.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from .query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisMaxQuery,
    FilteredQuery,
    MatchAllQuery,
    PayloadTermQuery,
    Query,
    TermQuery,
)


class ParserException(ValueError):
    """Xml/ParserException.cs — malformed or unsupported XML query."""


# doc-side typed columns a range filter may push down onto (the engine's
# FilteredQuery contract; docs-table schema in operators/index_build.py)
_DOC_COLUMNS = {"conv_id", "turn_idx", "role", "tool", "ts"}
_NUMERIC_PARSERS = {
    "int": int,
    "long": int,
    "float": float,
    "double": float,
}


def _is_el(node) -> bool:
    return isinstance(node.tag, str)


def _attr(e: ET.Element, name: str, default: str = "") -> str:
    return e.get(name, default)


def _attr_or_fail(e: ET.Element, name: str) -> str:
    v = e.get(name)
    if v is None or v == "":
        raise ParserException(f"Element {e.tag} requires attribute {name}")
    return v


def _attr_inherit(e: ET.Element, ancestors: tuple, name: str) -> str:
    """DOMUtils.GetAttributeWithInheritance: self, then nearest ancestor."""
    v = e.get(name)
    if v:
        return v
    for a in reversed(ancestors):
        v = a.get(name)
        if v:
            return v
    return ""


def _field_or_fail(e: ET.Element, ancestors: tuple) -> str:
    v = _attr_inherit(e, ancestors, "fieldName")
    if not v:
        raise ParserException(f"Element {e.tag} requires attribute fieldName")
    return v


def _boost(e: ET.Element) -> float:
    v = e.get("boost")
    return float(v) if v else 1.0


def _bool_attr(e: ET.Element, name: str, default: bool) -> bool:
    v = e.get(name)
    if not v:
        return default
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    raise ParserException(f"bad boolean attribute {name}={v!r} on {e.tag}")


def _int_attr(e: ET.Element, name: str, default: int) -> int:
    v = e.get(name)
    if not v:
        return default
    try:
        return int(v)
    except ValueError:
        raise ParserException(f"bad int attribute {name}={v!r} on {e.tag}")


def _text(e: ET.Element) -> str:
    return "".join(e.itertext())


def _nonblank_text_or_fail(e: ET.Element) -> str:
    t = _text(e).strip()
    if not t:
        raise ParserException(f"Element {e.tag} requires text content")
    return t


def _children(e: ET.Element) -> list[ET.Element]:
    return [c for c in e if _is_el(c)]


def _first_child_or_fail(e: ET.Element) -> ET.Element:
    kids = _children(e)
    if not kids:
        raise ParserException(f"Element {e.tag} requires a child element")
    return kids[0]


def _child_by_tag_or_fail(e: ET.Element, tag: str) -> ET.Element:
    for c in _children(e):
        if c.tag == tag:
            return c
    raise ParserException(f"Element {e.tag} requires a {tag} child element")


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


class CoreParser:
    """CoreParser.cs: one instance wires the builder registry; ``parse``
    turns an XML string (or parsed Element) into this engine's Query IR."""

    def __init__(self, default_field: str = "text", analyzer: str = "standard"):
        self.default_field = default_field
        self.analyzer = analyzer
        self._query_builders = {
            "TermQuery": self._term_query,
            "TermsQuery": self._terms_query,
            "MatchAllDocsQuery": lambda e, a: MatchAllQuery(boost=_boost(e)),
            "BooleanQuery": self._boolean_query,
            "DisjunctionMaxQuery": self._dismax_query,
            "NumericRangeQuery": self._numeric_range_query,
            "UserQuery": self._user_query,
            "FilteredQuery": self._filtered_query,
            "ConstantScoreQuery": self._constant_score_query,
            # span builders are registered in the query factory too
            # (CoreParser.cs m_queryFactory.AddBuilder("SpanNear", snb) etc.)
            "SpanTerm": self._span_term,
            "SpanOr": self._span_or,
            "SpanOrTerms": self._span_or_terms,
            "SpanNear": self._span_near,
            "SpanFirst": self._span_first,
            "SpanNot": self._span_not,
            "BoostingTermQuery": self._boosting_term,
        }
        self._span_builders = {
            "SpanTerm": self._span_term,
            "SpanOr": self._span_or,
            "SpanOrTerms": self._span_or_terms,
            "SpanNear": self._span_near,
            "SpanFirst": self._span_first,
            "SpanNot": self._span_not,
        }
        self._filter_builders = {
            "RangeFilter": self._range_filter,
            "NumericRangeFilter": self._numeric_range_filter,
        }

    # -- entry ---------------------------------------------------------------

    def parse(self, xml_source: str | ET.Element) -> Query:
        if isinstance(xml_source, ET.Element):
            root = xml_source
        else:
            try:
                root = ET.fromstring(xml_source)
            except ET.ParseError as ex:
                raise ParserException(f"Error parsing XML: {ex}") from ex
        return self._query(root, ())

    # -- dispatch ------------------------------------------------------------

    def _query(self, e: ET.Element, anc: tuple) -> Query:
        b = self._query_builders.get(e.tag)
        if b is None:
            raise ParserException(f"No QueryObjectBuilder defined for node {e.tag}")
        return b(e, anc)

    def _span(self, e: ET.Element, anc: tuple) -> Query:
        b = self._span_builders.get(e.tag)
        if b is None:
            raise ParserException(
                f"No SpanQueryObjectBuilder defined for node {e.tag}"
            )
        return b(e, anc)

    def _filter_where(self, e: ET.Element, anc: tuple) -> str:
        b = self._filter_builders.get(e.tag)
        if b is None:
            raise ParserException(f"No FilterBuilder defined for node {e.tag}")
        return b(e, anc)

    # -- core query builders ---------------------------------------------------

    def _term_query(self, e: ET.Element, anc: tuple) -> Query:
        # TermQueryBuilder.cs: verbatim term, no analysis
        field = _field_or_fail(e, anc)
        return TermQuery(
            term=_nonblank_text_or_fail(e), field=field, boost=_boost(e)
        )

    def _terms_query(self, e: ET.Element, anc: tuple) -> Query:
        # TermsQueryBuilder.cs: analyze content, SHOULD TermQuery per token
        # (duplicates kept), minimumNumberShouldMatch honored
        field = _field_or_fail(e, anc)
        text = _nonblank_text_or_fail(e)
        if _bool_attr(e, "disableCoord", False):
            raise ParserException("disableCoord is not supported")
        terms = (
            tokenize_text(text, self.analyzer)
            if field == self.default_field
            else [text]
        )
        return BooleanQuery(
            should=tuple(TermQuery(term=t, field=field) for t in terms),
            min_should_match=_int_attr(e, "minimumNumberShouldMatch", 0),
            boost=_boost(e),
        )

    def _boolean_query(self, e: ET.Element, anc: tuple) -> Query:
        # BooleanQueryBuilder.cs: Clause children; occurs defaults should
        if _bool_attr(e, "disableCoord", False):
            raise ParserException("disableCoord is not supported")
        must: list[Query] = []
        should: list[Query] = []
        must_not: list[Query] = []
        anc2 = anc + (e,)
        for clause in _children(e):
            if clause.tag != "Clause":
                continue
            occurs = _attr(clause, "occurs", "should").lower()
            sub = self._query(_first_child_or_fail(clause), anc2 + (clause,))
            if occurs == "must":
                must.append(sub)
            elif occurs == "mustnot":
                must_not.append(sub)
            elif occurs in ("should", ""):
                should.append(sub)
            else:
                # BooleanQueryBuilder.GetOccursValue: unknown -> error
                raise ParserException(f"Invalid value for occurs: {occurs}")
        return BooleanQuery(
            must=tuple(must),
            should=tuple(should),
            must_not=tuple(must_not),
            min_should_match=_int_attr(e, "minimumNumberShouldMatch", 0),
            boost=_boost(e),
        )

    def _dismax_query(self, e: ET.Element, anc: tuple) -> Query:
        tie = e.get("tieBreaker")
        anc2 = anc + (e,)
        return DisMaxQuery(
            queries=tuple(self._query(c, anc2) for c in _children(e)),
            tie_breaker=float(tie) if tie else 0.0,
            boost=_boost(e),
        )

    def _numeric_range_query(self, e: ET.Element, anc: tuple) -> Query:
        # NumericRangeQueryBuilder.cs — constant-score typed range; here it
        # pushes down to the typed docs column like the classic parser's
        # field:[a TO b] production (native parquet predicate, no term scan)
        where = self._numeric_range_where(e, anc)
        return FilteredQuery(query=MatchAllQuery(), where=where, boost=_boost(e))

    def _user_query(self, e: ET.Element, anc: tuple) -> Query:
        # UserInputQueryBuilder.cs: classic-parser text, boost OVERWRITES
        from dataclasses import replace

        from . import parser as classic

        q = classic.parse(_nonblank_text_or_fail(e), analyzer=self.analyzer)
        return replace(q, boost=_boost(e))

    def _filtered_query(self, e: ET.Element, anc: tuple) -> Query:
        anc2 = anc + (e,)
        filt = _first_child_or_fail(_child_by_tag_or_fail(e, "Filter"))
        qel = _first_child_or_fail(_child_by_tag_or_fail(e, "Query"))
        return FilteredQuery(
            query=self._query(qel, anc2),
            where=self._filter_where(filt, anc2),
            boost=_boost(e),
        )

    def _constant_score_query(self, e: ET.Element, anc: tuple) -> Query:
        # ConstantScoreQueryBuilder.cs: first child is a FILTER element
        where = self._filter_where(_first_child_or_fail(e), anc + (e,))
        return ConstantScoreQuery(
            query=FilteredQuery(query=MatchAllQuery(), where=where),
            boost=_boost(e),
        )

    def _boosting_term(self, e: ET.Element, anc: tuple) -> Query:
        # BoostingTermBuilder.cs -> PayloadTermQuery(AveragePayloadFunction)
        return PayloadTermQuery(
            term=_nonblank_text_or_fail(e),
            field=_field_or_fail(e, anc),
            function="avg",
            include_span_score=True,
            boost=_boost(e),
        )

    # -- span builders ---------------------------------------------------------

    def _span_term(self, e: ET.Element, anc: tuple) -> Query:
        return SpanTermQuery(
            term=_nonblank_text_or_fail(e),
            field=_field_or_fail(e, anc),
            boost=_boost(e),
        )

    def _span_or(self, e: ET.Element, anc: tuple) -> Query:
        anc2 = anc + (e,)
        return SpanOrQuery(
            clauses=tuple(self._span(c, anc2) for c in _children(e)),
            boost=_boost(e),
        )

    def _span_or_terms(self, e: ET.Element, anc: tuple) -> Query:
        # SpanOrTermsBuilder.cs: analyzed content -> SpanOr of SpanTerms
        field = _field_or_fail(e, anc)
        text = _nonblank_text_or_fail(e)
        terms = (
            tokenize_text(text, self.analyzer)
            if field == self.default_field
            else [text]
        )
        return SpanOrQuery(
            clauses=tuple(SpanTermQuery(term=t, field=field) for t in terms),
            boost=_boost(e),
        )

    def _span_near(self, e: ET.Element, anc: tuple) -> Query:
        # SpanNearBuilder.cs: slop is REQUIRED, inOrder defaults false
        slop = int(_attr_or_fail(e, "slop"))
        anc2 = anc + (e,)
        return SpanNearQuery(
            clauses=tuple(self._span(c, anc2) for c in _children(e)),
            slop=slop,
            in_order=_bool_attr(e, "inOrder", False),
            boost=_boost(e),
        )

    def _span_first(self, e: ET.Element, anc: tuple) -> Query:
        return SpanFirstQuery(
            match=self._span(_first_child_or_fail(e), anc + (e,)),
            end=_int_attr(e, "end", 1),
            boost=_boost(e),
        )

    def _span_not(self, e: ET.Element, anc: tuple) -> Query:
        anc2 = anc + (e,)
        inc = _first_child_or_fail(_child_by_tag_or_fail(e, "Include"))
        exc = _first_child_or_fail(_child_by_tag_or_fail(e, "Exclude"))
        return SpanNotQuery(
            include=self._span(inc, anc2),
            exclude=self._span(exc, anc2),
            boost=_boost(e),
        )

    # -- filter builders -> pushdown predicates ---------------------------------

    def _range_filter(self, e: ET.Element, anc: tuple) -> str:
        # RangeFilterBuilder.cs (TermRangeFilter string range): keyword doc
        # columns compare as strings; empty/missing bound = open
        field = _field_or_fail(e, anc)
        if field == self.default_field or field not in _DOC_COLUMNS:
            raise ParserException(
                f"RangeFilter on field {field!r} is not supported — string "
                "ranges push down to keyword doc columns only; use a "
                "TermRangeQuery (UserQuery field:[a TO b]) for text terms"
            )
        lo, hi = _attr(e, "lowerTerm"), _attr(e, "upperTerm")
        conds = []
        if lo:
            op = ">=" if _bool_attr(e, "includeLower", True) else ">"
            conds.append(f"{field} {op} {_sql_str(lo)}")
        if hi:
            op = "<=" if _bool_attr(e, "includeUpper", True) else "<"
            conds.append(f"{field} {op} {_sql_str(hi)}")
        return " AND ".join(conds) if conds else "TRUE"

    def _numeric_range_filter(self, e: ET.Element, anc: tuple) -> str:
        return self._numeric_range_where(e, anc)

    def _numeric_range_where(self, e: ET.Element, anc: tuple) -> str:
        # NumericRange{Query,Filter}Builder.cs share attribute semantics:
        # lowerTerm/upperTerm REQUIRED, type in int/long/float/double
        field = _field_or_fail(e, anc)
        if field not in _DOC_COLUMNS or field in ("role", "tool", "conv_id"):
            raise ParserException(
                f"NumericRange on non-numeric doc column {field!r}"
            )
        typ = _attr(e, "type", "int").lower()
        parse = _NUMERIC_PARSERS.get(typ)
        if parse is None:
            raise ParserException(
                f"Could not parse NumericRange type {typ!r}"
            )
        try:
            lo = parse(_attr_or_fail(e, "lowerTerm"))
            hi = parse(_attr_or_fail(e, "upperTerm"))
        except ValueError as ex:
            raise ParserException(f"Could not parse NumericRange bound: {ex}")
        if field == "ts":
            # numeric bounds on the timestamp column are epoch seconds
            lov, hiv = f"to_timestamp({lo})", f"to_timestamp({hi})"
        else:
            lov, hiv = str(lo), str(hi)
        lop = ">=" if _bool_attr(e, "includeLower", True) else ">"
        hop = "<=" if _bool_attr(e, "includeUpper", True) else "<"
        return f"{field} {lop} {lov} AND {field} {hop} {hiv}"


def parse_xml(
    xml_source: str, default_field: str = "text", analyzer: str = "standard"
) -> Query:
    """One-shot convenience: CoreParser(default_field, analyzer).parse(...)."""
    return CoreParser(default_field, analyzer).parse(xml_source)
