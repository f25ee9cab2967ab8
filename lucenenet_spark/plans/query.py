"""Query plan dataclasses — the engine's logical query IR.

Mirrors the reference Query tree (SURVEY.md §2.4) as plain data:
TermQuery (Search/TermQuery.cs), BooleanQuery clauses MUST/SHOULD/MUST_NOT +
minNrShouldMatch (Search/BooleanQuery.cs:169-173), DisjunctionMaxQuery,
ConstantScore/MatchAll, and the MultiTermQuery family (Prefix/Wildcard/
Regexp/Fuzzy/TermRange — Search/MultiTermQuery.cs:65-118) which `rewrite()`
expands against the terms dictionary into primitive boolean queries, exactly
Lucene's rewrite fixpoint (IndexSearcher.cs:753-760).
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_CLAUSE_COUNT = 1024  # BooleanQuery.cs:70


@dataclass(frozen=True)
class Query:
    boost: float = 1.0


@dataclass(frozen=True)
class TermQuery(Query):
    term: str = ""
    # per-field indexing (QueryParserBase.cs:171-244 `field:term`); "text" is
    # the analyzed default, keyword fields (role/tool) hold exact values
    field: str = "text"


@dataclass(frozen=True)
class MatchAllQuery(Query):
    pass


@dataclass(frozen=True)
class PayloadTermQuery(Query):
    """Payload-scored term query (Search/Payloads/PayloadTermQuery.cs).

    Runs as a span-term query: spanScore uses sloppyFreq = sum over matches
    of 1/(matchLength+1) with matchLength = end-start = 1 for a term span
    (Spans/SpanScorer.cs:83-84, TermSpans End = position+1), i.e.
    freq = 0.5*tf — span scores deliberately differ from TermScorer's.
    Per match, the payload factor (ComputePayloadFactor; here the 4-byte
    big-endian float payload decoded per PayloadHelper.DecodeSingle, the
    reference tests' BoostingSimilarity) folds through PayloadFunction
    (Min/Max/AveragePayloadFunction.cs) in position order; final score =
    spanScore * function.DocScore (or the payload score alone when
    include_span_score=False) — PayloadTermQuery.cs GetScore().
    Occurrences without a payload are skipped (IsPayloadAvailable gate)."""

    term: str = ""
    field: str = "text"
    function: str = "avg"  # avg | min | max
    include_span_score: bool = True


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    # exactly one of query/filter is set (ConstantScoreQuery.cs has both
    # ctors; a wrapped filter scores every passing doc at boost)
    query: Query | None = None
    filter: "Filter | None" = None


@dataclass(frozen=True)
class BooleanQuery(Query):
    must: tuple[Query, ...] = ()
    should: tuple[Query, ...] = ()
    must_not: tuple[Query, ...] = ()
    min_should_match: int = 0


@dataclass(frozen=True)
class DisMaxQuery(Query):
    queries: tuple[Query, ...] = ()
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """High/low-frequency split boolean (Lucene.Net.Queries/CommonTermsQuery.cs).

    Terms whose docFreq exceeds max_term_frequency (absolute when >= 1,
    else a fraction: df > ceil(f32(max_term_frequency) * f32(maxDoc)))
    are "high frequency" and become an OPTIONAL sub-query; the rest are the
    required "low frequency" sub-query — stopword-style terms stop gating
    the match set without a stopword file. Rewrites at search time against
    the index's term stats (CommonTermsQuery.cs:153-171 Rewrite +
    :193-259 BuildQuery); all-high -> conjunction, all-low -> low only.
    Occur MUST_NOT is rejected for either group like the reference ctor.
    min-should-match values are the reference's floats: >=1 or 0 taken as
    int, else round-half-even(f * numOptional)."""

    terms: tuple[str, ...] = ()
    field: str = "text"
    high_freq_occur: str = "SHOULD"  # MUST | SHOULD
    low_freq_occur: str = "MUST"  # MUST | SHOULD
    max_term_frequency: float = 0.01
    low_freq_min_should_match: float = 0.0
    high_freq_min_should_match: float = 0.0
    low_freq_boost: float = 1.0
    high_freq_boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Exact/sloppy phrase (Search/PhraseQuery.cs; ExactPhraseScorer.cs /
    SloppyPhraseScorer.cs). `positions` are the analyzer-assigned query
    offsets (stopword/too-long slots leave gaps, QueryParserBase.cs:244);
    default 0..n-1. slop=0 -> exact position intersection; slop>0 ->
    sloppy matching with freq = sum of 1/(1+matchLength)."""

    terms: tuple[str, ...] = ()
    positions: tuple[int, ...] = ()
    slop: int = 0
    field: str = "text"

    @property
    def offsets(self) -> tuple[int, ...]:
        return self.positions if self.positions else tuple(range(len(self.terms)))


@dataclass(frozen=True)
class NGramPhraseQuery(PhraseQuery):
    """PhraseQuery over an n-gram analyzed field
    (Search/NGramPhraseQuery.cs): with slop=0, n >= 2, >= 3 terms at
    consecutive positions, the rewrite keeps only every n-th term plus
    the last (positions preserved) — overlapping n-grams make the
    dropped terms redundant for matching, and Lucene accepts the
    (idf-sum) score change as part of the optimization."""

    n: int = 2


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Generalized phrase: a SET of alternative terms per position slot
    (Search/MultiPhraseQuery.cs — "Microsoft app*" style synonym phrases).

    Semantics (MultiPhraseWeight + UnionDocsAndPositionsEnum):
    - each slot's alternatives are position-UNIONed: the slot matches at
      any position where any alternative occurs;
    - weight idf = float32 fold of idf over ALL (slot, term) pairs in
      declaration order, duplicates counted (MultiPhraseQuery.cs:193-207);
    - a term absent from the index is skipped in the union; a slot whose
      every alternative is absent can never match (GetScorer null,
      MultiPhraseQuery.cs:268-272);
    - slop=0 -> ExactPhraseScorer alignment, slop>0 -> SloppyPhraseScorer,
      both over the unioned enums.
    Rewrite: all slots singleton -> PhraseQuery; one slot -> BooleanQuery
    of SHOULD TermQueries (MultiPhraseQuery.cs Rewrite)."""

    term_arrays: tuple[tuple[str, ...], ...] = ()
    positions: tuple[int, ...] = ()
    slop: int = 0
    field: str = "text"

    @property
    def offsets(self) -> tuple[int, ...]:
        return (
            self.positions
            if self.positions
            else tuple(range(len(self.term_arrays)))
        )


@dataclass(frozen=True)
class FilteredQuery(Query):
    """Score `query`, keep only docs passing a doc-side SQL predicate
    and/or a structured Filter (below).

    Lucene's FilteredQuery + Filter (Search/FilteredQuery.cs); numeric/date
    ranges (NumericRangeQuery.cs) are the native case: the predicate pushes
    down to the docs table's typed columns (conv_id, turn_idx, role, tool,
    ts, field_length). Scores are the inner query's, unchanged."""

    query: Query | None = None
    where: str = "true"
    filter: "Filter | None" = None


# -- Filter family (docid sets, no scoring) ----------------------------------


@dataclass(frozen=True)
class Filter:
    """Abstract docid-set producer (Search/Filter.cs). Consumed by
    FilteredQuery(filter=...) and ConstantScoreQuery(filter=...)."""


@dataclass(frozen=True)
class TermsFilter(Filter):
    """Docs containing ANY of the given (field, term) pairs
    (Lucene.Net.Queries/TermsFilter.cs — duplicate terms and multiple
    fields allowed; the result is the union of the postings)."""

    terms: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class FieldValueFilter(Filter):
    """Docs that have a value for `field` (docsWithField bits); negate=True
    keeps the docs WITHOUT one (Search/FieldValueFilter.cs). Fields are the
    doc-side keyword/typed columns (role, tool, ts, ...)."""

    field: str = ""
    negate: bool = False


@dataclass(frozen=True)
class QueryWrapperFilter(Filter):
    """The docs an arbitrary query matches, scores discarded
    (Search/QueryWrapperFilter.cs)."""

    query: Query | None = None


@dataclass(frozen=True)
class BooleanFilter(Filter):
    """Boolean composition of filters (Lucene.Net.Queries/BooleanFilter.cs):
    SHOULD filters OR together, the result is AndNot'd with every MUST_NOT
    filter (starting from ALL docs when no SHOULD clause exists), then
    And'd with every MUST filter. The reference's null-DocIdSet vs
    empty-set distinction is structural here: "no should clauses" is the
    only state that lets MUST_NOT start from the full doc space, which is
    result-equivalent for set-valued child filters (an all-empty SHOULD
    union zeroes every later intersection either way)."""

    must: tuple[Filter, ...] = ()
    should: tuple[Filter, ...] = ()
    must_not: tuple[Filter, ...] = ()


@dataclass(frozen=True)
class PrefixFilter(Filter):
    """PrefixQuery as a filter (Search/PrefixFilter.cs — a
    MultiTermQueryWrapperFilter over the prefix terms enum)."""

    field: str = "text"
    prefix: str = ""


@dataclass(frozen=True)
class NumericRangeFilter(Filter):
    """NumericRangeQuery as a filter (Search/NumericRangeFilter.cs):
    docs whose numeric/timestamp column sits in the (optionally open,
    optionally exclusive) range."""

    field: str = "turn_idx"
    lower: object = None
    upper: object = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class FieldCacheTermsFilter(Filter):
    """Docs whose SINGLE-VALUED field value is one of `terms`
    (Search/FieldCacheTermsFilter.cs — the field-cache ord lookup is a
    column membership test here)."""

    field: str = "role"
    terms: tuple[str, ...] = ()


@dataclass(frozen=True)
class FieldCacheRangeFilter(Filter):
    """String range over a single-valued column
    (Search/FieldCacheRangeFilter.cs NewStringRange): term-ordinal
    comparison == lexicographic column comparison."""

    field: str = "role"
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class DocTermOrdsRangeFilter(Filter):
    """Multi-valued keyword-field range (Search/DocTermOrdsRangeFilter.cs):
    docs with ANY indexed value of `field` inside the term range."""

    field: str = "labels"
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class CachingWrapperFilter(Filter):
    """Caches the wrapped filter's docid set
    (Search/CachingWrapperFilter.cs); here the set DataFrame is
    persisted so repeated queries reuse it."""

    filter: "Filter | None" = None


@dataclass(frozen=True)
class SpatialDistanceSpec:
    """Geodesic distance value source (Lucene.Net.Spatial):
    Vector/DistanceValueSource.cs when grid_level == 0 (exact doc point
    from the x/y numeric columns), Util/ShapeFieldCacheDistanceValueSource
    when grid_level > 0 (doc point quantized to its indexed grid-cell
    center — PointPrefixTreeFieldCacheProvider decodes the maxLevels
    term). Degrees times `multiplier`, double-valued."""

    x_col: str = "lon"
    y_col: str = "lat"
    from_x: float = 0.0
    from_y: float = 0.0
    multiplier: float = 1.0
    grid_level: int = 0
    grid: str = "geohash"  # or "quad"


@dataclass(frozen=True)
class ValueSourceFilter(Filter):
    """Docs of `filter` whose value-source value sits in [min, max]
    (Lucene.Net.Spatial/Util/ValueSourceFilter.cs:75 — inclusive double
    bounds); filter=None starts from all docs. The only value source a
    filter wraps in the reference's spatial module is the distance."""

    filter: "Filter | None" = None
    source: SpatialDistanceSpec | None = None
    min: float = 0.0
    max: float = 0.0


# ChainedFilter logic constants (Lucene.Net.Queries/ChainedFilter.cs:45-52)
CHAIN_OR, CHAIN_AND, CHAIN_ANDNOT, CHAIN_XOR = 0, 1, 2, 3


@dataclass(frozen=True)
class ChainedFilter(Filter):
    """Sequential chain with per-filter logic ops
    (Lucene.Net.Queries/ChainedFilter.cs): the accumulator starts empty;
    a leading AND seeds it with the first filter, a leading ANDNOT with its
    complement (InitialResult); each remaining filter folds in with
    OR/AND/ANDNOT/XOR (DoChain). `logic` empty means OR for every filter
    (the DEFAULT arm)."""

    filters: tuple[Filter, ...] = ()
    logic: tuple[int, ...] = ()


# -- MultiTermQuery family: rewritten against the terms dict -----------------


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str = ""


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str = ""  # * = any seq, ? = one char (Search/WildcardQuery.cs)


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str = ""


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str = ""
    max_edits: int = 2  # FuzzyQuery.cs defaultMaxEdits


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


def simplify(q: Query) -> Query:
    """1-clause BooleanQuery -> the clause (BooleanQuery.cs:537 rewrite)."""
    if (
        isinstance(q, BooleanQuery)
        and len(q.must) + len(q.should) == 1
        and not q.must_not
        and q.min_should_match <= 1
    ):
        inner = (q.must + q.should)[0]
        if q.boost != 1.0:
            return type(inner)(**{**inner.__dict__, "boost": inner.boost * q.boost})
        return inner
    return q
