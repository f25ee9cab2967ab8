"""Filter family wave 2: Prefix/NumericRange/FieldCacheTerms/
FieldCacheRange/DocTermOrdsRange/CachingWrapper filters — docid-set
parity against directly-computed sets (Search/PrefixFilter.cs,
NumericRangeFilter.cs, FieldCacheTermsFilter.cs, FieldCacheRangeFilter.cs,
DocTermOrdsRangeFilter.cs, CachingWrapperFilter.cs)."""
from pyspark.sql import functions as F

from lucenenet_spark.plans.query import (
    CachingWrapperFilter,
    ConstantScoreQuery,
    DocTermOrdsRangeFilter,
    FieldCacheRangeFilter,
    FieldCacheTermsFilter,
    NumericRangeFilter,
    PrefixFilter,
    PrefixQuery,
)


def _ids(df):
    return sorted(r["docid"] for r in df.select("docid").collect())


def test_prefix_filter_equals_prefix_query(searcher):
    got = _ids(
        searcher.search(
            ConstantScoreQuery(filter=PrefixFilter("text", "word1")),
            10**9,
        )
    )
    want = _ids(
        searcher.search(
            ConstantScoreQuery(query=PrefixQuery(prefix="word1")), 10**9
        )
    )
    assert got == want and got


def test_numeric_range_filter_bounds(searcher):
    docs = searcher.docs()
    for lo, hi, il, iu in [(1, 3, True, True), (1, 3, False, True),
                           (None, 2, True, False), (2, None, False, True)]:
        got = _ids(
            searcher._filter_docids(
                NumericRangeFilter("turn_idx", lo, hi, il, iu)
            )
        )
        cond = F.lit(True)
        c = F.col("turn_idx")
        if lo is not None:
            cond = cond & ((c >= lo) if il else (c > lo))
        if hi is not None:
            cond = cond & ((c <= hi) if iu else (c < hi))
        want = _ids(docs.filter(cond))
        assert got == want and got


def test_fieldcache_terms_and_range(searcher):
    docs = searcher.docs()
    got = _ids(
        searcher._filter_docids(
            FieldCacheTermsFilter("role", ("user", "tool"))
        )
    )
    want = _ids(docs.filter(F.col("role").isin(["user", "tool"])))
    assert got == want and got

    got = _ids(
        searcher._filter_docids(
            FieldCacheRangeFilter("role", "t", "v", True, False)
        )
    )
    want = _ids(
        docs.filter((F.col("role") >= "t") & (F.col("role") < "v"))
    )
    assert got == want and got


def test_doc_term_ords_range(searcher):
    # over the keyword postings of 'tool' (the multi-valued case is the
    # entry index's labels field, driver-gated as doc_term_ords_range)
    got = _ids(
        searcher._filter_docids(
            DocTermOrdsRangeFilter("tool", "b", "e", True, False)
        )
    )
    docs = searcher.docs()
    want = _ids(
        docs.filter((F.col("tool") >= "b") & (F.col("tool") < "e"))
    )
    assert got == want and got


def test_caching_wrapper_filter(searcher):
    inner = FieldCacheTermsFilter("role", ("user",))
    wrapped = CachingWrapperFilter(filter=inner)
    first = searcher._filter_docids(wrapped)
    second = searcher._filter_docids(wrapped)
    assert first is second  # the cached DataFrame is reused
    assert _ids(first) == _ids(searcher._filter_docids(inner))
