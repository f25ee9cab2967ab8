"""Size-guarded broadcasts: MUST_NOT docid probes and the liveDocs delete
mask must fall back to a plain shuffled left_anti when the docid set is too
big to broadcast (a NOT on a hot term has df ~10^9 at the 10^12-turn
target; a mass delete can dwarf executor memory).

Semantics under test (acceptDocs, SegmentReader.cs:100,136,272 and
BooleanWeight prohibited scorers): the physical join strategy must NEVER
change results — forced-fallback runs must be bit-identical to the
broadcast path, and the fallback plan must actually drop the broadcast.
"""
import shutil

import pytest

from lucenenet_spark.operators.search import IndexSearcher
from lucenenet_spark.plans.query import BooleanQuery, TermQuery

from .conftest import hits


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_broadcast(df) -> int:
    return _plan(df).count("BroadcastHashJoin")


MUST_NOT_Q = BooleanQuery(
    must=[TermQuery(term="popcorn")],
    should=[TermQuery(term="value")],
    must_not=[TermQuery(term="hello")],
)


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable Catalyst's size-estimated auto-broadcast so the plan shows
    exactly the joins WE hinted — at test scale every side is tiny, so the
    optimizer would otherwise re-broadcast the unhinted join anyway (which
    is fine at runtime; here we verify the forced hint is actually gone)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


@pytest.mark.parametrize("sim", ["bm25", "classic", "lmd", "dfr_inl2"])
def test_must_not_fallback_bit_identical(spark, index_dir, no_auto_broadcast, sim):
    s_bc = IndexSearcher(spark, index_dir, similarity=sim)
    s_sh = IndexSearcher(spark, index_dir, similarity=sim)
    s_sh.MAX_BROADCAST_DOCIDS = 0  # force the shuffled anti-join
    got_bc = s_bc.search(MUST_NOT_Q, 20)
    got_sh = s_sh.search(MUST_NOT_Q, 20)
    # the guard must remove (at least) the MUST_NOT broadcast from the plan
    assert _n_broadcast(got_sh) < _n_broadcast(got_bc)
    assert hits(got_bc) == hits(got_sh)


def test_must_not_bound_uses_cached_df(searcher):
    # Σdf comes from the cached term_meta scan — the guard itself must not
    # mis-size: a rare term stays broadcast, a forced-0 threshold never does
    bound = sum(m[0] for m in searcher.term_meta([("text", "hello")]).values())
    assert 0 < bound <= searcher.MAX_BROADCAST_DOCIDS


@pytest.fixture()
def del_index(spark, index_dir, tmp_path):
    d = str(tmp_path / "guardidx")
    shutil.copytree(index_dir, d)
    s = IndexSearcher(spark, d)
    s.delete_by_term("hello")
    return d


def test_live_docs_fallback_bit_identical(spark, del_index, no_auto_broadcast):
    s_bc = IndexSearcher(spark, del_index)
    s_sh = IndexSearcher(spark, del_index)
    s_sh.MAX_BROADCAST_DOCIDS = 0
    q = TermQuery(term="popcorn")
    got_bc = s_bc.search(q, 25)
    got_sh = s_sh.search(q, 25)
    assert _n_broadcast(got_sh) < _n_broadcast(got_bc)
    assert hits(got_bc) == hits(got_sh)
    # counted-once cache: capped count survives and is > 0 with deletes
    assert s_sh._deleted_count_capped() > 0


def test_span_live_docs_fallback(spark, del_index):
    from lucenenet_spark.operators.spans import (
        SpanNearQuery,
        SpanTermQuery,
        span_search,
    )

    q = SpanNearQuery(
        clauses=(SpanTermQuery(term="value"), SpanTermQuery(term="table")),
        slop=4,
        in_order=True,
    )
    s_bc = IndexSearcher(spark, del_index)
    s_sh = IndexSearcher(spark, del_index)
    s_sh.MAX_BROADCAST_DOCIDS = 0
    assert hits(span_search(s_bc, q, 15)) == hits(span_search(s_sh, q, 15))
