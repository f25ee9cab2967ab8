"""ValueSource tree — f32 composition parity between the Spark engine
expression and a numpy recomputation (ScaleFloatFunction two-pass,
ReciprocalFloatFunction, Linear/Product/Sum/Min/Max/RangeMap)."""
import numpy as np
from pyspark.sql import functions as F

from lucenenet_spark.functions import valuesource as V

f32 = np.float32


def _eval(searcher, vs):
    return {
        r["docid"]: np.float32(r["v"])
        for r in searcher.docs()
        .select("docid", F.expr(vs.spark).cast("float").alias("v"))
        .collect()
    }


def _turns(searcher):
    return {
        r["docid"]: r["turn_idx"] for r in searcher.docs().collect()
    }


def test_reciprocal_and_linear(searcher):
    vs = V.reciprocal(V.field("turn_idx"), 2.0, 1000.0, 3.0)
    got = _eval(searcher, vs)
    t = _turns(searcher)
    for d, v in got.items():
        x = f32(t[d])
        want = f32(f32(1000.0) / f32(f32(f32(2.0) * x) + f32(3.0)))
        assert v == want
    vs = V.linear(V.field("turn_idx"), 0.5, 2.0)
    got = _eval(searcher, vs)
    for d, v in got.items():
        assert v == f32(f32(f32(0.5) * f32(t[d])) + f32(2.0))


def test_compose_product_sum_min_max_rangemap(searcher):
    t = _turns(searcher)
    x = V.field("turn_idx")
    vs = V.product(V.sum_(x, V.const(1.0)), V.const(3.0))
    got = _eval(searcher, vs)
    for d, v in got.items():
        assert v == f32(f32(f32(t[d]) + f32(1.0)) * f32(3.0))
    vs = V.max_(V.min_(x, V.const(5.0)), V.const(2.0))
    got = _eval(searcher, vs)
    for d, v in got.items():
        assert v == f32(max(min(f32(t[d]), f32(5.0)), f32(2.0)))
    vs = V.range_map(x, 0.0, 2.0, 9.0)
    got = _eval(searcher, vs)
    for d, v in got.items():
        assert v == (f32(9.0) if 0 <= t[d] <= 2 else f32(t[d]))


def test_scale_two_pass(searcher):
    t = _turns(searcher)
    mn, mx = f32(min(t.values())), f32(max(t.values()))
    sc = f32(f32(f32(1.0) - f32(0.0)) / f32(mx - mn))
    vs = V.scale(V.field("turn_idx"), 0.0, 1.0, searcher)
    got = _eval(searcher, vs)
    for d, v in got.items():
        assert v == f32(f32(f32(f32(t[d]) - mn) * sc) + f32(0.0))
    assert min(got.values()) == f32(0.0) and max(got.values()) == f32(1.0)


def test_ord_and_reverse_ord(searcher):
    # OrdFieldSource / ReverseOrdFieldSource (round 5z): ordinal in the
    # sorted terms index; missing value -> -1 / end (the reference's
    # end - (-1) - 1 arithmetic)
    terms = sorted(
        r["term"]
        for r in searcher.term_stats()
        .filter(F.col("field") == "tool")
        .select("term")
        .distinct()
        .collect()
    )
    rank = {t: i for i, t in enumerate(terms)}
    tools = {r["docid"]: r["tool"] for r in searcher.docs().collect()}
    got = _eval(searcher, V.ord_source("tool", searcher))
    assert any(v is None for v in tools.values())  # the missing arm is live
    for d, v in got.items():
        want = rank.get(tools[d], -1)
        assert v == f32(want)
    got = _eval(searcher, V.reverse_ord("tool", searcher))
    end = len(terms)
    for d, v in got.items():
        assert v == f32(end - rank.get(tools[d], -1) - 1)
