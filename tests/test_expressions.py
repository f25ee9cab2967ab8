"""Expressions module: grammar/semantics of the JS expression compiler vs a
Python recompute, plus the two search surfaces.

References: Lucene.Net.Expressions/JS/JavascriptCompiler.cs (node cases,
DEFAULT_FUNCTIONS), JS/JavascriptParser.cs (precedence),
ExpressionSortField.cs, ExpressionRescorer.cs, SimpleBindings.cs.
"""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucenenet_spark.plans.expressions import compile_expression
from lucenenet_spark.plans.query import TermQuery

TERM = "popcorn"


@pytest.fixture(scope="module")
def evalx(spark):
    rows = [(float(x), float(y)) for x in (-7, -2, 0, 1, 3, 10) for y in (2, 3, 5)]
    df = spark.createDataFrame(rows, "x double, y double")

    def run(src: str):
        def resolve(name):
            if name in ("x", "y"):
                return F.col(name).cast("double")
            raise ValueError(name)

        out = df.withColumn("v", compile_expression(src, resolve)).collect()
        return [(r["x"], r["y"], r["v"]) for r in out]

    return run


def test_arithmetic_precedence_and_literals(evalx):
    for x, y, v in evalx("2.0 + x * y - 6 / 2"):
        assert v == pytest.approx(2.0 + x * y - 3.0, abs=0)
    for x, _y, v in evalx("0x10 + 010 + .5"):  # hex 16, octal 8, fraction
        assert v == 24.5


def test_comparisons_and_booleans_are_zero_one(evalx):
    for x, y, v in evalx("x > 0 && y != 2"):
        assert v == (1.0 if (x > 0 and y != 2) else 0.0)
    for x, _y, v in evalx("!(x == 0) || x < -5"):
        assert v == (1.0 if (x != 0 or x < -5) else 0.0)


def test_ternary_right_associative(evalx):
    # a ? b : c ? d : e == a ? b : (c ? d : e)
    for x, y, v in evalx("x > 0 ? 1 : y > 2 ? 2 : 3"):
        assert v == (1.0 if x > 0 else (2.0 if y > 2 else 3.0))


def test_bitwise_and_shifts_match_int64_semantics(evalx):
    for x, y, v in evalx("(x & y) + (x | y) + (x ^ y)"):
        xi, yi = int(x), int(y)  # C# double->long truncates toward zero
        assert v == float((xi & yi) + (xi | yi) + (xi ^ yi))
    for x, y, v in evalx("x << y"):
        assert v == float(int(x) << (int(y) & 63))
    for x, _y, v in evalx("~x"):
        assert v == float(~int(x))
    # >>> is the unsigned shift over the two's-complement bits
    for x, y, v in evalx("x >>> y"):
        assert v == float((int(x) & 0xFFFFFFFFFFFFFFFF) >> (int(y) & 63))


def test_functions(evalx):
    for x, y, v in evalx("max(min(x, y), logn(2, 8)) + pow(2, 3)"):
        assert v == max(min(x, y), 3.0) + 8.0
    for _x, y, v in evalx("sqrt(y * y)"):
        assert v == y
    for _x, y, v in evalx("ln(exp(y))"):
        assert v == pytest.approx(y, rel=1e-12)


def test_fmod_matches_csharp_modulo(evalx):
    for x, y, v in evalx("x % y"):
        assert v == math.fmod(x, y)


def test_errors_are_loud(evalx):
    with pytest.raises(ValueError, match="unbound|z"):
        evalx("z + 1")
    with pytest.raises(ValueError, match="unknown function"):
        evalx("frobnicate(x)")
    with pytest.raises(ValueError, match="expects 2"):
        evalx("pow(x)")
    with pytest.raises(NotImplementedError, match="haversin"):
        evalx("haversin(1, 2, 3, 4)")
    with pytest.raises(ValueError, match="trailing"):
        evalx("x 1")


def test_expression_sort_matches_recompute(searcher):
    got = searcher.expression_sort(
        TermQuery(term=TERM), "_score + sqrt(1.0 + turn_idx)", k=12
    ).collect()
    hits = searcher.fetch(searcher.scores(TermQuery(term=TERM))).collect()
    want = sorted(
        (
            # sqrt is correctly rounded on every platform; ln is NOT (the
            # JVM intrinsic differs from libm by 1 ulp on some inputs), so
            # the double-valued gates stick to bit-stable ops
            (float(np.float64(r["score"]) + np.sqrt(1.0 + np.float64(r["turn_idx"]))), r["docid"])
            for r in hits
        ),
        key=lambda t: (-t[0], t[1]),
    )[:12]
    assert [(r["docid"], r["sortval"]) for r in got] == [
        (d, v) for v, d in want
    ]


def test_expression_rescore_binds_first_pass_score(searcher):
    n, k = 15, 8
    got = searcher.expression_rescore(
        TermQuery(term=TERM), "_score * (turn_idx + 1.0)", n=n, k=k
    ).collect()
    top = searcher.search(TermQuery(term=TERM), n).collect()
    meta = {
        r["docid"]: r["turn_idx"]
        for r in searcher.fetch(searcher.scores(TermQuery(term=TERM))).collect()
    }
    want = sorted(
        (
            (float(np.float64(r["score"]) * (meta[r["docid"]] + 1.0)), r["docid"])
            for r in top
        ),
        key=lambda t: (-t[0], t[1]),
    )[:k]
    assert [(r["docid"], r["sortval"]) for r in got] == [(d, v) for v, d in want]
