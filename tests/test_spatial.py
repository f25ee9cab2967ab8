"""Spatial module tests (Lucene.Net.Spatial + Lucene.Net.Tests.Spatial).

Reference vectors:
  * geohash encode + level tables (GeohashUtils via GeohashPrefixTree.cs;
    TestRecursivePrefixTreeStrategy.TestOneMeterPrecision)
  * SpatialArgsParser grammar (Query/SpatialArgsParserTest.cs)
  * PortedSolr3Test.TestIntersections — the full circle/bbox vector set
    incl. both pole-crossing circles, run under ALL FOUR strategies
    (geohash-12 RPT, quad-25 RPT, geohash-12 TermQuery, PointVector)
  * TestRecursivePrefixTreeStrategy.TestPrecision — distErrPct grid
    precision around a 35.75km distance
  * cities-Intersects-BBox over the 2679-point world-cities corpus
    (Test-Files/, SpatialMatchConcern.FILTER = exact id set)

The pure-logic model matcher mirrors the engine's compile exactly: a doc
matches a prefix-tree filter iff its indexed token chain intersects the
cover's term set — the Spark side turns the same cover into a TermsFilter,
so the model IS the engine minus the cluster. The Spark round-trip is
covered by the spatial gates (scripts/gate_check.py) plus the composition
test below.
"""
from __future__ import annotations

import os
import re

import numpy as np
import pytest

from lucenenet_spark.functions import geo
from lucenenet_spark.functions.geo import (
    Circle,
    GeohashPrefixTree,
    Point,
    QuadPrefixTree,
    Rect,
    dist2degrees,
    haversine_deg,
)
from lucenenet_spark.operators.spatial import (
    PointVectorStrategy,
    RecursivePrefixTreeStrategy,
    SpatialArgs,
    TermQueryPrefixTreeStrategy,
    parse_spatial_args,
)
from lucenenet_spark.plans.query import (
    BooleanFilter,
    NumericRangeFilter,
    SpatialDistanceSpec,
    TermsFilter,
    ValueSourceFilter,
)

REF = "/root/reference/src/Lucene.Net.Tests.Spatial"


# -- geohash / tree vectors ---------------------------------------------------


def test_geohash_known_hashes():
    t = GeohashPrefixTree(24)
    # published geohash vectors (the algorithm GeohashUtils implements)
    assert t.point_token(-5.6, 42.6, 5) == "ezs42"
    assert t.point_token(10.40744, 57.64911, 11) == "u4pruydqqvj"
    assert t.point_token(-0.1, 51.5, 7) == "gcpuvxr"


def test_geohash_one_meter_precision():
    # TestRecursivePrefixTreeStrategy.TestOneMeterPrecision
    t = GeohashPrefixTree(24)
    degrees = dist2degrees(0.001, geo.EARTH_MEAN_RADIUS_KM)
    assert t.get_level_for_distance(degrees) == 11


def test_geohash_bounds_roundtrip():
    t = GeohashPrefixTree(12)
    rng = np.random.default_rng(5)
    lons = rng.uniform(-180, 180, 200)
    lats = rng.uniform(-90, 90, 200)
    for lon, lat in zip(lons, lats):
        tok = t.point_token(lon, lat, 6)
        b = t.token_bounds(tok)
        assert b.min_x <= lon <= b.max_x and b.min_y <= lat <= b.max_y
        # every prefix contains the point too
        for i in range(1, 6):
            pb = t.token_bounds(tok[:i])
            assert pb.contains_point(lon, lat)


def test_quad_bounds_roundtrip_and_tokens():
    t = QuadPrefixTree(12)
    assert t.point_token(-170.0, 80.0, 1) == "A"
    assert t.point_token(170.0, 80.0, 1) == "B"
    assert t.point_token(-170.0, -80.0, 1) == "C"
    assert t.point_token(170.0, -80.0, 1) == "D"
    # boundary ties: x on the midline goes WEST, y on the midline NORTH
    # (QuadPrefixTree.cs CheckBattenberg checks A,B,C,D in order with
    # inclusive rects — A wins both ties)
    assert t.point_token(0.0, 0.0, 1) == "A"
    rng = np.random.default_rng(6)
    for lon, lat in zip(rng.uniform(-180, 180, 100), rng.uniform(-90, 90, 100)):
        tok = t.point_token(lon, lat, 8)
        b = t.token_bounds(tok)
        assert b.min_x <= lon <= b.max_x and b.min_y <= lat <= b.max_y


def test_geohash_boundary_goes_to_lower_cell():
    # GeohashUtils bisection uses `lon > mid`: a point exactly on a cell
    # boundary belongs to the LOWER cell
    t = GeohashPrefixTree(24)
    # lon 0 / lat 0 are level-1 boundaries (interleaved splits)
    tok = t.point_token(0.0, 0.0, 1)
    b = t.token_bounds(tok)
    assert b.max_x == 0.0 or b.max_y == 0.0


def test_gate_detail_level_literals():
    # the frozen literals in __spark_entry__'s spatial oracles
    gh = RecursivePrefixTreeStrategy(GeohashPrefixTree(7), "geo")
    qd = RecursivePrefixTreeStrategy(QuadPrefixTree(11), "geoq")
    args = parse_spatial_args("Intersects(ENVELOPE(-60.0, -20.0, 35.0, 5.0))")
    assert gh.detail_level(args) == 4
    assert qd.detail_level(args) == 10


# -- SpatialArgsParser (SpatialArgsParserTest.cs) -----------------------------


def test_args_parser():
    out = parse_spatial_args("IsWithin(Envelope(-10, 10, 20, -20))")
    assert out.operation == "IsWithin"
    assert out.shape == Rect(-10.0, 10.0, -20.0, 20.0)
    out = parse_spatial_args("IsDisjointTo (Envelope(-20,-10,20,10))")
    assert out.operation == "IsDisjointTo"
    # the reference's parser vector uses Envelope(-10,-20,...) — a
    # DATELINE-CROSSING rect in the geo context; this engine rejects
    # dateline-crossing shapes loudly instead of wrapping
    with pytest.raises(geo.NotSupportedError):
        parse_spatial_args("IsDisjointTo (Envelope(-10,-20,20,10))")
    with pytest.raises(ValueError):
        parse_spatial_args("IsDisjointTo[ ]")
    with pytest.raises(ValueError):
        parse_spatial_args("XXXX(Envelope(-10, 10, 20, -20))")
    out = parse_spatial_args(
        "Intersects(BUFFER(POINT(-10 30), 5.2)) distErrPct=0.025"
    )
    assert out.shape == Circle(-10.0, 30.0, 5.2)
    assert out.dist_err_pct == 0.025


# -- pure-logic strategy matchers ---------------------------------------------


class _Model:
    """Index + search without Spark: the same covers/chains the engine
    compiles, over an in-memory id -> point map."""

    def __init__(self, strategy):
        self.strategy = strategy
        self.docs: dict[int, Point] = {}

    def add(self, did: int, pt: Point):
        self.docs[did] = pt

    def search_ids(self, args: SpatialArgs) -> set[int]:
        s = self.strategy
        if isinstance(s, PointVectorStrategy):
            f = s.make_filter(args)
            return {d for d, p in self.docs.items() if self._pv_match(f, p)}
        cover = s.make_filter(args)
        if isinstance(cover, TermsFilter):
            toks = {t for _f, t in cover.terms}
            out = set()
            for d, p in self.docs.items():
                chain = s.grid.point_tokens_np(
                    np.array([p.x]), np.array([p.y])
                )[0]
                if toks.intersection(chain):
                    out.add(d)
            return out
        raise AssertionError(f"unexpected filter {cover}")

    @staticmethod
    def _pv_match(f, p: Point) -> bool:
        def rng_ok(nf: NumericRangeFilter, v: float) -> bool:
            return nf.lower <= v <= nf.upper

        if isinstance(f, BooleanFilter):
            fx, fy = f.must
            return rng_ok(fx, p.x) and rng_ok(fy, p.y)
        assert isinstance(f, ValueSourceFilter)
        fx, fy = f.filter.must
        if not (rng_ok(fx, p.x) and rng_ok(fy, p.y)):
            return False
        d = float(
            haversine_deg(f.source.from_y, f.source.from_x, p.y, p.x)
        )
        return f.min <= d <= f.max


def _solr3_strategies():
    return [
        RecursivePrefixTreeStrategy(GeohashPrefixTree(12), "rg"),
        RecursivePrefixTreeStrategy(QuadPrefixTree(25), "rq"),
        TermQueryPrefixTreeStrategy(GeohashPrefixTree(12), "tg"),
        PointVectorStrategy(),
    ]


_SOLR3_DOCS_A = {
    1: Point(-79.9289094, 32.7693246),
    2: Point(-80.9289094, 33.7693246),
    3: Point(50.9289094, -32.7693246),
    4: Point(60.9289094, -50.7693246),
    5: Point(0, 0),
    6: Point(0.1, 0.1),
    7: Point(-0.1, -0.1),
    8: Point(179.9, 0),
    9: Point(-179.9, 0),
    10: Point(50, 89.9),
    11: Point(-130, 89.9),
    12: Point(50, -89.9),
    13: Point(-130, -89.9),
}

# (bbox?, center, distKM, numFound, ids) — PortedSolr3Test.TestIntersections.
# The two dateline-adjacent circle cases (center 179.8/-179.8-ish) need
# dateline-crossing shapes, which this engine rejects loudly; they are
# asserted as raising below instead.
_SOLR3_CASES_A = [
    (False, Point(1, 1), 175, 3, {5, 6, 7}),
    (False, Point(50, 89.8), 200, 2, {10, 11}),  # over the north pole
    (False, Point(50, -89.8), 200, 2, {12, 13}),  # over the south pole
    (False, Point(-80.0, 33.0), 300, 2, set()),
    (False, Point(1, 1), 5000, 3, {5, 6, 7}),
    (True, Point(0.1, 0.1), 15, 2, {5, 6}),
]

_SOLR3_DOCS_B = {
    14: Point(5, 0),
    15: Point(15, 0),
    16: Point(19.79750, 18.71111),  # 3000KM from 0,0
    17: Point(-95.436643, 44.043900),
}

_SOLR3_CASES_B = [
    (False, Point(0, 0), 1000, 1, {14}),
    (False, Point(0, 0), 2000, 2, {14, 15}),
    (True, Point(0, 0), 3000, 3, {14, 15, 16}),
    (False, Point(0, 0), 3001, 3, {14, 15, 16}),
    (False, Point(0, 0), 3000.1, 3, {14, 15, 16}),
    (False, Point(-96.789603, 43.517030), 109, 0, set()),
    (False, Point(-96.789603, 43.517030), 110, 0, set()),
    (True, Point(-96.789603, 43.517030), 110, 1, {17}),
]


def _run_solr3(docs, cases):
    for strategy in _solr3_strategies():
        m = _Model(strategy)
        for d, p in docs.items():
            m.add(d, p)
        for bbox, pt, dist_km, num, ids in cases:
            shape = Circle(pt.x, pt.y, dist2degrees(dist_km))
            if bbox:
                shape = geo.circle_bbox(shape)
            got = m.search_ids(SpatialArgs("Intersects", shape))
            label = f"{type(strategy).__name__} {pt} {dist_km}km bbox={bbox}"
            assert len(got) == num, f"{label}: got {sorted(got)}"
            assert ids.issubset(got), label


def test_ported_solr3_intersections_a():
    _run_solr3(_SOLR3_DOCS_A, _SOLR3_CASES_A)


def test_ported_solr3_intersections_b():
    _run_solr3(_SOLR3_DOCS_B, _SOLR3_CASES_B)


def test_dateline_crossing_raises():
    # the reference's PortedSolr3Test also queries circles straddling the
    # dateline; this engine rejects those shapes loudly (module docstring)
    with pytest.raises(geo.NotSupportedError):
        geo.circle_bbox(Circle(179.8, 0, dist2degrees(200)))
    with pytest.raises(geo.NotSupportedError):
        Rect(170, -170, 0, 10)


def test_rpt_precision_circle():
    # TestRecursivePrefixTreeStrategy.TestPrecision
    t = RecursivePrefixTreeStrategy(GeohashPrefixTree(24), "g")
    m = _Model(t)
    ipt = Point(2.8028712999999925, 48.3708044)
    qpt = Point(2.4632387000000335, 48.6003516)
    m.add(1, ipt)
    km2deg = dist2degrees(1)
    dist = float(haversine_deg(ipt.y, ipt.x, qpt.y, qpt.x)) / km2deg
    assert abs(dist - 35.75) < 0.001
    def q(dist_km):
        return SpatialArgs(
            "Intersects", Circle(qpt.x, qpt.y, dist_km * km2deg),
            dist_err_pct=0.025,
        )
    assert m.search_ids(q(35.74)) == {1}
    assert m.search_ids(q(30)) == set()
    assert m.search_ids(q(33)) == set()
    assert m.search_ids(q(34)) == set()


# -- world-cities FILTER parity (cities-Intersects-BBox) ----------------------


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_cities_intersects_bbox():
    pts = {}
    with open(
        os.path.join(REF, "Test-Files/Data/world-cities-points.txt"),
        encoding="utf-8",
    ) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            did, _name, shape = line.rstrip("\n").split("\t")[:3]
            mm = re.match(r"POINT\(([-0-9.]+) ([-0-9.]+)\)", shape)
            pts[did] = Point(float(mm.group(1)), float(mm.group(2)))
    strategy = RecursivePrefixTreeStrategy(GeohashPrefixTree(24), "g")
    m = _Model(strategy)
    for did, p in pts.items():
        m.add(did, p)
    n_q = 0
    with open(
        os.path.join(REF, "Test-Files/cities-Intersects-BBox.txt"),
        encoding="utf-8",
    ) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            head, qstr = line.split("@", 1)
            ids = set(re.findall(r"G\d+", head))
            got = m.search_ids(parse_spatial_args(qstr.strip()))
            # SpatialMatchConcern.FILTER: the exact id set
            assert got == ids, line
            n_q += 1
    assert n_q >= 3


# -- TermQuery strategy == Recursive strategy on point data -------------------


def test_termquery_strategy_matches_recursive():
    rng = np.random.default_rng(11)
    pts = {
        i: Point(float(x), float(y))
        for i, (x, y) in enumerate(
            zip(rng.uniform(-170, 170, 300), rng.uniform(-80, 80, 300))
        )
    }
    grid = GeohashPrefixTree(8)
    rec = _Model(RecursivePrefixTreeStrategy(grid, "g"))
    tq = _Model(TermQueryPrefixTreeStrategy(grid, "g"))
    for d, p in pts.items():
        rec.add(d, p)
        tq.add(d, p)
    shapes = [
        Rect(-60, -20, 5, 35),
        Rect(10, 11, -5, 40),
        Circle(30, 30, 12.5),
        Circle(-100, -50, 4.0),
    ]
    for shape in shapes:
        args = SpatialArgs("Intersects", shape)
        assert rec.search_ids(args) == tq.search_ids(args)
        # and the TermQuery cover is the smaller (simplified) one
        assert len(tq.strategy.make_filter(args).terms) <= len(
            rec.strategy.make_filter(args).terms
        )


# -- cover model == per-point analytic predicate (the oracle's model) ---------


def test_cover_matches_analytic_cell_relate():
    """The gate oracle's semantics: cover-token membership == 'the doc's
    detail-level cell relates non-disjoint to the query shape'."""
    rng = np.random.default_rng(12)
    grid = GeohashPrefixTree(7)
    lons = rng.uniform(-170, 170, 500)
    lats = rng.uniform(-80, 80, 500)
    chains = grid.point_tokens_np(lons, lats)
    for shape, level in [
        (Rect(-60, -20, 5, 35), 4),
        (Rect(0.5, 0.6, -80, 80), 5),
        (Circle(30, 30, 12.5), 4),
    ]:
        toks = {t for t, _ in grid.cover(shape, level)}
        for i in range(len(lons)):
            covered = bool(toks.intersection(chains[i]))
            cell = grid.token_bounds(chains[i][level - 1])
            analytic = geo.shape_relate_rect(shape, cell) != geo.DISJOINT
            assert covered == analytic, (lons[i], lats[i], shape)


def test_quantized_distance_is_cell_center():
    from lucenenet_spark.operators.spatial import _quantize_to_cell_centers

    rng = np.random.default_rng(13)
    lons = rng.uniform(-170, 170, 50)
    lats = rng.uniform(-80, 80, 50)
    spec = SpatialDistanceSpec(grid_level=7)
    qx, qy = _quantize_to_cell_centers(spec, lons, lats)
    grid = GeohashPrefixTree(7)
    for i in range(len(lons)):
        b = grid.token_bounds(grid.point_token(lons[i], lats[i], 7))
        assert qx[i] == pytest.approx((b.min_x + b.max_x) / 2, abs=1e-12)
        assert qy[i] == pytest.approx((b.min_y + b.max_y) / 2, abs=1e-12)


def test_distance_sql_matches_numpy():
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from lucenenet_spark.operators.spatial import distance_sql

    rng = np.random.default_rng(14)
    df = pd.DataFrame(
        {"lon": rng.uniform(-170, 170, 2000), "lat": rng.uniform(-80, 80, 2000)}
    )
    for spec in [
        SpatialDistanceSpec(from_x=12.25, from_y=-33.5),
        SpatialDistanceSpec(from_x=10.0, from_y=20.0, grid_level=7),
        SpatialDistanceSpec(from_x=0.5, from_y=0.5, grid_level=9, grid="quad"),
    ]:
        con = duckdb.connect()
        con.register("t", df)
        got = np.array(
            [r[0] for r in con.execute(
                f"SELECT {distance_sql(spec)} FROM t"
            ).fetchall()]
        )
        lons, lats = df["lon"].to_numpy(), df["lat"].to_numpy()
        if spec.grid_level:
            from lucenenet_spark.operators.spatial import (
                _quantize_to_cell_centers,
            )

            lons, lats = _quantize_to_cell_centers(spec, lons, lats)
        want = np.asarray(
            haversine_deg(spec.from_y, spec.from_x, lats, lons), dtype=np.float64
        )
        # atan2 may differ by 1 ulp between numpy and libm (module docstring);
        # f32 (the SingleVal the engine exposes) must be bit-equal
        assert np.array_equal(
            got.astype(np.float32), want.astype(np.float32)
        )


# -- Spark round-trip: composition with the boolean/filter machinery ----------


@pytest.fixture(scope="module")
def geo_index(spark, tmp_path_factory):
    import pandas as pd

    from lucenenet_spark.operators.index_build import IndexBuilder
    from lucenenet_spark.operators.spatial import PrefixTreeStrategy

    rng = np.random.default_rng(21)
    n = 400
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c-{i//4:05d}" for i in range(n)],
            "turn_idx": [i % 4 for i in range(n)],
            "role": ["user", "assistant"][0:1] * n,
            "text": ["alpha beta gamma"] * n,
            "tool": [None] * n,
            "ts": pd.Timestamp("2024-01-01"),
            "lon": rng.uniform(-170, 170, n),
            "lat": rng.uniform(-80, 80, n),
        }
    )
    src = spark.createDataFrame(pdf)
    grid = GeohashPrefixTree(6)
    strat = RecursivePrefixTreeStrategy(grid, "geo")
    src = src.withColumn("geo", strat.indexable_terms("lon", "lat"))
    out = str(tmp_path_factory.mktemp("geoidx") / "idx")
    IndexBuilder(
        spark, out, n_buckets=4, n_segments=4,
        index_options="docs_freqs", keyword_fields=("role", "geo"),
        numeric_fields=("lon", "lat"),
    ).build(src, build_id="t-geo")
    return out, pdf, strat


def test_spark_spatial_filters_match_model(spark, geo_index):
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.operators.spatial import distance_topk

    out, pdf, strat = geo_index
    s = IndexSearcher(spark, out)
    pv = PointVectorStrategy()
    shape = Rect(-60.0, -20.0, 5.0, 35.0)
    args = SpatialArgs("Intersects", shape)
    # brute-force expected set over the raw points (grid-approximate for
    # the RPT strategy; exact for PointVector)
    lvl = strat.detail_level(args)
    grid = strat.grid
    exp_rpt = set()
    exp_pv = set()
    for i, (lon, lat) in enumerate(zip(pdf["lon"], pdf["lat"])):
        cell = grid.token_bounds(grid.point_token(lon, lat, lvl))
        if geo.shape_relate_rect(shape, cell) != geo.DISJOINT:
            exp_rpt.add(i)
        if shape.contains_point(lon, lat):
            exp_pv.add(i)
    got_rpt = {
        r["docid"]
        for r in s.search(strat.make_query(args), 1000).collect()
    }
    assert got_rpt == exp_rpt
    got_pv = {
        r["docid"] for r in s.search(pv.make_query(args), 1000).collect()
    }
    assert got_pv == exp_pv
    # circle through the ValueSourceFilter path
    c = Circle(10.0, 20.0, 30.0)
    got_c = {
        r["docid"]
        for r in s.search(pv.make_query(SpatialArgs("Intersects", c)), 1000).collect()
    }
    exp_c = {
        i
        for i, (lon, lat) in enumerate(zip(pdf["lon"], pdf["lat"]))
        if c.contains_point(lon, lat)
    }
    assert got_c == exp_c
    # distance sort: engine top-10 == numpy top-10 (f32, docid tiebreak)
    spec = pv.make_distance_value_source(Point(12.25, -33.5))
    got = [
        (r["docid"], r["score"]) for r in distance_topk(s, spec, 10).collect()
    ]
    d = haversine_deg(
        -33.5, 12.25, pdf["lat"].to_numpy(), pdf["lon"].to_numpy()
    ).astype(np.float32)
    order = sorted(range(len(d)), key=lambda i: (d[i], i))[:10]
    assert got == [(i, float(d[i])) for i in order]


def test_spatial_filter_composes_with_boolean(spark, geo_index):
    from lucenenet_spark.operators.search import IndexSearcher
    from lucenenet_spark.plans.query import FilteredQuery, TermQuery

    out, pdf, strat = geo_index
    s = IndexSearcher(spark, out)
    shape = Rect(-60.0, -20.0, 5.0, 35.0)
    f = strat.make_filter(SpatialArgs("Intersects", shape))
    # FilteredQuery(text query, spatial filter): BM25 scores unchanged,
    # docs restricted to the spatial match set
    q = FilteredQuery(query=TermQuery(term="alpha"), filter=f)
    got = {r["docid"] for r in s.search(q, 1000).collect()}
    lvl = strat.detail_level(SpatialArgs("Intersects", shape))
    exp = set()
    for i, (lon, lat) in enumerate(zip(pdf["lon"], pdf["lat"])):
        cell = strat.grid.token_bounds(strat.grid.point_token(lon, lat, lvl))
        if geo.shape_relate_rect(shape, cell) != geo.DISJOINT:
            exp.add(i)
    assert got == exp
