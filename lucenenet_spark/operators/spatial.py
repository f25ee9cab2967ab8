"""Spatial strategies (Lucene.Net.Spatial) over the distributed index.

Spark-first re-expression of the reference's spatial module:

  RecursivePrefixTreeStrategy   Prefix/RecursivePrefixTreeStrategy.cs:35-107
      Point docs index their grid-cell token CHAIN (levels 1..maxLevels,
      SpatialPrefixTree.GetCells(point, max, inclParents=true)) as a
      multi-valued keyword field — DOCS_ONLY, omitNorms
      (PrefixTreeStrategy.cs FIELD_TYPE). An Intersects filter compiles to
      the grid COVER of the query shape: cells WITHIN the shape plus
      detail-level cells intersecting it (IntersectsPrefixTreeFilter.cs
      Visit/VisitScanned collect exactly those) — a TermsFilter whose term
      list the terms dictionary prunes to, never a corpus scan. Because
      every doc carries its ancestor cells, a within-cell's exact term
      matches every doc beneath it — the Spark analogue of the reference's
      divide-and-conquer descent, with the SAME match set:
        {doc : cell_detailLevel(doc point) relates non-disjoint to shape}.
  TermQueryPrefixTreeStrategy   Prefix/TermQueryPrefixTreeStrategy.cs
      The simplified leaf cover (GetCells(shape, level, false, true)) as a
      plain TermsFilter — same match set for point data.
  DisjointSpatialFilter         DisjointSpatialFilter.cs:40-120
      Complement of the Intersects filter (field=None semantics: every doc
      has spatial data; ours is a required point column).
  PointVectorStrategy           Vector/PointVectorStrategy.cs:44-200
      The x/y DoubleField pair = two numeric doc columns; a rect query is
      two pushed-down numeric ranges; a circle query is the bbox ranges
      plus a ValueSourceFilter 0 <= distance <= radius
      (Util/ValueSourceFilter.cs:75 — inclusive double bounds).
  DistanceValueSource           Vector/DistanceValueSource.cs:40-130
      haversine degrees x multiplier, double-valued; SingleVal = f32.
  ShapeFieldCacheDistanceValueSource  Util/, via PrefixTreeStrategy.
      MakeDistanceValueSource — doc points QUANTIZED to their maxLevels
      grid-cell center (PointPrefixTreeFieldCacheProvider decodes the
      indexed term): grid_level > 0 on the spec.
  MakeRecipDistanceValueSource  SpatialStrategy.cs:147-159
      c = 0.1 * bbox diagonal; f32 c/(1*dist + c) over the f32 distance.

Distance arithmetic note: sin/cos/sqrt are bit-identical across numpy,
libm and DuckDB on this platform (verified); atan2 can differ by 1 ulp in
double between numpy and libm — the same tolerance class as the JVM-vs-
libm `ln` divergence documented for the expressions module. Score outputs
are float32 (SingleVal), which absorbs the ulp.

Dateline-crossing query shapes raise loudly (functions/geo.py); the
builder indexes points only (PointVectorStrategy.CreateIndexableFields
raises for non-points the same way, PointVectorStrategy.cs:86).
"""
from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import geo
from ..functions.geo import (
    Circle,
    GeohashPrefixTree,
    NotSupportedError,
    Point,
    QuadPrefixTree,
    Rect,
)
from ..functions.valuesource import VS, reciprocal
from ..plans.query import (
    BooleanFilter,
    ConstantScoreQuery,
    Filter,
    NumericRangeFilter,
    SpatialDistanceSpec,
    TermsFilter,
    ValueSourceFilter,
)

# -- SpatialOperation / SpatialArgs (Query/SpatialOperation.cs, SpatialArgs.cs)

INTERSECTS = "Intersects"
IS_WITHIN = "IsWithin"
CONTAINS = "Contains"
IS_DISJOINT_TO = "IsDisjointTo"
BBOX_INTERSECTS = "BBoxIntersects"
BBOX_WITHIN = "BBoxWithin"
IS_EQUAL_TO = "IsEqualTo"

_OP_ALIASES = {
    "intersects": INTERSECTS,
    "iswithin": IS_WITHIN,
    "within": IS_WITHIN,
    "coveredby": IS_WITHIN,
    "contains": CONTAINS,
    "covers": CONTAINS,
    "isdisjointto": IS_DISJOINT_TO,
    "disjoint": IS_DISJOINT_TO,
    "bboxintersects": BBOX_INTERSECTS,
    "bboxwithin": BBOX_WITHIN,
    "isequalto": IS_EQUAL_TO,
    "equals": IS_EQUAL_TO,
}

DEFAULT_DIST_ERR_PCT = 0.025  # SpatialArgs.cs:32


def spatial_operation(name: str) -> str:
    op = _OP_ALIASES.get(name.strip().lower())
    if op is None:
        raise ValueError(f"unknown spatial operation {name!r}")
    return op


@dataclass(frozen=True)
class SpatialArgs:
    operation: str
    shape: object
    dist_err_pct: float | None = None
    dist_err: float | None = None

    def resolve_dist_err(self, default_pct: float) -> float:
        """SpatialArgs.ResolveDistErr: explicit distErr wins, else derived
        from the (possibly per-query) error fraction."""
        if self.dist_err is not None:
            return self.dist_err
        pct = self.dist_err_pct if self.dist_err_pct is not None else default_pct
        return geo.calc_distance_from_err_pct(self.shape, pct)


_NUM = r"[-+0-9.eE]+"


def parse_shape(body: str) -> object:
    """Shape sub-grammar of SpatialArgsParser.ParseShape: POINT(x y),
    ENVELOPE(minX, maxX, maxY, minY), BUFFER(POINT(x y), dist) = circle."""
    s = body.strip()
    m = re.fullmatch(rf"(?i)point\s*\(\s*({_NUM})\s+({_NUM})\s*\)", s)
    if m:
        return Point(float(m.group(1)), float(m.group(2)))
    m = re.fullmatch(
        rf"(?i)envelope\s*\(\s*({_NUM})\s*,\s*({_NUM})\s*,\s*({_NUM})\s*,\s*({_NUM})\s*\)",
        s,
    )
    if m:
        # ENVELOPE order: minX, maxX, maxY, minY (WKT-envelope convention)
        a, b, c, d = (float(m.group(i)) for i in range(1, 5))
        return Rect(a, b, d, c)
    m = re.fullmatch(
        rf"(?i)buffer\s*\(\s*point\s*\(\s*({_NUM})\s+({_NUM})\s*\)\s*,\s*({_NUM})\s*\)",
        s,
    )
    if m:
        return Circle(float(m.group(1)), float(m.group(2)), float(m.group(3)))
    raise ValueError(f"unsupported shape syntax: {body!r}")


def parse_spatial_args(text: str) -> SpatialArgs:
    """SpatialArgsParser.Parse (Query/SpatialArgsParser.cs:72-140):
    '<Op>(<shape>) [distErrPct=..] [distErr=..]'."""
    idx, edx = text.find("("), text.rfind(")")
    if idx < 0 or idx > edx:
        raise ValueError(f"missing parens: {text!r}")
    op = spatial_operation(text[:idx])
    body = text[idx + 1 : edx].strip()
    if not body:
        raise ValueError(f"missing body: {text!r}")
    shape = parse_shape(body)
    kwargs: dict = {}
    tail = text[edx + 1 :].strip()
    if tail:
        for pair in tail.split():
            k, _, v = pair.partition("=")
            if k == "distErrPct":
                kwargs["dist_err_pct"] = float(v)
            elif k == "distErr":
                kwargs["dist_err"] = float(v)
            else:
                raise ValueError(f"unused parameter {pair!r}")
    return SpatialArgs(op, shape, **kwargs)


# -- strategies ---------------------------------------------------------------


class PrefixTreeStrategy:
    """Base indexing side (Prefix/PrefixTreeStrategy.cs:74-160): one
    multi-valued keyword term per grid cell, points at full precision."""

    def __init__(self, grid, field_name: str = "geo",
                 dist_err_pct: float = DEFAULT_DIST_ERR_PCT):
        self.grid = grid
        self.field_name = field_name
        self.dist_err_pct = dist_err_pct

    def indexable_terms(self, lon_col: str, lat_col: str) -> Column:
        """array<string> column of the point's cell-token chain — feed it
        to IndexBuilder as a multi-valued keyword field. Vectorized Arrow
        UDF (the analysis chain of PrefixTreeStrategy.CreateIndexableFields,
        whose CellTokenStream emits the grid cells as tokens)."""
        grid = self.grid

        @F.pandas_udf("array<string>")
        def cell_chain(lon: pd.Series, lat: pd.Series) -> pd.Series:
            toks = grid.point_tokens_np(
                lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64)
            )
            return pd.Series(toks)

        return cell_chain(F.col(lon_col), F.col(lat_col))

    def detail_level(self, args: SpatialArgs) -> int:
        return self.grid.get_level_for_distance(
            args.resolve_dist_err(self.dist_err_pct)
        )

    def _cover_filter(self, args: SpatialArgs) -> Filter:
        level = self.detail_level(args)
        cover = self.grid.cover(args.shape, level)
        return TermsFilter(
            terms=tuple((self.field_name, tok) for tok, _ in cover)
        )

    def make_filter(self, args: SpatialArgs) -> Filter:
        raise NotImplementedError

    def make_query(self, args: SpatialArgs) -> ConstantScoreQuery:
        """SpatialStrategy.MakeQuery: ConstantScoreQuery(MakeFilter(args))."""
        return ConstantScoreQuery(filter=self.make_filter(args))

    def make_distance_value_source(
        self, point: Point, multiplier: float = 1.0,
        x_col: str = "lon", y_col: str = "lat",
    ) -> SpatialDistanceSpec:
        """PrefixTreeStrategy.MakeDistanceValueSource: doc points are read
        back from the indexed maxLevels cell terms, i.e. QUANTIZED to the
        cell center (PointPrefixTreeFieldCacheProvider.ReadShape)."""
        return SpatialDistanceSpec(
            x_col=x_col, y_col=y_col, from_x=point.x, from_y=point.y,
            multiplier=multiplier, grid_level=self.grid.max_levels,
            grid="quad" if isinstance(self.grid, QuadPrefixTree) else "geohash",
        )


class RecursivePrefixTreeStrategy(PrefixTreeStrategy):
    """Prefix/RecursivePrefixTreeStrategy.cs MakeFilter: Intersects (and,
    for point data, IsWithin — PrefixTreeStrategy header: point-only data
    makes Intersects equivalent to IsWithin) -> the grid-cover TermsFilter;
    IsDisjointTo -> DisjointSpatialFilter; Contains needs indexed shapes
    with leaf bookkeeping -> unsupported for point data, raise."""

    def make_filter(self, args: SpatialArgs) -> Filter:
        if args.operation in (INTERSECTS, IS_WITHIN):
            return self._cover_filter(args)
        if args.operation == IS_DISJOINT_TO:
            inner = self._cover_filter(
                SpatialArgs(INTERSECTS, args.shape, args.dist_err_pct, args.dist_err)
            )
            # DisjointSpatialFilter(field=null): all docs minus intersects
            return BooleanFilter(must_not=(inner,))
        raise NotSupportedError(f"unsupported spatial operation {args.operation}")


class TermQueryPrefixTreeStrategy(PrefixTreeStrategy):
    """Prefix/TermQueryPrefixTreeStrategy.cs: the simplified leaf cover as
    a TermsFilter (simplify substitutes a parent cell when all of its
    children are complete leaves — SpatialPrefixTree.RecursiveGetCells
    simplify arm; the match set is unchanged for point data because docs
    index ancestor cells too)."""

    def make_filter(self, args: SpatialArgs) -> Filter:
        if args.operation not in (INTERSECTS, IS_WITHIN):
            raise NotSupportedError(
                f"unsupported spatial operation {args.operation}"
            )
        level = self.detail_level(args)
        cover = self.grid.cover(args.shape, level)
        cover = _simplify_cover(self.grid, cover)
        return TermsFilter(
            terms=tuple((self.field_name, tok) for tok, _ in cover)
        )


def _simplify_cover(
    grid, cover: list[tuple[str, bool]]
) -> list[tuple[str, bool]]:
    """SpatialPrefixTree.RecursiveGetCells simplify: while a parent's
    complete child set is all leaves, substitute the parent."""
    toks = {tok: within for tok, within in cover}
    n_children = len(grid.subcell_tokens(""))
    changed = True
    while changed:
        changed = False
        parents = {t[:-1] for t in toks if len(t) > 1}
        for p in parents:
            kids = grid.subcell_tokens(p)
            if all(k in toks for k in kids):
                for k in kids:
                    del toks[k]
                toks[p] = True
                changed = True
    assert n_children > 0
    return sorted(toks.items())


class PointVectorStrategy:
    """Vector/PointVectorStrategy.cs over two numeric doc columns."""

    def __init__(self, x_col: str = "lon", y_col: str = "lat"):
        self.x_col, self.y_col = x_col, y_col

    def _bbox_filter(self, r: Rect) -> Filter:
        # MakeWithin: an x NumericRangeQuery AND a y NumericRangeQuery —
        # native pushdown on the typed doc columns
        return BooleanFilter(
            must=(
                NumericRangeFilter(
                    field=self.x_col, lower=r.min_x, upper=r.max_x,
                    include_lower=True, include_upper=True,
                ),
                NumericRangeFilter(
                    field=self.y_col, lower=r.min_y, upper=r.max_y,
                    include_lower=True, include_upper=True,
                ),
            )
        )

    def make_distance_value_source(
        self, point: Point, multiplier: float = 1.0
    ) -> SpatialDistanceSpec:
        return SpatialDistanceSpec(
            x_col=self.x_col, y_col=self.y_col,
            from_x=point.x, from_y=point.y, multiplier=multiplier,
        )

    def make_filter(self, args: SpatialArgs) -> Filter:
        if args.operation not in (INTERSECTS, IS_WITHIN):
            raise NotSupportedError(
                f"unsupported spatial operation {args.operation}"
            )
        shape = args.shape
        if isinstance(shape, Rect):
            return self._bbox_filter(shape)
        if isinstance(shape, Circle):
            # bbox ranges + ValueSourceFilter(distance, 0, radius) —
            # PointVectorStrategy.cs MakeQuery circle arm
            return ValueSourceFilter(
                filter=self._bbox_filter(geo.circle_bbox(shape)),
                source=self.make_distance_value_source(shape.center),
                min=0.0,
                max=shape.radius,
            )
        raise NotSupportedError(
            f"only rectangles and circles are supported, found "
            f"{type(shape).__name__}"
        )

    def make_query(self, args: SpatialArgs) -> ConstantScoreQuery:
        return ConstantScoreQuery(filter=self.make_filter(args))


# -- distance evaluation ------------------------------------------------------


def _quantize_to_cell_centers(
    spec: SpatialDistanceSpec, lons: np.ndarray, lats: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Doc point -> its maxLevels cell CENTER, the value the reference's
    ShapeFieldCache holds after decoding the indexed term."""
    level = spec.grid_level
    if spec.grid == "quad":
        tree = QuadPrefixTree(level)
        n = 1 << level
        ix, iy = tree.cell_index(lons, lats, level)
        b = tree.bounds
        w, h = (b.max_x - b.min_x) / n, (b.max_y - b.min_y) / n
        return (
            b.min_x + (ix.astype(np.float64) + 0.5) * w,
            b.min_y + (iy.astype(np.float64) + 0.5) * h,
        )
    xb, yb = geo._gh_bits(level)
    ix, iy = GeohashPrefixTree.cell_index(lons, lats, level)
    w, h = 360.0 / (1 << xb), 180.0 / (1 << yb)
    return (
        -180.0 + (ix.astype(np.float64) + 0.5) * w,
        -90.0 + (iy.astype(np.float64) + 0.5) * h,
    )


def distance_column(spec: SpatialDistanceSpec) -> Column:
    """DOUBLE distance column (DistanceValueSource.DoubleVal): haversine
    degrees from the query point to the doc point (or its grid-cell
    center) times the multiplier. Vectorized Arrow UDF — numpy trig."""

    @F.pandas_udf("double")
    def dist(xs: pd.Series, ys: pd.Series) -> pd.Series:
        lons = xs.to_numpy(dtype=np.float64)
        lats = ys.to_numpy(dtype=np.float64)
        if spec.grid_level:
            lons, lats = _quantize_to_cell_centers(spec, lons, lats)
        d = geo.haversine_deg(spec.from_y, spec.from_x, lats, lons)
        return pd.Series(np.asarray(d, dtype=np.float64) * spec.multiplier)

    return dist(F.col(spec.x_col), F.col(spec.y_col))


def distance_sql(spec: SpatialDistanceSpec, dialect: str = "duck") -> str:
    """The same distance as ANSI SQL (for DuckDB oracles): identical
    operation order; doubles. Grid quantization mirrors the arithmetic
    cell-identity form (functions/geo.py module docstring)."""
    lon, lat = spec.x_col, spec.y_col
    if spec.grid_level:
        level = spec.grid_level
        if spec.grid == "quad":
            n = 1 << level
            w, h = 360.0 / n, 180.0 / n
            ix = (
                f"LEAST(GREATEST(CEIL(({lon} + 180.0) / 360.0 * {float(n)!r})"
                f" - 1, 0), {n - 1})"
            )
            iy = f"LEAST(GREATEST(FLOOR(({lat} + 90.0) / 180.0 * {float(n)!r}), 0), {n - 1})"
        else:
            xb, yb = geo._gh_bits(level)
            nx, ny = 1 << xb, 1 << yb
            w, h = 360.0 / nx, 180.0 / ny
            ix = (
                f"LEAST(GREATEST(CEIL(({lon} + 180.0) / 360.0 * {float(nx)!r})"
                f" - 1, 0), {nx - 1})"
            )
            iy = (
                f"LEAST(GREATEST(CEIL(({lat} + 90.0) / 180.0 * {float(ny)!r})"
                f" - 1, 0), {ny - 1})"
            )
        lon = f"(-180.0 + (({ix}) + 0.5) * {w!r})"
        lat = f"(-90.0 + (({iy}) + 0.5) * {h!r})"
    r = geo._DEG2RAD
    rl1 = f"({spec.from_y!r} * {r!r})"
    rl2 = f"(({lat}) * {r!r})"
    rn1 = f"({spec.from_x!r} * {r!r})"
    rn2 = f"(({lon}) * {r!r})"
    hx = f"SIN(({rn1} - {rn2}) * 0.5)"
    hy = f"SIN(({rl1} - {rl2}) * 0.5)"
    h = f"({hy} * {hy} + COS({rl1}) * COS({rl2}) * {hx} * {hx})"
    d = f"(2.0 * ATAN2(SQRT({h}), SQRT(1.0 - {h})) * {geo._RAD2DEG!r})"
    if spec.multiplier != 1.0:
        d = f"({d} * {spec.multiplier!r})"
    return d


def distance_topk(searcher, spec: SpatialDistanceSpec, k: int = 10):
    """Top-k nearest docs by the f32 distance value source — Sort by a
    SortField over MakeDistanceValueSource (DistanceStrategyTest's
    testDistanceSort path; the comparator reads SingleVal = f32)."""
    out = searcher.docs().select(
        "docid", distance_column(spec).cast("float").alias("score")
    )
    out = searcher._apply_live_docs(out)
    return out.orderBy(F.asc("score"), F.asc("docid")).limit(k)


def recip_distance_topk(searcher, strategy, query_shape, k: int = 10):
    """FunctionQuery over MakeRecipDistanceValueSource: every live doc
    matches, score = f32(c/(1*f32(dist)+c)) (qWeight of an unboosted
    standalone query cancels to 1 through CreateNormalizedWeight)."""
    vs, spec = recip_distance_vs(strategy, query_shape)
    out = searcher.docs().select(
        "docid", distance_column(spec).alias("__dist")
    )
    out = out.select(
        "docid", F.expr(vs.spark).cast("float").alias("score")
    )
    out = searcher._apply_live_docs(out)
    return out.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def recip_distance_vs(strategy, query_shape) -> tuple[VS, SpatialDistanceSpec]:
    """SpatialStrategy.MakeRecipDistanceValueSource (SpatialStrategy.cs:
    147-159): c = 0.1 * distance(bbox min corner -> max corner);
    ReciprocalSingleFunction(dist, 1, c, c) over the f32 distance. Returns
    the dual-dialect VS (the engine side substitutes the distance via a
    column named `__dist`, the oracle via distance_sql)."""
    bbox = geo.shape_bbox(query_shape)
    diagonal = float(
        geo.haversine_deg(bbox.min_y, bbox.min_x, bbox.max_y, bbox.max_x)
    )
    c = diagonal * 0.1
    spec = strategy.make_distance_value_source(query_shape.center, 1.0)
    dist = VS(
        "CAST(__dist AS FLOAT)", f"CAST({distance_sql(spec)} AS REAL)"
    )
    return reciprocal(dist, 1.0, c, c), spec
