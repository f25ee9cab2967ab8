"""Spatial core: geodesic shapes + prefix trees (Lucene.Net.Spatial).

Re-derivation of the spatial primitives the reference's Spatial module
builds on (the reference consumes them from the Spatial4n package; the
algorithms are the published spatial4j/geohash ones):

  haversine distance      GeodesicSphereDistCalc.Haversine — the published
                          haversine formula on the mean-radius sphere,
                          distances in DEGREES (radians * 180/pi)
  geohash tree            Prefix/Tree/GeohashPrefixTree.cs — base-32 cells,
                          lon-first bit interleaving, widths halving
                          5 bits / 2 axes per character
  quad tree               Prefix/Tree/QuadPrefixTree.cs:30-260 — 'A'..'D'
                          Z-order quadrants over world bounds
  shape covers            Prefix/Tree/SpatialPrefixTree.cs RecursiveGetCells
                          (cells WITHIN the query become leaves; descent
                          stops at detailLevel) and Cell.GetSubCells(filter)
  rect relate             spatial4j RectangleImpl per-axis range relation
                          (equal ranges -> CONTAINS; touching edges ->
                          INTERSECTS, never DISJOINT)
  circle relate           derived from first principles on the sphere (the
                          reference's GeoCircle): min distance via the
                          great-circle perpendicular foot on meridian
                          edges, max distance via corners + interior
                          antipodal extrema; circle-in-rect via the
                          circle's bounding box
  circle bbox             DistanceUtils.CalcBoxByDistFromPt: lat +- r,
                          lon half-width asin(sin r / cos lat), full
                          longitude range when a pole is inside

Boundary conventions preserved exactly:
  * geohash/quad point encoding sends a point ON a cell boundary to the
    LOWER lon cell (spatial4j GeohashUtils uses `lon > mid`) and — for the
    quad tree — to the NORTH/WEST cell (QuadPrefixTree.cs CheckBattenberg
    checks quadrants in A,B,C,D order with inclusive rect containment).
  * the encoders use the closed arithmetic form ceil(p)-1 / floor(q)
    instead of interval bisection so the DuckDB oracle can reproduce cell
    identity with the textually identical expression (bisection midpoints
    are exact binary doubles, so the two forms agree wherever the scaled
    position computes exactly; near-boundary 1-ulp rounding could differ
    from bisection, but engine and oracle share one form by construction).

Dateline-crossing query rectangles and dateline-crossing circles raise
NotSupportedError loudly (PointVectorStrategy.cs:199 raises the same way);
pole-crossing circles are supported (full-longitude bbox).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

# DistanceUtils.EarthMeanRadiusKilometers (published WGS84 mean radius)
EARTH_MEAN_RADIUS_KM = 6371.0087714

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_MAX_PRECISION = 24  # GeohashUtils.MaxPrecision

DISJOINT, INTERSECTS, WITHIN, CONTAINS = (
    "DISJOINT", "INTERSECTS", "WITHIN", "CONTAINS"
)


class NotSupportedError(ValueError):
    pass


def transpose(rel: str) -> str:
    if rel == WITHIN:
        return CONTAINS
    if rel == CONTAINS:
        return WITHIN
    return rel


# explicit conversion constants so the DuckDB oracle can reproduce the
# exact double operation (x * constant) — np.radians/np.degrees internals
# would leave the rounding order unspecified
_DEG2RAD = math.pi / 180.0
_RAD2DEG = 180.0 / math.pi


def dist2degrees(dist_km: float, radius_km: float = EARTH_MEAN_RADIUS_KM) -> float:
    """DistanceUtils.Dist2Degrees: arc kilometers -> central-angle degrees."""
    return (dist_km / radius_km) * _RAD2DEG


def haversine_deg(lat1, lon1, lat2, lon2):
    """Great-circle distance in DEGREES between degree coordinates.

    The haversine formula in the reference's operation order
    (DistanceUtils.DistHaversineRAD): works on scalars and numpy arrays.
    """
    rlat1, rlon1 = np.asarray(lat1, dtype=np.float64) * _DEG2RAD, np.asarray(lon1, dtype=np.float64) * _DEG2RAD
    rlat2, rlon2 = np.asarray(lat2, dtype=np.float64) * _DEG2RAD, np.asarray(lon2, dtype=np.float64) * _DEG2RAD
    hx = np.sin((rlon1 - rlon2) * 0.5)
    hy = np.sin((rlat1 - rlat2) * 0.5)
    h = hy * hy + np.cos(rlat1) * np.cos(rlat2) * hx * hx
    return (2.0 * np.arctan2(np.sqrt(h), np.sqrt(1.0 - h))) * _RAD2DEG


# -- shapes -------------------------------------------------------------------


@dataclass(frozen=True)
class Point:
    x: float  # lon
    y: float  # lat


@dataclass(frozen=True)
class Rect:
    min_x: float
    max_x: float
    min_y: float
    max_y: float

    def __post_init__(self):
        if self.min_x > self.max_x:
            raise NotSupportedError(
                "dateline-crossing rectangles are not supported"
            )

    @property
    def center(self) -> Point:
        return Point((self.min_x + self.max_x) / 2.0, (self.min_y + self.max_y) / 2.0)

    def contains_point(self, x: float, y: float) -> bool:
        # RectangleImpl containment is inclusive on every edge
        return (
            self.min_x <= x <= self.max_x and self.min_y <= y <= self.max_y
        )


@dataclass(frozen=True)
class Circle:
    x: float  # center lon
    y: float  # center lat
    radius: float  # degrees

    @property
    def center(self) -> Point:
        return Point(self.x, self.y)

    def contains_point(self, x: float, y: float) -> bool:
        return float(haversine_deg(self.y, self.x, y, x)) <= self.radius


Shape = object  # Point | Rect | Circle


def _relate_range(int_min, int_max, ext_min, ext_max) -> str:
    """spatial4j RectangleImpl per-axis range relation (this range vs ext)."""
    if ext_min > int_max or ext_max < int_min:
        return DISJOINT
    if ext_min >= int_min and ext_max <= int_max:
        return CONTAINS
    if ext_min <= int_min and ext_max >= int_max:
        return WITHIN
    return INTERSECTS


def rect_relate_rect(a: Rect, b: Rect) -> str:
    """Relation of rect `a` to rect `b` (RectangleImpl.Relate(Rectangle))."""
    rel_y = _relate_range(a.min_y, a.max_y, b.min_y, b.max_y)
    if rel_y == DISJOINT:
        return DISJOINT
    rel_x = _relate_range(a.min_x, a.max_x, b.min_x, b.max_x)
    if rel_x == DISJOINT:
        return DISJOINT
    if rel_x == rel_y:
        return rel_x
    if a.min_x == b.min_x and a.max_x == b.max_x:
        return rel_y
    if a.min_y == b.min_y and a.max_y == b.max_y:
        return rel_x
    return INTERSECTS


def circle_bbox(c: Circle) -> Rect:
    """DistanceUtils.CalcBoxByDistFromPtDEG: the geodesic circle's lat/lon
    bounding box; full longitude range when the circle encloses a pole."""
    if c.radius >= 180.0:
        return Rect(-180.0, 180.0, -90.0, 90.0)
    min_y, max_y = c.y - c.radius, c.y + c.radius
    if max_y >= 90.0 or min_y <= -90.0:
        return Rect(-180.0, 180.0, max(min_y, -90.0), min(max_y, 90.0))
    # half-width of the bounding longitudes: asin(sin r / cos lat)
    half = math.degrees(
        math.asin(min(1.0, math.sin(math.radians(c.radius)) / math.cos(math.radians(c.y))))
    )
    min_x, max_x = c.x - half, c.x + half
    if min_x < -180.0 or max_x > 180.0:
        raise NotSupportedError("dateline-crossing circles are not supported")
    return Rect(min_x, max_x, min_y, max_y)


def _min_dist_to_rect(c: Circle, r: Rect) -> float:
    """Geodesic minimum distance (degrees) from the circle center to rect r."""
    if r.contains_point(c.x, c.y):
        return 0.0
    if r.min_x <= c.x <= r.max_x:
        # directly north/south to the nearer parallel edge: a meridian arc,
        # whose length is the plain latitude difference
        if c.y > r.max_y:
            return c.y - r.max_y
        return r.min_y - c.y
    # nearest point lies on a meridian edge: great-circle perpendicular
    # foot tan(lat*) = tan(lat0) / cos(dlon), clamped to the edge's lats
    best = math.inf
    phi0 = math.radians(c.y)
    for lon in (r.min_x, r.max_x):
        dlon = abs(c.x - lon)
        if dlon > 180.0:
            dlon = 360.0 - dlon
        foot = math.degrees(
            math.atan2(math.sin(phi0), math.cos(phi0) * math.cos(math.radians(dlon)))
        )
        lat = min(max(foot, r.min_y), r.max_y)
        best = min(best, float(haversine_deg(c.y, c.x, lat, lon)))
    return best


def _max_dist_to_rect(c: Circle, r: Rect) -> float:
    """Geodesic maximum distance (degrees) from the circle center to rect r."""
    cands = [
        (r.min_y, r.min_x), (r.min_y, r.max_x),
        (r.max_y, r.min_x), (r.max_y, r.max_x),
    ]
    # interior extrema on meridian edges: d(lat) has one interior critical
    # point pair (the perpendicular foot and its antipode); include any that
    # fall inside the edge's latitude range
    phi0 = math.radians(c.y)
    for lon in (r.min_x, r.max_x):
        dlon = abs(c.x - lon)
        if dlon > 180.0:
            dlon = 360.0 - dlon
        foot = math.degrees(
            math.atan2(math.sin(phi0), math.cos(phi0) * math.cos(math.radians(dlon)))
        )
        for lat in (foot, foot + 180.0, foot - 180.0):
            if r.min_y <= lat <= r.max_y and -90.0 <= lat <= 90.0:
                cands.append((lat, lon))
    # interior extrema on parallel edges occur at the antipodal longitude
    anti = c.x + 180.0 if c.x < 0 else c.x - 180.0
    if r.min_x <= anti <= r.max_x:
        cands.append((r.min_y, anti))
        cands.append((r.max_y, anti))
    return max(float(haversine_deg(c.y, c.x, lat, lon)) for lat, lon in cands)


def circle_relate_rect(c: Circle, r: Rect) -> str:
    """Relation of circle `c` to rect `r` (the reference's GeoCircle path,
    re-derived geodesically — see module docstring)."""
    if _min_dist_to_rect(c, r) > c.radius:
        return DISJOINT
    if _max_dist_to_rect(c, r) <= c.radius:
        return CONTAINS
    bbox = circle_bbox(c)
    if rect_relate_rect(bbox, r) == WITHIN:
        return WITHIN
    return INTERSECTS


def shape_relate_rect(shape, r: Rect) -> str:
    """Relation of a query shape to a cell rect (Cell.GetSubCells(filter)
    evaluates cellShape.Relate(filter); this is the transpose)."""
    if isinstance(shape, Rect):
        return rect_relate_rect(shape, r)
    if isinstance(shape, Circle):
        return circle_relate_rect(shape, r)
    if isinstance(shape, Point):
        return WITHIN if r.contains_point(shape.x, shape.y) else DISJOINT
    raise NotSupportedError(f"unsupported shape {type(shape).__name__}")


def shape_bbox(shape) -> Rect:
    if isinstance(shape, Rect):
        return shape
    if isinstance(shape, Circle):
        return circle_bbox(shape)
    if isinstance(shape, Point):
        return Rect(shape.x, shape.x, shape.y, shape.y)
    raise NotSupportedError(f"unsupported shape {type(shape).__name__}")


def calc_distance_from_err_pct(shape, dist_err_pct: float) -> float:
    """SpatialArgs.CalcDistanceFromErrPct (SpatialArgs.cs:55-82): the
    distance from the bbox center to its pole-wards-nearest corner, scaled
    by the error fraction. Points (and pct 0) resolve to 0."""
    if dist_err_pct < 0 or dist_err_pct > 0.5:
        raise ValueError(f"distErrPct {dist_err_pct} must be between [0 to 0.5]")
    if dist_err_pct == 0 or isinstance(shape, Point):
        return 0.0
    bbox = shape_bbox(shape)
    ctr = bbox.center
    y = bbox.max_y if ctr.y >= 0 else bbox.min_y
    diagonal = float(haversine_deg(ctr.y, ctr.x, y, bbox.max_x))
    return diagonal * dist_err_pct


# -- prefix trees -------------------------------------------------------------


def _gh_bits(level: int) -> tuple[int, int]:
    """(lon bits, lat bits) for a geohash of `level` characters — bits
    alternate lon-first, 5 per character."""
    total = 5 * level
    return (total + 1) // 2, total // 2


# geohash per-level cell sizes (GeohashUtils width/height tables):
# level 1 = 45x45 deg; lat divides by 4,8 alternating; lon by 8,4
_GH_LAT_HEIGHT = [180.0]
_GH_LON_WIDTH = [360.0]
for _i in range(1, GEOHASH_MAX_PRECISION + 1):
    _even = _i % 2 == 0  # matches the reference's alternation start
    _GH_LAT_HEIGHT.append(_GH_LAT_HEIGHT[-1] / (8 if _even else 4))
    _GH_LON_WIDTH.append(_GH_LON_WIDTH[-1] / (4 if _even else 8))


def lookup_hash_len_for_width_height(lon_err: float, lat_err: float) -> int:
    """GeohashUtils.LookupHashLenForWidthHeight: smallest length whose cell
    is strictly smaller than the error box on BOTH axes."""
    for ln in range(1, GEOHASH_MAX_PRECISION):
        if _GH_LAT_HEIGHT[ln] < lat_err and _GH_LON_WIDTH[ln] < lon_err:
            return ln
    return GEOHASH_MAX_PRECISION


class GeohashPrefixTree:
    """Prefix/Tree/GeohashPrefixTree.cs over geo world bounds."""

    def __init__(self, max_levels: int = 12):
        if max_levels <= 0 or max_levels > GEOHASH_MAX_PRECISION:
            raise ValueError(f"maxLen must be [1-{GEOHASH_MAX_PRECISION}]")
        self.max_levels = max_levels

    def get_level_for_distance(self, dist: float) -> int:
        if dist == 0:
            return self.max_levels
        level = lookup_hash_len_for_width_height(dist, dist)
        return max(min(level, self.max_levels), 1)

    # arithmetic cell identity (see module docstring on the boundary rule)
    @staticmethod
    def cell_index(lon, lat, level: int):
        xb, yb = _gh_bits(level)
        nx, ny = 1 << xb, 1 << yb
        ix = np.ceil((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nx) - 1.0
        iy = np.ceil((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * ny) - 1.0
        ix = np.clip(ix, 0, nx - 1).astype(np.int64)
        iy = np.clip(iy, 0, ny - 1).astype(np.int64)
        return ix, iy

    @staticmethod
    def _interleave(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
        """(n, level) array of base32 char codes, lon bits first."""
        xb, yb = _gh_bits(level)
        total = 5 * level
        bits = np.zeros((len(ix), total), dtype=np.int64)
        # even stream positions (0-based from the MSB) take lon bits
        for j in range(xb):
            bits[:, 2 * j] = (ix >> (xb - 1 - j)) & 1
        for j in range(yb):
            bits[:, 2 * j + 1] = (iy >> (yb - 1 - j)) & 1
        chars = np.zeros((len(ix), level), dtype=np.int64)
        for k in range(level):
            v = (
                (bits[:, 5 * k] << 4) | (bits[:, 5 * k + 1] << 3)
                | (bits[:, 5 * k + 2] << 2) | (bits[:, 5 * k + 3] << 1)
                | bits[:, 5 * k + 4]
            )
            chars[:, k] = v
        return chars

    def point_token(self, x: float, y: float, level: int) -> str:
        ix, iy = self.cell_index(np.array([x]), np.array([y]), level)
        chars = self._interleave(ix, iy, level)[0]
        return "".join(GEOHASH_BASE32[int(v)] for v in chars)

    def point_tokens_np(self, lons: np.ndarray, lats: np.ndarray) -> list[list[str]]:
        """Per point: the token chain levels 1..max_levels (the cells a
        point document indexes — SpatialPrefixTree.GetCells(point, max,
        inclParents=true))."""
        lvl = self.max_levels
        ix, iy = self.cell_index(lons, lats, lvl)
        chars = self._interleave(ix, iy, lvl)
        full = ["".join(GEOHASH_BASE32[int(v)] for v in row) for row in chars]
        return [[s[:i] for i in range(1, lvl + 1)] for s in full]

    @staticmethod
    def token_index(token: str) -> tuple[int, int]:
        """Token -> (ix, iy) by de-interleaving its base32 bits."""
        ix = iy = 0
        pos = 0
        for ch in token:
            v = GEOHASH_BASE32.index(ch)
            for b in range(4, -1, -1):
                bit = (v >> b) & 1
                if pos % 2 == 0:
                    ix = (ix << 1) | bit
                else:
                    iy = (iy << 1) | bit
                pos += 1
        return ix, iy

    def token_bounds(self, token: str) -> Rect:
        level = len(token)
        if level == 0:
            return Rect(-180.0, 180.0, -90.0, 90.0)
        xb, yb = _gh_bits(level)
        ix, iy = self.token_index(token)
        w, h = 360.0 / (1 << xb), 180.0 / (1 << yb)
        min_x = -180.0 + ix * w
        min_y = -90.0 + iy * h
        return Rect(min_x, min_x + w, min_y, min_y + h)

    @staticmethod
    def subcell_tokens(token: str) -> list[str]:
        return [token + c for c in GEOHASH_BASE32]

    def cover(self, shape, detail_level: int) -> list[tuple[str, bool]]:
        return _tree_cover(self, shape, detail_level)


class QuadPrefixTree:
    """Prefix/Tree/QuadPrefixTree.cs: Z-order 'A'..'D' quadrants.

    A=NW B=NE C=SW D=SE per level; boundary points go north/west (the
    reference checks quadrants in A,B,C,D order with inclusive rects)."""

    MAX_LEVELS_POSSIBLE = 50
    DEFAULT_MAX_LEVELS = 12
    CHARS = "ABCD"

    def __init__(self, max_levels: int = DEFAULT_MAX_LEVELS,
                 bounds: Rect = Rect(-180.0, 180.0, -90.0, 90.0)):
        if max_levels <= 0:
            raise ValueError("maxLevels must be > 0")
        self.max_levels = max_levels
        self.bounds = bounds
        # levelW[i] is the half-split width AT level i+1 (QuadPrefixTree.cs)
        self.level_w = [(bounds.max_x - bounds.min_x) / 2.0]
        self.level_h = [(bounds.max_y - bounds.min_y) / 2.0]
        for _ in range(1, max_levels):
            self.level_w.append(self.level_w[-1] / 2.0)
            self.level_h.append(self.level_h[-1] / 2.0)

    def get_level_for_distance(self, dist: float) -> int:
        if dist == 0:
            return self.max_levels
        for i in range(self.max_levels - 1):
            if dist > self.level_w[i] and dist > self.level_h[i]:
                return i + 1
        return self.max_levels

    def cell_index(self, lon, lat, level: int):
        n = 1 << level
        b = self.bounds
        gw, gh = b.max_x - b.min_x, b.max_y - b.min_y
        # x ties -> west (lower cell); y ties -> north (upper cell)
        ix = np.ceil((np.asarray(lon, dtype=np.float64) - b.min_x) / gw * n) - 1.0
        iy = np.floor((np.asarray(lat, dtype=np.float64) - b.min_y) / gh * n)
        ix = np.clip(ix, 0, n - 1).astype(np.int64)
        iy = np.clip(iy, 0, n - 1).astype(np.int64)
        return ix, iy

    def _tokens_from_index(self, ix: np.ndarray, iy: np.ndarray, level: int) -> list[str]:
        out = []
        for a, byy in zip(ix, iy):
            chars = []
            for j in range(level - 1, -1, -1):
                xbit = (int(a) >> j) & 1
                ytop = (int(byy) >> j) & 1
                chars.append(self.CHARS[xbit + 2 * (1 - ytop)])
            out.append("".join(chars))
        return out

    def point_token(self, x: float, y: float, level: int) -> str:
        ix, iy = self.cell_index(np.array([x]), np.array([y]), level)
        return self._tokens_from_index(ix, iy, level)[0]

    def point_tokens_np(self, lons: np.ndarray, lats: np.ndarray) -> list[list[str]]:
        lvl = self.max_levels
        ix, iy = self.cell_index(lons, lats, lvl)
        full = self._tokens_from_index(ix, iy, lvl)
        return [[s[:i] for i in range(1, lvl + 1)] for s in full]

    def token_index(self, token: str) -> tuple[int, int]:
        ix = iy = 0
        for ch in token:
            q = self.CHARS.index(ch)
            ix = (ix << 1) | (q & 1)
            iy = (iy << 1) | (1 - (q >> 1))
        return ix, iy

    def token_bounds(self, token: str) -> Rect:
        level = len(token)
        b = self.bounds
        if level == 0:
            return b
        n = 1 << level
        ix, iy = self.token_index(token)
        w = (b.max_x - b.min_x) / n
        h = (b.max_y - b.min_y) / n
        min_x = b.min_x + ix * w
        min_y = b.min_y + iy * h
        return Rect(min_x, min_x + w, min_y, min_y + h)

    def subcell_tokens(self, token: str) -> list[str]:
        return [token + c for c in self.CHARS]

    def cover(self, shape, detail_level: int) -> list[tuple[str, bool]]:
        return _tree_cover(self, shape, detail_level)


def _tree_cover(tree, shape, detail_level: int) -> list[tuple[str, bool]]:
    """Leaf cells of SpatialPrefixTree.RecursiveGetCells(shape, detailLevel)
    — the cells an IntersectsPrefixTreeFilter collects docs for: cells
    WITHIN the query shape (descent stops — Visit() collects, AbstractVisiting
    PrefixTreeFilter), plus detail-level cells that intersect it. Returns
    (token, within) pairs; `within` distinguishes the two kinds for callers
    that care (e.g. Within filters)."""
    if detail_level > tree.max_levels:
        raise ValueError("detailLevel > maxLevels")
    if isinstance(shape, Point):
        return [(tree.point_token(shape.x, shape.y, detail_level), True)]
    out: list[tuple[str, bool]] = []

    def descend(token: str):
        for sub in tree.subcell_tokens(token):
            rel = shape_relate_rect(shape, tree.token_bounds(sub))
            if rel == DISJOINT:
                continue
            # query CONTAINS cell -> cell within query: a leaf
            if rel == CONTAINS:
                out.append((sub, True))
            elif len(sub) == detail_level:
                out.append((sub, False))
            else:
                descend(sub)

    descend("")
    return out
