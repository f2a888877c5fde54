"""Vectorized numpy geometry — the engine's replacement for JTS.

Covers the math behind GeoMesa's ``st_*`` SQL surface
(``geomesa-spark-sql/.../SQLSpatialRelationFunctions.scala`` et al.,
SURVEY.md §2.3): point-in-polygon, haversine / spheroid distance,
WKT parse/write, envelopes, centroids, convex hull, antimeridian
handling. shapely/JTS are unavailable here (SURVEY.md §0), so all of it
is from-scratch numpy, designed to be called from Arrow-batched pandas
UDFs on (points x candidate-polygon) batches — never per-row Python.

Point-in-polygon uses the classic ray-crossing parity test with EXACTLY
the edge condition used by the DuckDB SQL oracle (FIXTURES.md §5):

    crosses(edge, p) = ((y1 > p.lat) != (y2 > p.lat))
                       and p.lon < (x2-x1)*(p.lat-y1)/(y2-y1) + x1

so engine and oracle agree bit-for-bit on boundary cases.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # mean Earth radius (IUGG)


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def planar_dist2(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Squared equirectangular-degree distance — exact float64 arithmetic,
    bit-identical when recomputed in SQL (used for oracle-checked kNN)."""
    dx = np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64)
    dy = np.asarray(lat2, dtype=np.float64) - np.asarray(lat1, dtype=np.float64)
    return dx * dx + dy * dy


# ---------------------------------------------------------------------------
# polygon representation
#
# A polygon is (coords, ring_offsets):
#   coords:       float64 (n, 2) array of (lon, lat), rings closed
#                 (first point == last point)
#   ring_offsets: int array of ring start indices, ending with n
# Ring 0 is the exterior; further rings are holes (parity handles both).
# ---------------------------------------------------------------------------


def polygon_edges(coords: np.ndarray, ring_offsets: np.ndarray):
    """(x1, y1, x2, y2) arrays over all ring edges (closing edges included
    because rings are stored closed; the duplicate last point emits a
    degenerate self-edge which never crosses, so it is harmless)."""
    x1s, y1s, x2s, y2s = [], [], [], []
    for r in range(len(ring_offsets) - 1):
        s, e = ring_offsets[r], ring_offsets[r + 1]
        ring = coords[s:e]
        x1s.append(ring[:-1, 0])
        y1s.append(ring[:-1, 1])
        x2s.append(ring[1:, 0])
        y2s.append(ring[1:, 1])
    return (
        np.concatenate(x1s),
        np.concatenate(y1s),
        np.concatenate(x2s),
        np.concatenate(y2s),
    )


def points_in_polygon(lon, lat, coords: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """Ray-crossing parity PIP for many points vs one polygon.

    Vectorized (n_points x n_edges); holes handled by parity. Uses the
    oracle-identical edge condition (module docstring).
    """
    lon = np.asarray(lon, dtype=np.float64)[:, None]
    lat = np.asarray(lat, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = polygon_edges(np.asarray(coords, dtype=np.float64), np.asarray(ring_offsets))
    straddle = (y1[None, :] > lat) != (y2[None, :] > lat)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (lat - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
    crossing = straddle & (lon < xint)
    return (crossing.sum(axis=1) % 2).astype(bool)


def polygon_bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    c = np.asarray(coords, dtype=np.float64)
    return float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())


def polygon_area_deg2(coords: np.ndarray, ring_offsets: np.ndarray) -> float:
    """Signed shoelace area in degree^2 (exterior CCW positive, holes negative)."""
    total = 0.0
    for r in range(len(ring_offsets) - 1):
        s, e = ring_offsets[r], ring_offsets[r + 1]
        x, y = coords[s:e, 0], coords[s:e, 1]
        total += 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    return total


def polygon_centroid(coords: np.ndarray, ring_offsets: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid (shoelace), holes subtract via signed area."""
    a_total, cx, cy = 0.0, 0.0, 0.0
    for r in range(len(ring_offsets) - 1):
        s, e = ring_offsets[r], ring_offsets[r + 1]
        x, y = coords[s:e, 0], coords[s:e, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        a = 0.5 * float(np.sum(cross))
        if a == 0.0:
            continue
        cx += float(np.sum((x[:-1] + x[1:]) * cross)) / 6.0
        cy += float(np.sum((y[:-1] + y[1:]) * cross)) / 6.0
        a_total += a
    if a_total == 0.0:
        return float(coords[:, 0].mean()), float(coords[:, 1].mean())
    return cx / a_total, cy / a_total


# ---------------------------------------------------------------------------
# segment / box intersection (used by cover_polygon exactness)
# ---------------------------------------------------------------------------


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect_box(x1, y1, x2, y2, bx0, by0, bx1, by1) -> np.ndarray:
    """True per segment if it intersects the axis-aligned box (vectorized,
    conservative-exact via slab clipping / Liang-Barsky)."""
    x1, y1, x2, y2 = (np.asarray(a, dtype=np.float64) for a in (x1, y1, x2, y2))
    dx = x2 - x1
    dy = y2 - y1
    t0 = np.zeros_like(x1)
    t1 = np.ones_like(x1)
    ok = np.ones(x1.shape, dtype=bool)
    for p, q in (
        (-dx, x1 - bx0),
        (dx, bx1 - x1),
        (-dy, y1 - by0),
        (dy, by1 - y1),
    ):
        parallel = p == 0
        ok &= ~(parallel & (q < 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(parallel, 0.0, q / np.where(p == 0, 1.0, p))
        t0 = np.where(~parallel & (p < 0), np.maximum(t0, r), t0)
        t1 = np.where(~parallel & (p > 0), np.minimum(t1, r), t1)
    return ok & (t0 <= t1)


def box_intersects_polygon(bx0, by0, bx1, by1, coords, ring_offsets) -> bool:
    """Exact box-vs-polygon intersection test: any vertex in box, any box
    corner in polygon, or any edge crossing the box."""
    c = np.asarray(coords, dtype=np.float64)
    inside_box = (c[:, 0] >= bx0) & (c[:, 0] <= bx1) & (c[:, 1] >= by0) & (c[:, 1] <= by1)
    if inside_box.any():
        return True
    corners_lon = np.array([bx0, bx1, bx1, bx0])
    corners_lat = np.array([by0, by0, by1, by1])
    if points_in_polygon(corners_lon, corners_lat, c, ring_offsets).any():
        return True
    x1, y1, x2, y2 = polygon_edges(c, np.asarray(ring_offsets))
    return bool(segments_intersect_box(x1, y1, x2, y2, bx0, by0, bx1, by1).any())


def split_antimeridian(min_lon, min_lat, max_lon, max_lat):
    """A bbox given with min_lon > max_lon crosses the antimeridian; split
    into one or two standard boxes (GeoMesa's st_idlSafeGeom analog)."""
    if min_lon <= max_lon:
        return [(min_lon, min_lat, max_lon, max_lat)]
    return [(min_lon, min_lat, 180.0, max_lat), (-180.0, min_lat, max_lon, max_lat)]


# ---------------------------------------------------------------------------
# convex hull (Andrew's monotone chain) & point buffer
# ---------------------------------------------------------------------------


def convex_hull(lon, lat) -> np.ndarray:
    """(k, 2) closed CCW hull ring of the input points."""
    pts = np.stack([np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)], axis=1)
    pts = np.unique(pts, axis=0)  # sorts lexicographically
    if len(pts) <= 2:
        return np.vstack([pts, pts[:1]])
    def half(points):
        chain = []
        for p in points:
            while len(chain) >= 2 and _orient(*chain[-2], *chain[-1], *p) <= 0:
                chain.pop()
            chain.append(tuple(p))
        return chain
    lower = half(pts)
    upper = half(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    ring.append(ring[0])
    return np.asarray(ring)


def buffer_point(lon: float, lat: float, radius_m: float, segments: int = 32) -> np.ndarray:
    """Closed ring approximating a geodesic circle (st_bufferPoint analog).
    Small-circle approximation: radius in degrees scaled by cos(lat) in lon."""
    ang = np.linspace(0.0, 2.0 * np.pi, segments + 1)
    dlat = np.degrees(radius_m / EARTH_RADIUS_M)
    coslat = max(np.cos(np.radians(lat)), 1e-9)
    dlon = dlat / coslat
    return np.stack([lon + dlon * np.cos(ang), lat + dlat * np.sin(ang)], axis=1)


# ---------------------------------------------------------------------------
# WKT (numpy-backed parser/writer for POINT / LINESTRING / POLYGON /
# MULTIPOLYGON — the subset the reference's constructors surface needs)
# ---------------------------------------------------------------------------


def wkt_point(lon: float, lat: float) -> str:
    return f"POINT ({lon:.10g} {lat:.10g})"


def wkt_polygon(coords: np.ndarray, ring_offsets: np.ndarray) -> str:
    rings = []
    for r in range(len(ring_offsets) - 1):
        s, e = ring_offsets[r], ring_offsets[r + 1]
        pts = ", ".join(f"{x:.10g} {y:.10g}" for x, y in coords[s:e])
        rings.append(f"({pts})")
    return f"POLYGON ({', '.join(rings)})"


def parse_wkt(wkt: str):
    """Parse POINT/LINESTRING/POLYGON WKT → (kind, coords, ring_offsets)."""
    s = wkt.strip()
    kind = s.split("(", 1)[0].strip().upper()
    body = s[s.index("(") :]

    def parse_ring(txt: str) -> np.ndarray:
        pts = [p.strip().split() for p in txt.split(",")]
        return np.asarray([[float(a), float(b)] for a, b, *_ in pts], dtype=np.float64)

    if kind == "POINT":
        c = parse_ring(body.strip("() "))
        return kind, c, np.asarray([0, len(c)])
    if kind == "LINESTRING":
        c = parse_ring(body.strip("() "))
        return kind, c, np.asarray([0, len(c)])
    if kind == "POLYGON":
        inner = body.strip()[1:-1]
        rings, offsets, pos = [], [0], 0
        depth = 0
        start = None
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i + 1
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    ring = parse_ring(inner[start:i])
                    rings.append(ring)
                    pos += len(ring)
                    offsets.append(pos)
        return kind, np.concatenate(rings), np.asarray(offsets)
    raise ValueError(f"unsupported WKT kind: {kind}")


def make_bbox_ring(min_lon, min_lat, max_lon, max_lat) -> np.ndarray:
    """Closed CCW bbox ring (st_makeBBOX analog)."""
    return np.asarray(
        [
            [min_lon, min_lat],
            [max_lon, min_lat],
            [max_lon, max_lat],
            [min_lon, max_lat],
            [min_lon, min_lat],
        ],
        dtype=np.float64,
    )
