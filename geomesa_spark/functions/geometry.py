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
    if kind == "MULTIPOLYGON":
        import re

        rings, offsets, pos = [], [0], 0
        for ring_txt in re.findall(r"\(([^()]+)\)", body):
            ring = parse_ring(ring_txt)
            rings.append(ring)
            pos += len(ring)
            offsets.append(pos)
        # represented as one multi-ring geometry: ray-crossing parity over
        # the union of rings is exact for disjoint member polygons
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


# ---------------------------------------------------------------------------
# exact pairwise relations (the st_intersects/touches/overlaps/... kernel)
#
# All arithmetic is +,-,* float64 (orientation signs and parity tests), no
# epsilon: predicates are exact for representable inputs, matching what an
# ANSI-SQL oracle computes with the same expressions.
# ---------------------------------------------------------------------------


def classify_points_in_polygon(lon, lat, coords, ring_offsets) -> np.ndarray:
    """Per point: 0 = outside, 1 = on boundary, 2 = strictly inside.

    Boundary = collinear with some edge and inside its bbox (exact).
    Interior = ray-crossing parity (boundary points excluded first, so the
    parity ambiguity at edges never applies)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x1, y1, x2, y2 = polygon_edges(np.asarray(coords, dtype=np.float64), np.asarray(ring_offsets))
    # on-boundary test: orient == 0 and within edge bbox
    o = (x2 - x1)[None, :] * (lat[:, None] - y1[None, :]) - (y2 - y1)[None, :] * (lon[:, None] - x1[None, :])
    inx = (lon[:, None] >= np.minimum(x1, x2)[None, :]) & (lon[:, None] <= np.maximum(x1, x2)[None, :])
    iny = (lat[:, None] >= np.minimum(y1, y2)[None, :]) & (lat[:, None] <= np.maximum(y1, y2)[None, :])
    on_edge = (o == 0.0) & inx & iny
    boundary = on_edge.any(axis=1)
    out = np.zeros(len(lon), dtype=np.int8)
    out[boundary] = 1
    interior_mask = ~boundary
    if interior_mask.any():
        inside = points_in_polygon(lon[interior_mask], lat[interior_mask], coords, ring_offsets)
        idx = np.nonzero(interior_mask)[0]
        out[idx[inside]] = 2
    return out


def points_on_segments(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Per point: True if it lies on any of the segments (inclusive)."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = (np.asarray(a, dtype=np.float64)[None, :] for a in (x1, y1, x2, y2))
    o = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    inx = (px >= np.minimum(x1, x2)) & (px <= np.maximum(x1, x2))
    iny = (py >= np.minimum(y1, y2)) & (py <= np.maximum(y1, y2))
    return ((o == 0.0) & inx & iny).any(axis=1)


def segment_sets_relate(a_edges, b_edges) -> tuple[bool, bool, bool]:
    """(any_proper_cross, any_touch, any_collinear_overlap) between two
    edge sets (each a 4-tuple of arrays). Vectorized n_a x n_b.

    proper cross     — interiors cross transversally (strict sign test)
    touch            — contact that includes an endpoint / collinear point
    collinear overlap— collinear segments sharing a positive-length piece
    """
    ax1, ay1, ax2, ay2 = (np.asarray(v, dtype=np.float64)[:, None] for v in a_edges)
    bx1, by1, bx2, by2 = (np.asarray(v, dtype=np.float64)[None, :] for v in b_edges)
    d1 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)  # a1 vs b
    d2 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)  # a2 vs b
    d3 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)  # b1 vs a
    d4 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)  # b2 vs a
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def on_seg(px, py, sx1, sy1, sx2, sy2):
        return (
            (px >= np.minimum(sx1, sx2)) & (px <= np.maximum(sx1, sx2))
            & (py >= np.minimum(sy1, sy2)) & (py <= np.maximum(sy1, sy2))
        )

    t1 = (d1 == 0) & on_seg(ax1, ay1, bx1, by1, bx2, by2)
    t2 = (d2 == 0) & on_seg(ax2, ay2, bx1, by1, bx2, by2)
    t3 = (d3 == 0) & on_seg(bx1, by1, ax1, ay1, ax2, ay2)
    t4 = (d4 == 0) & on_seg(bx2, by2, ax1, ay1, ax2, ay2)
    touch = t1 | t2 | t3 | t4

    collinear = (d1 == 0) & (d2 == 0) & (d3 == 0) & (d4 == 0)
    if collinear.any():
        # project onto the dominant axis; overlap length > 0 ⇒ 1-dim overlap
        usex = np.abs(ax2 - ax1) >= np.abs(ay2 - ay1)
        alo = np.where(usex, np.minimum(ax1, ax2), np.minimum(ay1, ay2))
        ahi = np.where(usex, np.maximum(ax1, ax2), np.maximum(ay1, ay2))
        blo = np.where(usex, np.minimum(bx1, bx2), np.minimum(by1, by2))
        bhi = np.where(usex, np.maximum(bx1, bx2), np.maximum(by1, by2))
        overlap = collinear & (np.minimum(ahi, bhi) > np.maximum(alo, blo))
    else:
        overlap = np.zeros_like(collinear)
    return bool(proper.any()), bool(touch.any()), bool(overlap.any())


def _edge_midpoints(coords, ring_offsets):
    x1, y1, x2, y2 = polygon_edges(np.asarray(coords, dtype=np.float64), np.asarray(ring_offsets))
    return (x1 + x2) / 2.0, (y1 + y2) / 2.0


def _normalize_ring(ring: np.ndarray) -> tuple:
    """Canonical form of a closed ring: drop the duplicate endpoint,
    orient CCW (shoelace), rotate to start at the lexicographic min."""
    r = ring[:-1]
    area2 = float(np.sum(r[:, 0] * np.roll(r[:, 1], -1) - np.roll(r[:, 0], -1) * r[:, 1]))
    if area2 < 0:
        r = r[::-1]
    start = np.lexsort((r[:, 1], r[:, 0]))[0]
    r = np.roll(r, -start, axis=0)
    return tuple(map(tuple, r))


def geoms_equal(ka, ca, oa, kb, cb, ob) -> bool:
    """Geometric equality: same kind family; rings equal as canonical
    point cycles (POLYGON), same vertex sequence up to reversal
    (LINESTRING), same point (POINT)."""
    if ka == "POINT" or kb == "POINT":
        return ka == kb and len(ca) == len(cb) and bool((ca == cb).all())
    if ka == "LINESTRING" or kb == "LINESTRING":
        if ka != kb or len(ca) != len(cb):
            return False
        return bool((ca == cb).all() or (ca == cb[::-1]).all())
    ra = sorted(_normalize_ring(ca[oa[i]:oa[i + 1]]) for i in range(len(oa) - 1))
    rb = sorted(_normalize_ring(cb[ob[i]:ob[i + 1]]) for i in range(len(ob) - 1))
    return ra == rb


class Relate:
    """Pairwise topological classification (the st_* predicate backend).

    Fields:
      ii   — interiors intersect
      bb   — boundaries intersect (any contact on both boundaries)
      bb_dim1 — boundaries share a positive-length (collinear) piece
      a_covers_b / b_covers_a — closure containment
      equal — geometric equality
      proper_cross — transversal edge crossing exists
      any_contact — closures intersect at all
      dim_a / dim_b — topological dimension (0/1/2)
    """

    __slots__ = ("ii", "bb", "bb_dim1", "a_covers_b", "b_covers_a", "equal",
                 "proper_cross", "any_contact", "dim_a", "dim_b",
                 "a_sample_in_b", "b_sample_in_a")

    def __init__(self, **kw):
        for s in self.__slots__:
            setattr(self, s, kw.get(s, False))


_DIM = {"POINT": 0, "LINESTRING": 1, "POLYGON": 2, "MULTIPOLYGON": 2}


def _hole_probes(coords, ring_offsets):
    """One interior probe point per hole ring (the ring's centroid when it
    actually lies inside that ring; otherwise skipped — conservative)."""
    probes = []
    for ridx in range(1, len(ring_offsets) - 1):
        ring = coords[ring_offsets[ridx]:ring_offsets[ridx + 1]]
        cx, cy = polygon_centroid(ring, np.asarray([0, len(ring)]))
        if bool(points_in_polygon([cx], [cy], ring, np.asarray([0, len(ring)]))[0]):
            probes.append((cx, cy))
    return probes


def relate_geoms(ka, ca, oa, kb, cb, ob) -> Relate:
    """Exact relate for POINT / LINESTRING / POLYGON(/MULTIPOLYGON as
    multi-ring parity) pairs. Containment uses: no transversal crossing
    + every vertex AND edge-midpoint of the contained geometry inside or
    on the boundary of the container (exact when crossings are detected,
    which the edge tests guarantee for non-degenerate inputs)."""
    r = Relate(dim_a=_DIM[ka], dim_b=_DIM[kb], equal=geoms_equal(ka, ca, oa, kb, cb, ob))

    def poly_like(k):
        return k in ("POLYGON", "MULTIPOLYGON")

    if ka == "POINT" and kb == "POINT":
        same = bool((ca[0] == cb[0]).all())
        r.ii = same
        r.any_contact = same
        r.a_covers_b = r.b_covers_a = same
        return r

    if ka == "POINT" or kb == "POINT":
        # orient as (point, other)
        flip = kb == "POINT"
        pk, pc = (kb, cb) if flip else (ka, ca)
        ok, oc, oo = (ka, ca, oa) if flip else (kb, cb, ob)
        px, py = pc[0, 0], pc[0, 1]
        if poly_like(ok):
            cls = int(classify_points_in_polygon([px], [py], oc, oo)[0])
            contact = cls > 0
            r.ii = cls == 2
            r.bb = False  # point has empty boundary... (its boundary is ∅; JTS treats point's boundary empty)
            covers = contact
        else:  # LINESTRING
            x1, y1, x2, y2 = polygon_edges(oc, oo)
            on = bool(points_on_segments([px], [py], x1, y1, x2, y2)[0])
            endpoints = (oc[0], oc[-1])
            at_end = on and any((px == e[0] and py == e[1]) for e in endpoints)
            r.ii = on and not at_end
            r.bb = False
            r.any_contact = on
            covers = on
            contact = on
        r.any_contact = contact
        if flip:  # a is the container, b the point
            r.a_covers_b, r.b_covers_a = covers, r.equal
        else:
            r.b_covers_a, r.a_covers_b = covers, r.equal
        # touches semantics for point-vs-other = contact without interior hit
        return r

    # both are 1/2-dimensional: edge machinery
    ea = polygon_edges(ca, oa)
    eb = polygon_edges(cb, ob)
    proper, touch, col_overlap = segment_sets_relate(ea, eb)
    r.proper_cross = proper
    r.bb_dim1 = col_overlap

    # sample points of each geometry: vertices + edge midpoints
    mx_a, my_a = _edge_midpoints(ca, oa)
    mbx, mby = _edge_midpoints(cb, ob)
    sax = np.concatenate([ca[:, 0], mx_a]); say = np.concatenate([ca[:, 1], my_a])
    sbx = np.concatenate([cb[:, 0], mbx]); sby = np.concatenate([cb[:, 1], mby])

    if poly_like(ka) and poly_like(kb):
        cls_b_in_a = classify_points_in_polygon(sbx, sby, ca, oa)
        cls_a_in_b = classify_points_in_polygon(sax, say, cb, ob)
        a_sample_in = (cls_a_in_b == 2).any()
        b_sample_in = (cls_b_in_a == 2).any()
        # proper crossings are boundary∩boundary points too
        boundary_contact = proper or touch or (cls_a_in_b == 1).any() or (cls_b_in_a == 1).any()
        r.ii = bool(proper or a_sample_in or b_sample_in or r.equal)
        r.a_sample_in_b = bool(a_sample_in)
        r.b_sample_in_a = bool(b_sample_in)
        r.bb = bool(boundary_contact or r.equal)
        # `or r.equal`: identical geometries trivially cover each other —
        # decided from canonical coordinates, immune to the midpoint
        # rounding that can misclassify boundary samples on thin shapes
        r.a_covers_b = bool((not proper and (cls_b_in_a > 0).all()) or r.equal)
        r.b_covers_a = bool((not proper and (cls_a_in_b > 0).all()) or r.equal)
        # hole correction: boundary samples can't witness "the other
        # polygon fills my hole" — probe each hole's interior point: if it
        # lies strictly inside the contained candidate, that candidate has
        # interior outside the cover's closure and is NOT covered.
        if r.a_covers_b and not r.equal:
            for px, py in _hole_probes(ca, oa):
                if (
                    classify_points_in_polygon([px], [py], ca, oa)[0] == 0
                    and classify_points_in_polygon([px], [py], cb, ob)[0] == 2
                ):
                    r.a_covers_b = False
                    break
        if r.b_covers_a and not r.equal:
            for px, py in _hole_probes(cb, ob):
                if (
                    classify_points_in_polygon([px], [py], cb, ob)[0] == 0
                    and classify_points_in_polygon([px], [py], ca, oa)[0] == 2
                ):
                    r.b_covers_a = False
                    break
        r.any_contact = bool(r.ii or r.bb)
        return r

    if ka == "LINESTRING" and kb == "LINESTRING":
        r.ii = bool(proper or col_overlap)
        # endpoint-only contact
        ea_ends = np.array([ca[0], ca[-1]]); eb_ends = np.array([cb[0], cb[-1]])
        end_touch = bool(
            points_on_segments(ea_ends[:, 0], ea_ends[:, 1], *eb).any()
            or points_on_segments(eb_ends[:, 0], eb_ends[:, 1], *ea).any()
        )
        # interior-vs-interior contact at a point that isn't an endpoint of both:
        # approximate via touch minus endpoint-only — JTS line/line 'touches'
        # means ONLY boundary points in the intersection.
        non_end_touch = False
        if touch and not proper and not col_overlap:
            # vertices of a on b that are not endpoints of a (interior of a)
            ia = ca[1:-1]
            ib = cb[1:-1]
            non_end_touch = bool(
                (len(ia) and points_on_segments(ia[:, 0], ia[:, 1], *eb).any())
                or (len(ib) and points_on_segments(ib[:, 0], ib[:, 1], *ea).any())
            )
            # an endpoint of a lying on b's interior touches a's boundary to
            # b's interior — still 'touches' in JTS; keep ii False.
        r.ii = bool(r.ii or non_end_touch or r.equal)
        r.bb = end_touch
        r.a_covers_b = bool(not proper and col_overlap and points_on_segments(sbx, sby, *ea).all()) or r.equal
        r.b_covers_a = bool(not proper and col_overlap and points_on_segments(sax, say, *eb).all()) or r.equal
        r.any_contact = bool(proper or touch or col_overlap or r.equal)
        return r

    # line × polygon (either order): orient as (line, polygon)
    flip = poly_like(ka)
    lc, lo, le = (cb, ob, eb) if flip else (ca, oa, ea)
    pc, po, pe = (ca, oa, ea) if flip else (cb, ob, eb)
    slx = np.concatenate([lc[:, 0], _edge_midpoints(lc, lo)[0]])
    sly = np.concatenate([lc[:, 1], _edge_midpoints(lc, lo)[1]])
    cls = classify_points_in_polygon(slx, sly, pc, po)
    any_in, any_out, any_bnd = (cls == 2).any(), (cls == 0).any(), (cls == 1).any()
    ii = bool(proper or any_in)           # line interior meets polygon interior
    covers = bool(not proper and (cls > 0).all())
    contact = bool(proper or touch or any_in or any_bnd)
    r.ii = ii
    r.bb = bool(touch or any_bnd)
    r.any_contact = contact
    if flip:  # a is polygon, b is line
        r.a_covers_b = covers
        r.b_covers_a = False
    else:
        r.b_covers_a = covers
        r.a_covers_b = False
    return r


# predicate layer (JTS semantics) --------------------------------------------


def pred_intersects(r: Relate) -> bool:
    return bool(r.any_contact)


def pred_disjoint(r: Relate) -> bool:
    return not r.any_contact


def pred_touches(r: Relate) -> bool:
    # contact, but interiors never meet (undefined/false for point-point)
    return bool(r.any_contact and not r.ii and not (r.dim_a == 0 and r.dim_b == 0))


def pred_contains(r: Relate) -> bool:
    return bool(r.a_covers_b and r.ii)


def pred_within(r: Relate) -> bool:
    return bool(r.b_covers_a and r.ii)


def pred_covers(r: Relate) -> bool:
    return bool(r.a_covers_b)


def pred_covered_by(r: Relate) -> bool:
    return bool(r.b_covers_a)


def pred_equals(r: Relate) -> bool:
    return bool(r.equal)


def pred_overlaps(r: Relate) -> bool:
    if r.dim_a != r.dim_b or not r.ii or r.a_covers_b or r.b_covers_a:
        return False
    if r.dim_a == 1:  # line/line overlap requires a shared 1-dim piece
        return bool(r.bb_dim1)
    return True


def pred_crosses(r: Relate) -> bool:
    if r.dim_a == r.dim_b == 1:  # line x line: point intersection of interiors
        return bool(r.proper_cross and not r.bb_dim1)
    if r.dim_a == r.dim_b:
        return False  # polygon x polygon / point x point never cross
    lo, hi = sorted((r.dim_a, r.dim_b))
    if lo == 0:  # point vs line/polygon: crosses is false (point can't exit)
        return False
    # line vs polygon: interior split — some interior in, some out
    return bool(r.ii and not r.a_covers_b and not r.b_covers_a)


def de9im(r: Relate) -> str:
    """DE-9IM matrix string. EXACT for polygon×polygon and point×point
    (derived from the relate classification; verified against the
    canonical JTS matrices in tests); best-effort dims for line combos."""
    if r.dim_a == 2 and r.dim_b == 2:
        ii = "2" if r.ii else "F"
        ib = "1" if (r.b_sample_in_a or (r.proper_cross and not r.a_covers_b)) else "F"
        ie = "F" if r.b_covers_a else "2"
        bi = "1" if (r.a_sample_in_b or (r.proper_cross and not r.b_covers_a)) else "F"
        bb = ("1" if r.bb_dim1 else "0") if r.bb else "F"
        be = "F" if r.b_covers_a else "1"
        ei = "F" if r.a_covers_b else "2"
        eb = "F" if r.a_covers_b else "1"
        return ii + ib + ie + bi + bb + be + ei + eb + "2"
    if r.dim_a == 0 and r.dim_b == 0:
        return "0FFFFFFF2" if r.ii else "FF0FFFFF2"
    # mixed / line combos: dims approximated from the classification
    def d(flag, dim):
        return str(dim) if flag else "F"

    ii = d(r.ii, min(r.dim_a, r.dim_b))
    ib = d(r.ii and not r.a_covers_b and r.dim_b > 0, max(r.dim_b - 1, 0))
    ie = "F" if r.b_covers_a else str(r.dim_a)
    bi = d(r.ii and not r.b_covers_a and r.dim_a > 0, max(r.dim_a - 1, 0))
    bb = d(r.bb, 1 if r.bb_dim1 else 0)
    be = "F" if r.b_covers_a else (str(max(r.dim_a - 1, 0)) if r.dim_a > 0 else "F")
    ei = "F" if r.a_covers_b else str(r.dim_b)
    eb = "F" if r.a_covers_b else (str(max(r.dim_b - 1, 0)) if r.dim_b > 0 else "F")
    return ii + ib + ie + bi + bb + be + ei + eb + "2"


# ---------------------------------------------------------------------------
# WKB (little-endian ISO WKB for POINT / LINESTRING / POLYGON /
# MULTIPOLYGON) and a generic WKT writer
# ---------------------------------------------------------------------------

import struct

_WKB_KIND = {"POINT": 1, "LINESTRING": 2, "POLYGON": 3, "MULTIPOLYGON": 6}
_WKB_NAME = {v: k for k, v in _WKB_KIND.items()}


def wkt_linestring(coords: np.ndarray) -> str:
    pts = ", ".join(f"{x:.10g} {y:.10g}" for x, y in coords)
    return f"LINESTRING ({pts})"


def wkt_any(kind: str, coords: np.ndarray, ring_offsets: np.ndarray) -> str:
    if kind == "POINT":
        return wkt_point(float(coords[0, 0]), float(coords[0, 1]))
    if kind == "LINESTRING":
        return wkt_linestring(coords)
    if kind == "POLYGON":
        return wkt_polygon(coords, ring_offsets)
    # MULTIPOLYGON: reconstruct shell/hole grouping by containment depth
    def ring_txt(r):
        ring = coords[ring_offsets[r]:ring_offsets[r + 1]]
        return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in ring) + ")"

    members = []
    for shell, holes in multipolygon_parts(coords, ring_offsets):
        members.append("(" + ", ".join(ring_txt(r) for r in [shell] + holes) + ")")
    return f"MULTIPOLYGON ({', '.join(members)})"


def wkb_write(kind: str, coords: np.ndarray, ring_offsets: np.ndarray) -> bytes:
    """Standard little-endian WKB bytes."""
    c = np.asarray(coords, dtype="<f8")

    def ring_bytes(ring):
        return struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()

    if kind == "POINT":
        return b"\x01" + struct.pack("<I", 1) + c[0].tobytes()
    if kind == "LINESTRING":
        return b"\x01" + struct.pack("<I", 2) + ring_bytes(c)
    if kind == "POLYGON":
        out = b"\x01" + struct.pack("<II", 3, len(ring_offsets) - 1)
        for r in range(len(ring_offsets) - 1):
            out += ring_bytes(c[ring_offsets[r]:ring_offsets[r + 1]])
        return out
    if kind == "MULTIPOLYGON":
        parts = multipolygon_parts(coords, ring_offsets)
        out = b"\x01" + struct.pack("<II", 6, len(parts))
        for shell, holes in parts:
            out += b"\x01" + struct.pack("<II", 3, 1 + len(holes))
            for r in [shell] + holes:
                out += ring_bytes(c[ring_offsets[r]:ring_offsets[r + 1]])
        return out
    raise ValueError(f"unsupported WKB kind: {kind}")


def wkb_read(buf: bytes):
    """WKB bytes → (kind, coords, ring_offsets). Accepts both byte orders."""
    def u32(b, off, little):
        return struct.unpack_from("<I" if little else ">I", b, off)[0]

    def coords_at(b, off, n, little):
        arr = np.frombuffer(b, dtype="<f8" if little else ">f8", count=2 * n, offset=off)
        return arr.reshape(n, 2).astype(np.float64), off + 16 * n

    def parse_one(off):
        little = buf[off] == 1
        kind_code = u32(buf, off + 1, little) & 0xFF
        off += 5
        kind = _WKB_NAME[kind_code]
        if kind == "POINT":
            c, off = coords_at(buf, off, 1, little)
            return kind, c, np.asarray([0, 1]), off
        if kind == "LINESTRING":
            n = u32(buf, off, little)
            c, off = coords_at(buf, off + 4, n, little)
            return kind, c, np.asarray([0, n]), off
        if kind == "POLYGON":
            nrings = u32(buf, off, little)
            off += 4
            rings, offsets, pos = [], [0], 0
            for _ in range(nrings):
                n = u32(buf, off, little)
                c, off = coords_at(buf, off + 4, n, little)
                rings.append(c)
                pos += n
                offsets.append(pos)
            return kind, np.concatenate(rings), np.asarray(offsets), off
        if kind == "MULTIPOLYGON":
            npolys = u32(buf, off, little)
            off += 4
            rings, offsets, pos = [], [0], 0
            for _ in range(npolys):
                k2, c2, o2, off = parse_one(off)
                for r in range(len(o2) - 1):
                    ring = c2[o2[r]:o2[r + 1]]
                    rings.append(ring)
                    pos += len(ring)
                    offsets.append(pos)
            return kind, np.concatenate(rings), np.asarray(offsets), off
        raise ValueError(f"unsupported WKB kind code: {kind_code}")

    kind, c, o, _ = parse_one(0)
    return kind, c, o


# ---------------------------------------------------------------------------
# min distance / closest point (vertex↔edge candidates; exact for
# polyline/polygon pairs since the minimum occurs at a vertex-edge pair)
# ---------------------------------------------------------------------------


def _point_to_segments(px, py, x1, y1, x2, y2):
    """Per (point, segment): squared distance and the closest point."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = (np.asarray(v, dtype=np.float64)[None, :] for v in (x1, y1, x2, y2))
    dx, dy = x2 - x1, y2 - y1
    L2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(L2 > 0, ((px - x1) * dx + (py - y1) * dy) / np.where(L2 == 0, 1.0, L2), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return d2, cx, cy


def min_distance_and_closest(ka, ca, oa, kb, cb, ob):
    """(min planar-degree distance, closest point ON GEOMETRY A).
    Distance is 0 (closest point = a point of contact/other geometry's
    witness) when the geometries intersect."""
    r = relate_geoms(ka, ca, oa, kb, cb, ob)
    if r.any_contact:
        if ka == "POINT":
            return 0.0, (float(ca[0, 0]), float(ca[0, 1]))
        if kb == "POINT":
            return 0.0, (float(cb[0, 0]), float(cb[0, 1]))
        # a contact witness: any B vertex covered by A, else an A vertex on B
        for x, y in cb:
            if ka in ("POLYGON", "MULTIPOLYGON"):
                if classify_points_in_polygon([x], [y], ca, oa)[0] > 0:
                    return 0.0, (float(x), float(y))
            else:
                if points_on_segments([x], [y], *polygon_edges(ca, oa))[0]:
                    return 0.0, (float(x), float(y))
        return 0.0, (float(ca[0, 0]), float(ca[0, 1]))
    best_d2 = np.inf
    best_pt = (float(ca[0, 0]), float(ca[0, 1]))
    if ka != "POINT":
        ea = polygon_edges(ca, oa)
        d2, cx, cy = _point_to_segments(cb[:, 0], cb[:, 1], *ea)
        i, j = np.unravel_index(np.argmin(d2), d2.shape)
        if d2[i, j] < best_d2:
            best_d2, best_pt = float(d2[i, j]), (float(cx[i, j]), float(cy[i, j]))
    if kb != "POINT":
        eb = polygon_edges(cb, ob)
        d2, _cx, _cy = _point_to_segments(ca[:, 0], ca[:, 1], *eb)
        i, j = np.unravel_index(np.argmin(d2), d2.shape)
        if d2[i, j] < best_d2:
            best_d2, best_pt = float(d2[i, j]), (float(ca[i, 0]), float(ca[i, 1]))
    if ka == "POINT" and kb == "POINT":
        best_d2 = float(planar_dist2(ca[0, 0], ca[0, 1], cb[0, 0], cb[0, 1]))
        best_pt = (float(ca[0, 0]), float(ca[0, 1]))
    return float(np.sqrt(best_d2)), best_pt


def wkt_polygon_exact(coords: np.ndarray, ring_offsets: np.ndarray) -> str:
    """Full-precision polygon WKT (repr round-trips float64 exactly —
    required when a stored WKT column must reproduce the original
    coordinates bit-for-bit, e.g. the stored-polygon-table join whose
    oracle is generated from the source coordinate arrays)."""
    rings = []
    for r in range(len(ring_offsets) - 1):
        s, e = ring_offsets[r], ring_offsets[r + 1]
        pts = ", ".join(f"{x!r} {y!r}" for x, y in coords[s:e])
        rings.append(f"({pts})")
    return f"POLYGON ({', '.join(rings)})"


def multipolygon_parts(coords: np.ndarray, ring_offsets: np.ndarray) -> list[tuple[int, list[int]]]:
    """Group a flat ring list into member polygons [(shell_ring_idx,
    [hole_ring_idx, ...])] by containment depth: a ring at even nesting
    depth is a shell; an odd-depth ring is a hole of its deepest
    container. Reconstructs OGC structure for serialization (the internal
    parity representation is grouping-agnostic)."""
    nrings = len(ring_offsets) - 1
    rings = [coords[ring_offsets[r]:ring_offsets[r + 1]] for r in range(nrings)]
    containers: list[list[int]] = [[] for _ in range(nrings)]
    for i in range(nrings):
        # majority vote over the ring's vertices (strict-in vs strict-out;
        # boundary votes abstain) — robust when a hole touches its shell
        # at some vertex, where single-point parity is arbitrary
        px, py = rings[i][:-1, 0], rings[i][:-1, 1]
        for j in range(nrings):
            if i == j:
                continue
            off_j = np.asarray([0, len(rings[j])])
            cls = classify_points_in_polygon(px, py, rings[j], off_j)
            if (cls == 2).sum() > (cls == 0).sum():
                containers[i].append(j)
    depth = [len(c) for c in containers]
    parts: list[tuple[int, list[int]]] = []
    shell_part = {}
    for i in range(nrings):
        if depth[i] % 2 == 0:
            shell_part[i] = len(parts)
            parts.append((i, []))
    for i in range(nrings):
        if depth[i] % 2 == 1:
            # deepest container at even depth = the owning shell
            shell = max(
                (j for j in containers[i] if depth[j] % 2 == 0),
                key=lambda j: depth[j],
                default=None,
            )
            if shell is not None:
                parts[shell_part[shell]][1].append(i)
    return parts
