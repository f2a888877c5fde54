"""Property-based consistency tests for the exact relation kernel
(geometry.relate_geoms + pred_*): the algebra every DE-9IM engine must
satisfy, checked over randomized simple geometries (convex hulls, boxes,
polylines, points). Pure numpy — no Spark session."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from geomesa_spark.functions import geometry as geo

coord = st.integers(min_value=-300, max_value=300).map(lambda v: v / 10.0)


@st.composite
def convex_polygon(draw):
    n = draw(st.integers(min_value=4, max_value=9))
    xs = np.array([draw(coord) for _ in range(n)])
    ys = np.array([draw(coord) for _ in range(n)])
    ring = geo.convex_hull(xs, ys)
    if len(ring) < 4:  # degenerate (collinear) sample — widen it
        ring = geo.make_bbox_ring(xs.min(), ys.min(), xs.min() + 1.0, ys.min() + 1.0)
    return "POLYGON", ring, np.asarray([0, len(ring)])


@st.composite
def box_polygon(draw):
    x0, y0 = draw(coord), draw(coord)
    w = abs(draw(coord)) + 0.1
    h = abs(draw(coord)) + 0.1
    ring = geo.make_bbox_ring(x0, y0, x0 + w, y0 + h)
    return "POLYGON", ring, np.asarray([0, len(ring)])


@st.composite
def linestring(draw):
    n = draw(st.integers(min_value=2, max_value=5))
    pts = np.array([[draw(coord), draw(coord)] for _ in range(n)])
    # drop consecutive duplicates (zero-length segments)
    keep = [0] + [i for i in range(1, n) if not (pts[i] == pts[i - 1]).all()]
    if len(keep) < 2:
        pts = np.vstack([pts[0], pts[0] + [1.0, 0.5]])
        keep = [0, 1]
    pts = pts[keep]
    return "LINESTRING", pts, np.asarray([0, len(pts)])


@st.composite
def point(draw):
    return "POINT", np.array([[draw(coord), draw(coord)]]), np.asarray([0, 1])


@st.composite
def multipoint(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    pts = np.unique(np.array([[draw(coord), draw(coord)] for _ in range(n)]), axis=0)
    return "MULTIPOINT", pts, np.arange(len(pts) + 1)


@st.composite
def multilinestring(draw):
    n_parts = draw(st.integers(min_value=1, max_value=3))
    parts = []
    for _ in range(n_parts):
        _k, c, _o = draw(linestring())
        parts.append(c)
    offsets = np.concatenate([[0], np.cumsum([len(p) for p in parts])])
    return "MULTILINESTRING", np.concatenate(parts), offsets


geom = st.one_of(
    convex_polygon(), box_polygon(), linestring(), point(), multipoint(), multilinestring()
)


def rel(a, b):
    return geo.relate_geoms(*a, *b)


@settings(max_examples=250, deadline=None)
@given(geom, geom)
def test_symmetry_and_negation(a, b):
    rab, rba = rel(a, b), rel(b, a)
    assert geo.pred_intersects(rab) == geo.pred_intersects(rba)
    assert geo.pred_disjoint(rab) == (not geo.pred_intersects(rab))
    assert geo.pred_touches(rab) == geo.pred_touches(rba)
    assert geo.pred_overlaps(rab) == geo.pred_overlaps(rba)
    assert geo.pred_equals(rab) == geo.pred_equals(rba)
    assert geo.pred_crosses(rab) == geo.pred_crosses(rba)


@settings(max_examples=250, deadline=None)
@given(geom, geom)
def test_containment_algebra(a, b):
    rab, rba = rel(a, b), rel(b, a)
    # contains(a,b) == within(b,a)
    assert geo.pred_contains(rab) == geo.pred_within(rba)
    # contains ⇒ covers ⇒ intersects
    if geo.pred_contains(rab):
        assert geo.pred_covers(rab)
    if geo.pred_covers(rab):
        assert geo.pred_intersects(rab)
    # equals ⇒ mutual covers
    if geo.pred_equals(rab):
        assert geo.pred_covers(rab) and geo.pred_covers(rba)
    # touches and overlaps are mutually exclusive; touches ⇒ intersects
    if geo.pred_touches(rab):
        assert geo.pred_intersects(rab) and not geo.pred_overlaps(rab)
    if geo.pred_overlaps(rab):
        assert geo.pred_intersects(rab)


@settings(max_examples=250, deadline=None)
@given(geom)
def test_reflexive(a):
    raa = rel(a, a)
    assert geo.pred_equals(raa)
    assert geo.pred_intersects(raa)
    assert geo.pred_covers(raa)
    assert not geo.pred_touches(raa)
    assert not geo.pred_crosses(raa)


@settings(max_examples=200, deadline=None)
@given(box_polygon(), box_polygon())
def test_boxes_vs_interval_arithmetic(a, b):
    """For axis-aligned boxes, intersects/touches/overlaps are decidable
    by interval arithmetic — the kernel must agree exactly."""
    ax0, ay0, ax1, ay1 = geo.polygon_bbox(a[1])
    bx0, by0, bx1, by1 = geo.polygon_bbox(b[1])
    sep = ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0
    edge_only = (not sep) and (ax1 == bx0 or bx1 == ax0 or ay1 == by0 or by1 == ay0)
    r = rel(a, b)
    assert geo.pred_intersects(r) == (not sep)
    if edge_only:
        assert geo.pred_touches(r)
        assert not geo.pred_overlaps(r)


@settings(max_examples=150, deadline=None)
@given(point(), geom)
def test_point_vs_any_matches_classification(p, g):
    r = rel(p, g)
    if g[0] in ("POINT", "MULTIPOINT"):
        same = tuple(p[1][0]) in set(map(tuple, g[1]))
        assert geo.pred_intersects(r) == same
        if g[0] == "POINT":
            assert geo.pred_equals(r) == same
        return
    if g[0] == "POLYGON":
        cls = int(geo.classify_points_in_polygon(p[1][:, 0], p[1][:, 1], g[1], g[2])[0])
        assert geo.pred_intersects(r) == (cls > 0)
        assert geo.pred_within(r) == (cls == 2)
        assert geo.pred_touches(r) == (cls == 1)
    else:  # (MULTI)LINESTRING
        on = bool(geo.points_on_segments(p[1][:, 0], p[1][:, 1], *geo.polygon_edges(g[1], g[2]))[0])
        assert geo.pred_intersects(r) == on


def test_translate_preserves_relations():
    sq = geo.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    inner = geo.parse_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    for dx, dy in [(17.0, -4.5), (-120.25, 33.0)]:
        a = ("POLYGON", sq[1] + np.array([dx, dy]), sq[2])
        b = ("POLYGON", inner[1] + np.array([dx, dy]), inner[2])
        r = rel(a, b)
        assert geo.pred_contains(r) and not geo.pred_touches(r)
