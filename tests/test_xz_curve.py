"""XZ-ordering (XZ2 extents / XZ3 extents x time) — the reference's
non-point index keys, reimplemented from the published SSD'99 scheme.
Property: the query ranges are a SUPERSET filter — every object whose
box intersects the window has its key inside some range — and the
filter is selective for small windows."""

from __future__ import annotations

import numpy as np

from geomesa_spark.functions import cells as C

WEEK = C.SECONDS_PER_WEEK


def _rand_boxes(rng, n):
    cx = rng.uniform(-170, 170, n)
    cy = rng.uniform(-80, 80, n)
    # mixed scales: points, small, and very large extents
    w = np.where(rng.random(n) < 0.2, 0.0, 10 ** rng.uniform(-3, 1.3, n))
    h = np.where(rng.random(n) < 0.2, 0.0, 10 ** rng.uniform(-3, 1.3, n))
    return cx - w, cy - h, cx + w, cy + h


def test_xz2_superset_and_selectivity():
    rng = np.random.default_rng(42)
    x0, y0, x1, y1 = _rand_boxes(rng, 4000)
    keys = C.xz2_encode(x0, y0, x1, y1)
    for qx0, qy0, qx1, qy1 in ((0, 0, 20, 15), (-120, 30, -100, 45), (5, 5, 5.5, 5.5)):
        ranges = C.xz2_ranges(qx0, qy0, qx1, qy1)
        lo = np.asarray([a for a, _ in ranges])
        hi = np.asarray([b for _, b in ranges])
        idx = np.searchsorted(lo, keys, side="right") - 1
        cand = (idx >= 0) & (keys <= hi[np.clip(idx, 0, len(hi) - 1)])
        truth = ~((x1 < qx0) | (qx1 < x0) | (y1 < qy0) | (qy1 < y0))
        assert (cand | ~truth).all()  # superset: no true match missed
        assert cand.sum() < len(keys) * 0.6  # and actually filters
    # point-sized window still finds the giant object covering it
    big = C.xz2_encode([-170.0], [-80.0], [170.0], [80.0])
    r = C.xz2_ranges(1.0, 1.0, 1.001, 1.001)
    assert any(a <= big[0] <= b for a, b in r)


def test_xz3_superset_week_periods():
    rng = np.random.default_rng(7)
    x0, y0, x1, y1 = _rand_boxes(rng, 2000)
    base = 2800 * WEEK
    t0 = base + rng.integers(0, 3 * WEEK, 2000)
    dur = rng.integers(0, 86400, 2000)
    # clamp into one period (the writer contract: split per period)
    t1 = np.minimum(t0 + dur, (t0 // WEEK + 1) * WEEK - 1)
    keys = C.xz3_encode(x0, y0, x1, y1, t0, t1)
    # window spanning a period boundary: ranges come per period
    q = (0.0, 0.0, 40.0, 30.0, base + 6 * 86400, base + 8 * 86400)
    ranges = C.xz3_ranges(*q)
    assert len({(a >> 44) for a, _ in ranges}) == 2  # two weekly periods
    lo = np.asarray([a for a, _ in ranges])
    hi = np.asarray([b for _, b in ranges])
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    idx = np.searchsorted(lo, keys, side="right") - 1
    cand = (idx >= 0) & (keys <= hi[np.clip(idx, 0, len(hi) - 1)])
    truth = (
        ~((x1 < q[0]) | (q[2] < x0) | (y1 < q[1]) | (q[3] < y0))
        & (t1 >= q[4]) & (t0 <= q[5])
    )
    assert (cand | ~truth).all()
    assert cand.sum() < len(keys) * 0.7


def test_xz2_point_boxes_match_leaf_depth():
    """Degenerate (point) extents descend to the full resolution."""
    k1 = C.xz2_encode([10.0], [10.0], [10.0], [10.0])
    k2 = C.xz2_encode([10.0], [10.0], [10.000001], [10.000001])
    assert k1[0] == k2[0]  # same leaf element
