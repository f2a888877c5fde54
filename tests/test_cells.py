"""Property + fixture tests for the cell library (SURVEY.md §5.2:
curve round-trips & ranges-contain-point invariants, mirroring the shape
of GeoMesa's Z2SFCTest / Z3SFCTest / GeoHashTest)."""

import numpy as np
import pytest

from geomesa_spark.functions import cells


RNG = np.random.default_rng(42)
N = 5000
LONS = RNG.uniform(-180, 180, N)
LATS = RNG.uniform(-90, 90, N)


def test_z2_round_trip():
    z = cells.z2_encode(LONS, LATS)
    assert (z >= 0).all()
    lon2, lat2 = cells.z2_decode(z)
    # decoded corner is within one cell of the input
    assert np.all(np.abs(lon2 - LONS) <= 360.0 / (1 << cells.Z2_BITS) + 1e-9)
    assert np.all(np.abs(lat2 - LATS) <= 180.0 / (1 << cells.Z2_BITS) + 1e-9)


def test_z2_locality_prefix():
    # two points in the same small box share high-order bits
    a = cells.z2_encode(np.array([10.0]), np.array([20.0]))[0]
    b = cells.z2_encode(np.array([10.0001]), np.array([20.0001]))[0]
    assert (a >> 30) == (b >> 30)


def test_z3_week_epoch():
    ts = np.array([0, cells.SECONDS_PER_WEEK, 52 * cells.SECONDS_PER_WEEK + 5])
    z = cells.z3_encode(np.zeros(3), np.zeros(3), ts)
    assert list(cells.z3_week(z)) == [0, 1, 52]
    # same week, nearby time → same week prefix, different z
    z2 = cells.z3_encode(np.zeros(1), np.zeros(1), np.array([3600]))
    assert cells.z3_week(z2)[0] == 0


def test_geohash_known_value():
    # classic published example: Ezeiza airport ~ (-34.6, -58.4)? use the
    # canonical wikipedia example instead: (42.605, -5.603) → "ezs42"
    gh = cells.geohash_encode(np.array([-5.603]), np.array([42.605]), precision=5)
    assert gh[0] == b"ezs42"


def test_geohash_round_trip():
    for prec in (5, 6, 9):
        gh = cells.geohash_encode(LONS, LATS, precision=prec)
        lon2, lat2 = cells.geohash_decode(gh)
        lon_bits = (5 * prec + 1) // 2
        lat_bits = (5 * prec) // 2
        assert np.all(np.abs(lon2 - LONS) <= 360.0 / (1 << lon_bits))
        assert np.all(np.abs(lat2 - LATS) <= 180.0 / (1 << lat_bits))


def test_s2_level_and_parenting():
    c12 = cells.s2_encode(LONS, LATS, level=12)
    assert (cells.s2_level(c12) == 12).all()
    c30 = cells.s2_encode(LONS, LATS, level=30)
    assert (cells.s2_level(c30) == 30).all()
    # level-12 id is the level-30 id with low bits replaced by its lsb
    lsb12 = np.uint64(1) << np.uint64(2 * (30 - 12))
    mask = ~(lsb12 - np.uint64(1)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    parent = ((c30.astype(np.uint64) & mask) | lsb12).astype(np.int64)
    assert (parent == c12).all()


def test_s2_faces():
    pts = {
        (0.0, 0.0): 0,    # +x
        (90.0, 0.0): 1,   # +y
        (0.0, 89.9): 2,   # +z
        (179.99, 0.0): 3,  # -x
        (-90.0, 0.0): 4,  # -y
        (0.0, -89.9): 5,  # -z
    }
    for (lon, lat), face in pts.items():
        cid = cells.s2_encode(np.array([lon]), np.array([lat]), level=12)[0]
        assert (np.uint64(cid) >> np.uint64(61)) == face, (lon, lat)
    # a global sample touches all 6 faces
    faces = np.asarray(cells.s2_encode(LONS, LATS, 12)).astype(np.uint64) >> np.uint64(61)
    assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}


def test_s2_locality():
    # points within ~100m share their level-12 cell almost always
    base_lon, base_lat = 7.4, 46.9
    jitter = RNG.uniform(-0.0002, 0.0002, (200, 2))
    c = cells.s2_encode(base_lon + jitter[:, 0], base_lat + jitter[:, 1], 12)
    assert len(np.unique(c)) <= 4  # at most a cell corner neighborhood


def test_grid_encode_bounds_inverse():
    lvl = 8
    g = cells.grid_encode(LONS, LATS, lvl)
    lo, la, hi, ha = cells.grid_cell_bounds(g, lvl)
    assert np.all((LONS >= lo) & (LONS <= hi))
    assert np.all((LATS >= la) & (LATS <= ha))


def test_grid_ring_sizes_and_disk():
    lvl = 8
    center = cells.grid_encode(np.array([0.0]), np.array([0.0]), lvl)[0]
    assert len(cells.grid_ring(center, 0, lvl)) == 1
    assert len(cells.grid_ring(center, 1, lvl)) == 8
    assert len(cells.grid_ring(center, 2, lvl)) == 16
    assert len(cells.grid_disk(center, 2, lvl)) == 25


def test_grid_ring_wraps_antimeridian():
    lvl = 8
    nx, ny = cells.grid_shape(lvl)
    edge = cells.grid_encode(np.array([179.9]), np.array([0.0]), lvl)[0]
    ring = cells.grid_ring(edge, 1, lvl)
    assert len(ring) == 8
    # some ring member lies on the west edge (ix == 0)
    assert (ring % nx == 0).any()


def test_grid_ring_clamps_poles():
    lvl = 8
    top = cells.grid_encode(np.array([0.0]), np.array([89.9]), lvl)[0]
    ring = cells.grid_ring(top, 1, lvl)
    assert len(ring) == 5  # row above the pole does not exist


def test_grid_cover_bbox_contains_member_points():
    lvl = 8
    cover = set(cells.grid_cover_bbox(-10.0, -5.0, 12.0, 7.5, lvl).tolist())
    inside = (LONS >= -10) & (LONS <= 12) & (LATS >= -5) & (LATS <= 7.5)
    pts = cells.grid_encode(LONS[inside], LATS[inside], lvl)
    assert set(pts.tolist()) <= cover
