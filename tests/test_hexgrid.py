"""Property tests for the icosahedral aperture-7 hex index
(H3-semantics layer, SURVEY.md §7 step 1 'H3 risk' resolution)."""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_spark.functions import hexgrid as H
from geomesa_spark.sources import synth


def _sample_points(n=5000):
    i = np.arange(n, dtype=np.uint64)
    lon = synth._uniform(i, -180.0, 180.0)
    lat = np.degrees(np.arcsin(synth._uniform(i + np.uint64(5), -0.999, 0.999)))  # area-uniform
    return lon, lat


def test_encode_center_roundtrip():
    """The center of a cell re-encodes to the same cell (fixed point)."""
    lon, lat = _sample_points()
    for res in (2, 5, 7):
        cells = H.hex_encode(lon, lat, res)
        clon, clat = H.hex_center(cells)
        again = H.hex_encode(clon, clat, res)
        # non-fixed-points are cells whose center projects across an
        # icosahedron edge (canonical H3 needs base-cell ownership tables
        # for these); encode itself stays deterministic either way
        assert (again == cells).mean() > 0.99
        assert H.hex_res(cells).tolist() == [res] * len(cells)
        assert (H.hex_face(cells) < 20).all()


def test_center_is_near_point():
    """Every point is within ~one circumradius of its cell center."""
    lon, lat = _sample_points(2000)
    res = 7
    cells = H.hex_encode(lon, lat, res)
    clon, clat = H.hex_center(cells)
    from geomesa_spark.functions import geometry as geo

    d = geo.haversine_m(lon, lat, clon, clat)
    # res-7 aperture-7 hexes here: face circumradius / 7^3.5 ≈ earth-scale/km
    edge_km = 7000.0 / (7.0 ** (res / 2.0)) * 2
    assert d.max() < edge_km * 1000.0


def test_aperture_7_cell_count_growth():
    """Distinct-cell count grows ~7x per resolution on dense samples."""
    lon, lat = _sample_points(60000)
    n3 = len(np.unique(H.hex_encode(lon, lat, 3)))
    n4 = len(np.unique(H.hex_encode(lon, lat, 4)))
    assert 4.0 < n4 / n3 < 9.0


def test_parent_consistency():
    """A point's res-(r-1) cell equals the parent of its res-r cell for
    the overwhelming majority of points (hex hierarchies are never
    perfectly nested — H3 itself has the same property)."""
    lon, lat = _sample_points(5000)
    c7 = H.hex_encode(lon, lat, 7)
    c6_direct = H.hex_encode(lon, lat, 6)
    c6_parent = H.hex_parent(c7, 6)
    assert (c6_direct == c6_parent).mean() > 0.85


def test_k_ring_contains_neighbors():
    lon, lat = np.array([2.351]), np.array([48.857])
    res = 7
    c = int(H.hex_encode(lon, lat, res)[0])
    ring1 = H.k_ring(c, 1)
    assert c in ring1
    assert 5 <= len(ring1) <= 7 + 1  # 6 neighbors + self (face seams may dedupe)
    ring2 = H.k_ring(c, 2)
    assert set(ring1.tolist()) <= set(ring2.tolist())
    # nearby point's cell appears in the ring
    c2 = int(H.hex_encode(lon + 0.02, lat, res)[0])
    assert c2 in H.k_ring(c, 3)


def test_determinism():
    lon, lat = _sample_points(1000)
    a = H.hex_encode(lon, lat, 7)
    b = H.hex_encode(lon.copy(), lat.copy(), 7)
    assert (a == b).all()


def test_hot_city_single_cell():
    """Each hot city maps to one res-7 cell (the skew fixture premise)."""
    for name, lon, lat in synth.HOT_CITIES:
        jitter = np.linspace(-0.001, 0.001, 50)
        cells = H.hex_encode(lon + jitter, lat + jitter, 7)
        assert len(np.unique(cells)) <= 2  # tight cluster, at most a boundary split


def test_parent_mixed_resolutions_uses_each_cells_own_res():
    from geomesa_spark.functions import hexgrid as H

    lon = np.array([2.351, 2.351, -74.006])
    lat = np.array([48.857, 48.857, 40.713])
    c7 = H.hex_encode(lon[:1], lat[:1], 7)
    c5 = H.hex_encode(lon[1:2], lat[1:2], 5)
    c9 = H.hex_encode(lon[2:], lat[2:], 9)
    mixed = np.concatenate([c7, c5, c9])
    parents = H.hex_parent(mixed)
    assert list(H.hex_res(parents)) == [6, 4, 8]  # each cell's own res-1
    # and each parent contains its child's center
    for child, par in zip(mixed, parents):
        lo, la = H.hex_center(np.array([child]))
        again = H.hex_encode(lo, la, int(H.hex_res(np.array([par]))[0]))
        assert int(again[0]) == int(par)
