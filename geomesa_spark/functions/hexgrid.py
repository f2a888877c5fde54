"""Icosahedral aperture-7 hexagonal cell index (the H3-semantics layer).

BASELINE.json's north star names "H3 res-7" cells. Canonical Uber-H3 cell
ids are defined by ~540-entry base-cell orientation tables
(faceIjkBaseCells / baseCellData in the public H3 C sources) that cannot
be sourced or byte-verified in this offline sandbox (no h3 wheel exists
here to test against — SURVEY.md §0.4). Shipping unverifiable constants
would be worse than useless, so this module implements the same
*geometry* from first principles and documents the difference:

- a regular icosahedron is CONSTRUCTED from the golden ratio (not copied
  orientation constants): 12 vertices (0, ±1, ±φ) cyclic, 20 faces;
- points project gnomonically onto their nearest face plane (exactly the
  H3 projection step) and snap to an axial hex lattice whose spacing
  shrinks by √7 per resolution (aperture 7);
- cell ids pack (res, face, i, j) into one int64;
- ``parent`` re-encodes the cell center at res-1 (hex hierarchies are
  never perfectly nested — same property as canonical H3);
- ``k_ring`` enumerates the axial neighborhood on the home face
  (cross-face rings fall back to re-encoding perturbed boundary points).

Ids are therefore *H3-semantics-compatible but not numerically equal to
Uber H3 ids*. Every property that matters to the engine — hex cells of
H3-res-N scale, aperture-7 rollups, equality-joinable keys, ring
expansion — holds and is property-tested (tests/test_hexgrid.py).

All math is vectorized numpy, called from Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# icosahedron construction (golden ratio; no copied orientation tables)
# ---------------------------------------------------------------------------

_PHI = (1.0 + np.sqrt(5.0)) / 2.0


def _build_icosahedron():
    v = []
    for a, b in [(1.0, _PHI), (-1.0, _PHI), (1.0, -_PHI), (-1.0, -_PHI)]:
        v.append((0.0, a, b))
        v.append((a, b, 0.0))
        v.append((b, 0.0, a))
    verts = np.asarray(v, dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    # faces: all vertex triples forming edges of the convex hull — pick
    # triples whose pairwise dot products equal the icosahedral edge cosine
    edge_cos = verts @ verts.T
    adj = np.isclose(edge_cos, 1.0 / np.sqrt(5.0))  # neighboring vertices
    faces = []
    n = len(verts)
    for i in range(n):
        for j in range(i + 1, n):
            if not adj[i, j]:
                continue
            for k in range(j + 1, n):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    faces = np.asarray(faces, dtype=np.int64)
    assert faces.shape == (20, 3)
    centers = verts[faces].mean(axis=1)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # per-face orthonormal tangent basis (e1 toward the face's first vertex)
    e1 = verts[faces[:, 0]] - centers * (verts[faces[:, 0]] * centers).sum(axis=1, keepdims=True)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(centers, e1)
    return verts, faces, centers, e1, e2


_VERTS, _FACES, _CENTERS, _E1, _E2 = _build_icosahedron()

# Lattice scale: at res 0 the hex circumradius (in gnomonic plane units)
# is the face circumradius, so one res-0 cell spans a face; each res
# divides the edge by sqrt(7) (aperture 7). Axial basis vectors:
#   a = s * (3/2, sqrt(3)/2),  b = s * (0, sqrt(3))   with s = hex size.
_FACE_R = float(np.tan(np.arccos(float((_CENTERS[0] * _VERTS[_FACES[0, 0]]).sum()))))
_SQRT3 = np.sqrt(3.0)
MAX_RES = 15

# Aperture-7 substitution rotation (tan α = √3/5): odd resolutions use a
# lattice rotated by α relative to even ones (H3's Class II / Class III
# distinction), which makes each parent hex contain exactly the 7-child
# rosette — the property hex_parent relies on.
_AP7_ROT = float(np.arctan2(_SQRT3, 5.0))


def _hex_size(res: int) -> float:
    return _FACE_R / (7.0 ** (res / 2.0))


def _res_rot(res):
    """Lattice rotation angle for a resolution (vectorized-safe)."""
    return (np.asarray(res) % 2) * _AP7_ROT


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def _lonlat_to_xyz(lon, lat):
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    c = np.cos(lat_r)
    return np.stack([c * np.cos(lon_r), c * np.sin(lon_r), np.sin(lat_r)], axis=-1)


def _axial_round(q: np.ndarray, r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-coordinate rounding to the nearest hex center (standard)."""
    x, z = q, r
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


_OFF = np.int64(1) << np.int64(26)  # i/j offset so packed values are non-negative


def hex_encode(lon, lat, res: int = 7) -> np.ndarray:
    """(lon, lat) → int64 hex cell id at aperture-7 resolution ``res``.

    Layout: [4b res][5b face][27b i+OFF][27b j+OFF] (fits in 63 bits)."""
    p = _lonlat_to_xyz(lon, lat)
    dots = p @ _CENTERS.T
    face = np.argmax(dots, axis=-1)
    c = _CENTERS[face]
    # gnomonic projection onto the face tangent plane
    scale = 1.0 / (p * c).sum(axis=-1)
    q3 = p * scale[..., None] - c
    x0 = (q3 * _E1[face]).sum(axis=-1)
    y0 = (q3 * _E2[face]).sum(axis=-1)
    # Class II/III rotation, then plane → axial hex coords
    th = float(_res_rot(res))
    ct, st = np.cos(th), np.sin(th)
    x = ct * x0 + st * y0
    y = -st * x0 + ct * y0
    s = _hex_size(res)
    aq = (2.0 / 3.0) * x / s
    ar = (-x / 3.0 + _SQRT3 / 3.0 * y) / s
    i, j = _axial_round(aq, ar)
    return (
        (np.int64(res) << np.int64(59))
        | (face.astype(np.int64) << np.int64(54))
        | ((i + _OFF) << np.int64(27))
        | (j + _OFF)
    )


def hex_res(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(59)) & np.int64(0xF)


def hex_face(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> np.int64(54)) & np.int64(0x1F)


def hex_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → (lon, lat) of the hex center (inverse gnomonic)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = hex_res(cell)
    face = hex_face(cell)
    i = ((cell >> np.int64(27)) & np.int64((1 << 27) - 1)) - _OFF
    j = (cell & np.int64((1 << 27) - 1)) - _OFF
    s = _FACE_R / (7.0 ** (res.astype(np.float64) / 2.0))
    xr = s * 1.5 * i
    yr = s * (_SQRT3 / 2.0 * i + _SQRT3 * j)
    th = _res_rot(res).astype(np.float64)
    ct, st = np.cos(th), np.sin(th)
    x = ct * xr - st * yr  # inverse of the encode-side rotation
    y = st * xr + ct * yr
    p = _CENTERS[face] + x[..., None] * _E1[face] + y[..., None] * _E2[face]
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    lon = np.degrees(np.arctan2(p[..., 1], p[..., 0]))
    lat = np.degrees(np.arcsin(np.clip(p[..., 2], -1.0, 1.0)))
    return lon, lat


def hex_parent(cell, parent_res: int | None = None) -> np.ndarray:
    """Aperture-7 parent: the cell at ``parent_res`` (default res-1)
    containing this cell's center."""
    cell = np.asarray(cell, dtype=np.int64)
    res = hex_res(cell)
    lon, lat = hex_center(cell)
    if parent_res is not None:
        if parent_res < 0:
            raise ValueError("parent of res-0 cell")
        return hex_encode(lon, lat, parent_res)
    # default: each cell's own res-1 (inputs may mix resolutions)
    if (res < 1).any():
        raise ValueError("parent of res-0 cell")
    out = np.empty(cell.shape, dtype=np.int64)
    for r in np.unique(res):
        m = res == r
        out[m] = hex_encode(lon[m], lat[m], int(r) - 1)
    return out


def k_ring(cell: int, k: int) -> np.ndarray:
    """All cells within axial hex distance k of ``cell``, enumerated on
    the home face lattice; candidates near face edges are canonicalized
    by re-encoding their centers (so cross-face neighbors resolve to
    their true owning face)."""
    cell = int(cell)
    res = int(hex_res(cell))
    face = int(hex_face(cell))
    i0 = int(((cell >> 27) & ((1 << 27) - 1)) - _OFF)
    j0 = int((cell & ((1 << 27) - 1)) - _OFF)
    di = np.arange(-k, k + 1)
    ii, jj = np.meshgrid(di, di, indexing="ij")
    mask = np.abs(ii + jj) <= k  # axial hex-distance constraint
    i = (i0 + ii[mask]).astype(np.int64)
    j = (j0 + jj[mask]).astype(np.int64)
    raw = (
        (np.int64(res) << np.int64(59))
        | (np.int64(face) << np.int64(54))
        | ((i + _OFF) << np.int64(27))
        | (j + _OFF)
    )
    lon, lat = hex_center(raw)
    return np.unique(hex_encode(lon, lat, res))
