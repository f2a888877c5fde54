"""Pure-numpy space-filling-curve cell math.

From-scratch replacements for GeoMesa's curve/index-key layer
(upstream layout, see SURVEY.md §0 citation policy):

- Z2 Morton curve      ~ ``geomesa-z3/.../curve/Z2SFC.scala``
- Z3 (space x time)    ~ ``geomesa-z3/.../curve/Z3SFC.scala`` (weekly epochs)
- GeoHash base-32      ~ ``geomesa-utils/.../utils/geohash/GeoHash.scala``
- S2 level-N cell ids  — published s2geometry face+Hilbert algorithm
  (required by BASELINE.json north_star: "S2 level-12 cells")
- Equirectangular grid — the engine's join/partition grid; the analog of
  GeoMesa's GeoHash-based grid partitioning (``RelationUtils#gridPartition``)
  and the ring enumeration of ``GeoHashSpiral.scala`` used by kNN.

Everything is vectorized numpy over ndarrays — these functions are called
from Arrow-batched pandas UDFs (never per-row Python). All functions accept
and return numpy arrays; scalars broadcast.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# bit spreading (Morton interleave) helpers
# ---------------------------------------------------------------------------

_U = np.uint64


def _spread2(x: np.ndarray) -> np.ndarray:
    """Spread lower 32 bits of x into even bit positions (u64)."""
    x = x.astype(np.uint64) & _U(0xFFFFFFFF)
    x = (x | (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x3333333333333333)
    x = (x | (x << _U(1))) & _U(0x5555555555555555)
    return x


def _unspread2(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & _U(0x5555555555555555)
    x = (x | (x >> _U(1))) & _U(0x3333333333333333)
    x = (x | (x >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> _U(4))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x >> _U(8))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x >> _U(16))) & _U(0x00000000FFFFFFFF)
    return x


def _spread3(x: np.ndarray) -> np.ndarray:
    """Spread lower 21 bits of x to every 3rd bit position (u64)."""
    x = x.astype(np.uint64) & _U(0x1FFFFF)
    x = (x | (x << _U(32))) & _U(0x001F00000000FFFF)
    x = (x | (x << _U(16))) & _U(0x001F0000FF0000FF)
    x = (x | (x << _U(8))) & _U(0x100F00F00F00F00F)
    x = (x | (x << _U(4))) & _U(0x10C30C30C30C30C3)
    x = (x | (x << _U(2))) & _U(0x1249249249249249)
    return x


# ---------------------------------------------------------------------------
# Z2 (lon/lat Morton) — GeoMesa Z2SFC semantics: 31 bits per dimension
# ---------------------------------------------------------------------------

Z2_BITS = 31


def _norm_lon(lon: np.ndarray, bits: int) -> np.ndarray:
    n = np.int64(1) << np.int64(bits)
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    return np.clip(ix, 0, n - 1)


def _norm_lat(lat: np.ndarray, bits: int) -> np.ndarray:
    n = np.int64(1) << np.int64(bits)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    return np.clip(iy, 0, n - 1)


def z2_encode(lon, lat, bits: int = Z2_BITS) -> np.ndarray:
    """Morton-interleave lon/lat into a (2*bits)-bit non-negative int64."""
    ix = _norm_lon(np.asarray(lon), bits).astype(np.uint64)
    iy = _norm_lat(np.asarray(lat), bits).astype(np.uint64)
    return (_spread2(ix) | (_spread2(iy) << _U(1))).astype(np.int64)


def z2_decode(z, bits: int = Z2_BITS) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of z2_encode → (lon, lat) cell-lower-left corners."""
    z = np.asarray(z, dtype=np.uint64)
    ix = _unspread2(z).astype(np.float64)
    iy = _unspread2(z >> _U(1)).astype(np.float64)
    n = float(1 << bits)
    return ix / n * 360.0 - 180.0, iy / n * 180.0 - 90.0


# ---------------------------------------------------------------------------
# Z3 (lon/lat/time Morton with weekly epochs) — GeoMesa Z3SFC semantics
# (week-since-epoch prefix; our bit layout: week<<48 | morton3(x16,y16,t16))
# ---------------------------------------------------------------------------

SECONDS_PER_WEEK = 7 * 24 * 3600


def z3_encode(lon, lat, ts_seconds) -> np.ndarray:
    """ts_seconds: unix seconds (int64). Returns int64 z3 key."""
    ts = np.asarray(ts_seconds, dtype=np.int64)
    week = ts // SECONDS_PER_WEEK
    sec_in_week = (ts % SECONDS_PER_WEEK).astype(np.float64)
    ix = _norm_lon(np.asarray(lon), 16).astype(np.uint64)
    iy = _norm_lat(np.asarray(lat), 16).astype(np.uint64)
    it = np.clip(
        np.floor(sec_in_week / SECONDS_PER_WEEK * 65536.0).astype(np.int64), 0, 65535
    ).astype(np.uint64)
    z = _spread3(ix) | (_spread3(iy) << _U(1)) | (_spread3(it) << _U(2))
    return ((week.astype(np.uint64) << _U(48)) | z).astype(np.int64)


def z3_week(z3) -> np.ndarray:
    return (np.asarray(z3, dtype=np.int64) >> 48).astype(np.int64)


# ---------------------------------------------------------------------------
# GeoHash (base-32) — standard public algorithm
# ---------------------------------------------------------------------------

_GH_ALPHABET = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)


def geohash_encode(lon, lat, precision: int = 9) -> np.ndarray:
    """Vectorized geohash → numpy array of fixed-length byte strings."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2  # lon gets the extra bit (even positions)
    lat_bits = nbits // 2
    ix = _norm_lon(np.asarray(lon), lon_bits).astype(np.uint64)
    iy = _norm_lat(np.asarray(lat), lat_bits).astype(np.uint64)
    # geohash bit stream starts with lon at the MSB; counted from the LSB,
    # lon sits at even positions when nbits is odd, odd positions otherwise
    if nbits % 2 == 1:
        inter = _spread2(ix) | (_spread2(iy) << _U(1))
    else:
        inter = (_spread2(ix) << _U(1)) | _spread2(iy)
    chars = np.empty((precision, ix.shape[0] if ix.ndim else 1), dtype=np.uint8)
    flat = np.atleast_1d(inter)
    for c in range(precision):
        shift = _U(nbits - 5 * (c + 1))
        chars[c] = _GH_ALPHABET[((flat >> shift) & _U(0x1F)).astype(np.int64)]
    return chars.T.copy().view(f"S{precision}").ravel()


def geohash_decode(gh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode geohash byte strings → (lon, lat) of cell centers."""
    gh = np.asarray(gh, dtype=bytes)
    precision = len(gh[0])
    lut = np.full(256, -1, dtype=np.int64)
    lut[_GH_ALPHABET.astype(np.int64)] = np.arange(32)
    raw = gh.view(np.uint8).reshape(len(gh), precision).astype(np.int64)
    vals = lut[raw]
    inter = np.zeros(len(gh), dtype=np.uint64)
    nbits = 5 * precision
    for c in range(precision):
        inter |= vals[:, c].astype(np.uint64) << _U(nbits - 5 * (c + 1))
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    if nbits % 2 == 1:
        ix = _unspread2(inter).astype(np.float64)
        iy = _unspread2(inter >> _U(1)).astype(np.float64)
    else:
        ix = _unspread2(inter >> _U(1)).astype(np.float64)
        iy = _unspread2(inter).astype(np.float64)
    lon = (ix + 0.5) / float(1 << lon_bits) * 360.0 - 180.0
    lat = (iy + 0.5) / float(1 << lat_bits) * 180.0 - 90.0
    return lon, lat


# ---------------------------------------------------------------------------
# S2 cell ids — published s2geometry algorithm (face + quadratic ST +
# Hilbert curve via 4-bit lookup tables). Level-12 is the north-rule level.
# ---------------------------------------------------------------------------

_S2_LOOKUP_BITS = 4
_S2_SWAP = 1
_S2_INVERT = 2
_S2_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_S2_POS_TO_ORIENT = (_S2_SWAP, 0, 0, _S2_INVERT | _S2_SWAP)
_S2_MAX_LEVEL = 30


def _s2_build_lookups() -> tuple[np.ndarray, np.ndarray]:
    lookup_pos = np.zeros(1 << (2 * _S2_LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _S2_LOOKUP_BITS + 2), dtype=np.uint64)

    def init(level, i, j, orig_orient, pos, orient):
        if level == _S2_LOOKUP_BITS:
            ij = (i << _S2_LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _S2_POS_TO_IJ[orient]
        for idx in range(4):
            init(
                level,
                i + (r[idx] >> 1),
                j + (r[idx] & 1),
                orig_orient,
                pos + idx,
                orient ^ _S2_POS_TO_ORIENT[idx],
            )

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_S2_LOOKUP_POS, _S2_LOOKUP_IJ = _s2_build_lookups()


def _s2_xyz(lon, lat) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    cos_lat = np.cos(lat_r)
    return cos_lat * np.cos(lon_r), cos_lat * np.sin(lon_r), np.sin(lat_r)


def _s2_face_uv(x, y, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ucalc, vcalc) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ucalc()[m]
                v[m] = vcalc()[m]
    return face, u, v


def _s2_st(u: np.ndarray) -> np.ndarray:
    """Quadratic UV→ST projection (s2geometry S2::UVtoST)."""
    pos = 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = 1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, pos, neg)


def s2_encode(lon, lat, level: int = 12) -> np.ndarray:
    """S2 cell id at `level` (canonical uint64 bit layout, as int64)."""
    x, y, z = _s2_xyz(lon, lat)
    face, u, v = _s2_face_uv(x, y, z)
    max_size = 1 << _S2_MAX_LEVEL
    i = np.clip((_s2_st(u) * max_size).astype(np.int64), 0, max_size - 1).astype(np.uint64)
    j = np.clip((_s2_st(v) * max_size).astype(np.int64), 0, max_size - 1).astype(np.uint64)
    n = face.astype(np.uint64) << _U(60)
    bits = (face & _S2_SWAP).astype(np.uint64)
    mask = _U((1 << _S2_LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        bits += ((i >> _U(k * _S2_LOOKUP_BITS)) & mask) << _U(_S2_LOOKUP_BITS + 2)
        bits += ((j >> _U(k * _S2_LOOKUP_BITS)) & mask) << _U(2)
        bits = _S2_LOOKUP_POS[bits.astype(np.int64)]
        n |= (bits >> _U(2)) << _U(k * 2 * _S2_LOOKUP_BITS)
        bits &= _U(_S2_SWAP | _S2_INVERT)
    leaf = n * _U(2) + _U(1)
    lsb = _U(1) << _U(2 * (_S2_MAX_LEVEL - level))
    return ((leaf & (~(lsb - _U(1)) & _U(0xFFFFFFFFFFFFFFFF))) | lsb).astype(np.int64)


def s2_level(cell_id) -> np.ndarray:
    """Level of an S2 cell id = 30 - (trailing zero count / 2)."""
    c = np.asarray(cell_id, dtype=np.uint64)
    lsb = c & (~c + _U(1))
    tz = np.zeros(c.shape, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (v & _U((1 << shift) - 1)) == 0
        big = v != 0
        step = m & big
        tz[step] += shift
        v[step] >>= _U(shift)
    return _S2_MAX_LEVEL - tz // 2


# ---------------------------------------------------------------------------
# Equirectangular join grid — the engine's hash-join / expand-ring key space.
# Level g: 2^g lon cells x 2^(g-1) lat cells; cell_id = iy * nx + ix.
# Analog of GeoMesa's grid partitioning (RelationUtils#gridPartition) and
# GeoHashSpiral ring enumeration, but integer-arithmetic-friendly so the
# same cell assignment is expressible in plain SQL for DuckDB oracles.
# ---------------------------------------------------------------------------


def grid_shape(level: int) -> tuple[int, int]:
    nx = 1 << level
    ny = max(1, 1 << (level - 1))
    return nx, ny


def grid_encode(lon, lat, level: int) -> np.ndarray:
    nx, ny = grid_shape(level)
    ix = np.clip(
        np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nx).astype(np.int64),
        0,
        nx - 1,
    )
    iy = np.clip(
        np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * ny).astype(np.int64),
        0,
        ny - 1,
    )
    return iy * nx + ix


def grid_cell_bounds(cell, level: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(min_lon, min_lat, max_lon, max_lat) of grid cells."""
    nx, ny = grid_shape(level)
    cell = np.asarray(cell, dtype=np.int64)
    ix = cell % nx
    iy = cell // nx
    w = 360.0 / nx
    h = 180.0 / ny
    min_lon = ix * w - 180.0
    min_lat = iy * h - 90.0
    return min_lon, min_lat, min_lon + w, min_lat + h


def grid_ring(cell: int, radius: int, level: int) -> np.ndarray:
    """Cells at Chebyshev distance exactly `radius` (radius 0 → the cell).

    Longitude wraps at the antimeridian; latitude is clamped at the poles.
    This is the expand-ring primitive of the kNN join (the set-oriented
    rewrite of GeoMesa's GeoHashSpiral, SURVEY.md §3.3).
    """
    nx, ny = grid_shape(level)
    ix = int(cell) % nx
    iy = int(cell) // nx
    if radius == 0:
        return np.asarray([cell], dtype=np.int64)
    out = []
    for dy in range(-radius, radius + 1):
        yy = iy + dy
        if yy < 0 or yy >= ny:
            continue
        if abs(dy) == radius:
            xs = range(ix - radius, ix + radius + 1)
        else:
            xs = (ix - radius, ix + radius)
        for xx in xs:
            out.append(yy * nx + (xx % nx))
    return np.unique(np.asarray(out, dtype=np.int64))


def grid_disk(cell: int, radius: int, level: int) -> np.ndarray:
    """All cells within Chebyshev distance `radius` (inclusive)."""
    parts = [grid_ring(cell, r, level) for r in range(radius + 1)]
    return np.unique(np.concatenate(parts))


def grid_cover_bbox(min_lon, min_lat, max_lon, max_lat, level: int) -> np.ndarray:
    """All grid cells overlapping an axis-aligned bbox (no antimeridian split;
    callers split the box at ±180 first — see geometry.split_antimeridian)."""
    nx, ny = grid_shape(level)
    x0 = int(np.clip(np.floor((min_lon + 180.0) / 360.0 * nx), 0, nx - 1))
    x1 = int(np.clip(np.floor((max_lon + 180.0) / 360.0 * nx - 1e-12), 0, nx - 1))
    y0 = int(np.clip(np.floor((min_lat + 90.0) / 180.0 * ny), 0, ny - 1))
    y1 = int(np.clip(np.floor((max_lat + 90.0) / 180.0 * ny - 1e-12), 0, ny - 1))
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    return (ys[:, None] * nx + xs[None, :]).ravel()


# ---------------------------------------------------------------------------
# XZ-ordering (extents-capable curve) — from-scratch implementation of the
# published XZ-ordering scheme (Böhm, Klump & Kriegel, SSD'99), the curve
# behind GeoMesa's XZ2 (2-D extents) and XZ3 (extents x time) indices
# (upstream layout ~ geomesa-z3/.../curve/XZ2SFC.scala / XZ3SFC.scala).
# An object's key is the sequence code of the largest quad/octree element
# whose DOUBLED ("enlarged") cell contains the object — so every object,
# regardless of extent, gets exactly one key, and a query enumerates the
# code ranges of elements whose enlarged cells intersect the window
# (a candidate SUPERSET; exact geometry refines downstream, the same
# cover-then-refine contract as the engine's grid joins).
# ---------------------------------------------------------------------------

XZ_G = 12  # resolution (tree depth); 4^12 / 8^12 elements at the bottom


def _xz_length(mins: np.ndarray, maxs: np.ndarray, g: int) -> np.ndarray:
    """Per-object element depth: the deepest level whose enlarged cell
    still contains the [mins, maxs] box (dims stacked on axis 0, values
    normalized to [0, 1])."""
    w = np.clip((maxs - mins).max(axis=0), 1e-300, 1.0)
    l1 = np.floor(np.log(w) / np.log(0.5)).astype(np.int64)
    l1 = np.clip(l1, 0, g)
    w2 = np.power(0.5, (l1 + 1).astype(np.float64))
    fits = np.ones(mins.shape[1], dtype=bool)
    for d in range(mins.shape[0]):
        fits &= maxs[d] <= np.floor(mins[d] / w2) * w2 + 2.0 * w2
    return np.where((l1 < g) & fits, l1 + 1, l1)


def _xz_sequence_code(mins: np.ndarray, length: np.ndarray, g: int, dims: int) -> np.ndarray:
    """Sequence code of the element anchored at each object's min corner,
    descending `length` levels (vectorized over objects)."""
    base = 1 << dims  # 4 for XZ2, 8 for XZ3
    cs = np.zeros(mins.shape[1], dtype=np.int64)
    lo = np.zeros_like(mins)
    hi = np.ones_like(mins)
    for i in range(int(length.max()) if len(length) else 0):
        active = i < length
        mid = (lo + hi) / 2.0
        q = np.zeros(mins.shape[1], dtype=np.int64)
        for d in range(dims):
            upper = mins[d] >= mid[d]
            q |= upper.astype(np.int64) << d
            lo[d] = np.where(upper, mid[d], lo[d])
            hi[d] = np.where(upper, hi[d], mid[d])
        step = (base ** (g - i) - 1) // (base - 1)
        cs = np.where(active, cs + 1 + q * step, cs)
    return cs


def xz2_encode(min_lon, min_lat, max_lon, max_lat, g: int = XZ_G) -> np.ndarray:
    """XZ2 key (int64) for 2-D extents (bounding boxes of non-point
    geometries). Point inputs (min == max) work too."""
    nx = (np.asarray(min_lon, dtype=np.float64) + 180.0) / 360.0
    ny = (np.asarray(min_lat, dtype=np.float64) + 90.0) / 180.0
    mx = (np.asarray(max_lon, dtype=np.float64) + 180.0) / 360.0
    my = (np.asarray(max_lat, dtype=np.float64) + 90.0) / 180.0
    mins = np.clip(np.stack([nx, ny]), 0.0, 1.0)
    maxs = np.clip(np.stack([mx, my]), 0.0, 1.0)
    length = _xz_length(mins, maxs, g)
    return _xz_sequence_code(mins, length, g, 2)


def xz3_encode(min_lon, min_lat, max_lon, max_lat, t_min_s, t_max_s, g: int = XZ_G) -> np.ndarray:
    """XZ3 key (int64) for extents x time: the composite spatio-temporal
    key for non-point geometries with a duration. Time binned into weekly
    periods (the Z3 convention); the period rides in the high 40+ bits so
    keys cluster by week then by curve locality. Objects must lie within
    one period — callers split longer intervals per period, exactly as
    the reference's XZ3 writer does."""
    t0 = np.asarray(t_min_s, dtype=np.int64)
    t1 = np.asarray(t_max_s, dtype=np.int64)
    week = t0 // SECONDS_PER_WEEK
    f0 = (t0 - week * SECONDS_PER_WEEK).astype(np.float64) / SECONDS_PER_WEEK
    f1 = np.clip(
        (t1 - week * SECONDS_PER_WEEK).astype(np.float64) / SECONDS_PER_WEEK, 0.0, 1.0
    )
    nx = (np.asarray(min_lon, dtype=np.float64) + 180.0) / 360.0
    ny = (np.asarray(min_lat, dtype=np.float64) + 90.0) / 180.0
    mx = (np.asarray(max_lon, dtype=np.float64) + 180.0) / 360.0
    my = (np.asarray(max_lat, dtype=np.float64) + 90.0) / 180.0
    mins = np.clip(np.stack([nx, ny, f0]), 0.0, 1.0)
    maxs = np.clip(np.stack([mx, my, f1]), 0.0, 1.0)
    length = _xz_length(mins, maxs, g)
    cs = _xz_sequence_code(mins, length, g, 3)
    return ((week.astype(np.int64)) << 44) | cs


def _xz_ranges(
    qmins, qmaxs, g: int, dims: int, max_level: int = 7
) -> list[tuple[int, int]]:
    """Candidate code ranges for a query window (normalized [0,1]^dims):
    recursive tree descent — an element whose ENLARGED cell is contained
    in the window contributes its whole subtree range; one that merely
    intersects contributes itself and recurses. Recursion caps at
    ``max_level`` (window-BOUNDARY elements grow as (2^level)^(dims-1),
    so uncapped descent to g=12 explodes; boundary elements at the cap
    emit their whole subtree — an over-covering range, the same
    precision/range-count trade the reference's curve makes). Superset
    guarantee either way: any object intersecting the window has a key
    inside some range."""
    base = 1 << dims
    out: list[tuple[int, int]] = []

    def rec(code: int, lo: list[float], size: float, level: int) -> None:
        # enlarged cell = [lo, lo + 2*size) per dim
        for d in range(dims):
            if qmins[d] >= lo[d] + 2 * size or qmaxs[d] <= lo[d]:
                return  # disjoint from every object stored here
        contained = all(
            lo[d] >= qmins[d] and lo[d] + 2 * size <= qmaxs[d] for d in range(dims)
        )
        interval = (base ** (g - level + 1) - 1) // (base - 1) - 1
        if contained or level >= min(g, max_level):
            out.append((code, code + interval))
            return
        out.append((code, code))  # the element itself holds large objects
        step = (base ** (g - level) - 1) // (base - 1)
        for q in range(base):
            child_lo = [
                lo[d] + (size / 2.0 if (q >> d) & 1 else 0.0) for d in range(dims)
            ]
            rec(code + 1 + q * step, child_lo, size / 2.0, level + 1)

    rec(0, [0.0] * dims, 1.0, 0)
    # root code 0 duplicates: merge adjacent/overlapping ranges
    out.sort()
    merged: list[tuple[int, int]] = []
    for a, b in out:
        if merged and a <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    return merged


def xz2_ranges(min_lon, min_lat, max_lon, max_lat, g: int = XZ_G) -> list[tuple[int, int]]:
    q0 = [(min_lon + 180.0) / 360.0, (min_lat + 90.0) / 180.0]
    q1 = [(max_lon + 180.0) / 360.0, (max_lat + 90.0) / 180.0]
    return _xz_ranges(q0, q1, g, 2)


def xz3_ranges(
    min_lon, min_lat, max_lon, max_lat, t_min_s, t_max_s, g: int = XZ_G
) -> list[tuple[int, int]]:
    """Ranges per overlapped weekly period (period in the key's high bits)."""
    w0 = int(t_min_s) // SECONDS_PER_WEEK
    w1 = int(t_max_s) // SECONDS_PER_WEEK
    out: list[tuple[int, int]] = []
    for w in range(w0, w1 + 1):
        f0 = max(0.0, (t_min_s - w * SECONDS_PER_WEEK) / SECONDS_PER_WEEK)
        f1 = min(1.0, (t_max_s - w * SECONDS_PER_WEEK) / SECONDS_PER_WEEK)
        q0 = [(min_lon + 180.0) / 360.0, (min_lat + 90.0) / 180.0, f0]
        q1 = [(max_lon + 180.0) / 360.0, (max_lat + 90.0) / 180.0, f1]
        hi = w << 44
        out.extend((hi | a, hi | b) for a, b in _xz_ranges(q0, q1, XZ_G, 3))
    return out
