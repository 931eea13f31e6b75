"""S2 cell-id encoding/decoding, vectorized NumPy.

The cube-face geometry (face selection by largest |XYZ| component,
face UV <-> XYZ frames, and the quadratic ST<->UV curve) follows the
S2 math present in the reference (/root/reference/src/projections/
s2.cpp:105-253: GetFace :226-243, FaceUVtoXYZ :171-186,
ValidFaceXYZtoUV :192-220, STtoUV/UVtoST quadratic :126-169).
The Hilbert-curve cell-id layout (3 face bits + 60 position bits +
sentinel bit) follows the public S2 geometry spec; the reference does
not contain the cell-id integer encoding, only the projection math.

Cell ids are int64 (top bit never set: face <= 5). Level 0..30.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LIMIT_IJ = 1 << MAX_LEVEL
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell orderings (public S2 spec)
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENTATION = (_SWAP, 0, 0, _INVERT + _SWAP)

_LOOKUP_BITS = 4


def _build_lookup():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def rec(level, i, j, orig, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) | j
            lookup_pos[(ij << 2) | orig] = (pos << 2) | orient
            lookup_ij[(pos << 2) | orig] = (ij << 2) | orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for index in range(4):
            ij = r[index]
            rec(level, i + (ij >> 1), j + (ij & 1), orig, pos + index,
                orient ^ _POS_TO_ORIENTATION[index])

    for orig in (0, _SWAP, _INVERT, _SWAP | _INVERT):
        rec(0, 0, 0, orig, 0, orig)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


# ---------------- geometry (vectorized; mirrors s2.cpp) -----------------

def lonlat_to_xyz(lon_rad, lat_rad):
    cosl = np.cos(lat_rad)
    return np.cos(lon_rad) * cosl, np.sin(lon_rad) * cosl, np.sin(lat_rad)


def xyz_to_face_uv(x, y, z):
    """GetFace + ValidFaceXYZtoUV (s2.cpp:226-253), vectorized.

    Numerators/denominator are gathered per point instead of
    evaluating all six ratios (6x less arithmetic + memory traffic —
    this encoder is the hot loop of the tiling path)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    pface = np.choose(face, [x, y, z])
    face = np.where(pface < 0, face + 3, face)
    nx, ny, nz = -x, -y, -z
    # u = [y/x, -x/y, -x/z, z/x, z/y, -y/z][face]
    u_num = np.choose(face, [y, nx, nx, z, z, ny])
    v_num = np.choose(face, [z, z, ny, y, nx, nx])
    den = np.choose(face, [x, y, z, x, y, z])
    with np.errstate(invalid="ignore", divide="ignore"):
        # true division (not reciprocal-multiply): bit-parity with the
        # oracle's y/x etc. must hold
        u = u_num / den
        v = v_num / den
    return face, u, v


def face_uv_to_xyz(face, u, v):
    """FaceUVtoXYZ (s2.cpp:171-186), vectorized."""
    one = np.ones_like(u)
    x = np.choose(face, [one, -u, -u, -one, v, v])
    y = np.choose(face, [u, one, -v, -v, -one, u])
    z = np.choose(face, [v, v, one, -u, -u, -one])
    return x, y, z


def st_to_uv(s):
    """Quadratic curve (s2.cpp:131-136)."""
    return np.where(
        s >= 0.5, (1.0 / 3) * (4 * s * s - 1), (1.0 / 3) * (1 - 4 * (1 - s) * (1 - s))
    )


def uv_to_st(u):
    """Quadratic inverse (s2.cpp:154-158)."""
    with np.errstate(invalid="ignore"):  # both np.where branches evaluate
        return np.where(
            u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(1 - 3 * u)
        )


def st_to_ij(s):
    return np.clip(np.floor(_LIMIT_IJ * s), 0, _LIMIT_IJ - 1).astype(np.int64)


# ---------------- cell ids ----------------------------------------------

def from_face_ij(face, i, j):
    """Leaf cell id from (face, i, j); Hilbert lookup in 4-bit nibbles.

    ids are returned as int64 (faces 4-5 set bit 63, hence negative
    values — fine for join keys; decode uses logical shifts)."""
    face = np.asarray(face, dtype=np.int64)
    n = (face.astype(np.uint64)) << np.uint64(60)
    bits = face & _SWAP
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= bits.astype(np.uint64) >> np.uint64(2) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return (n * np.uint64(2) + np.uint64(1)).view(np.int64)


def to_face_ij(cell_id):
    """Decode leaf-aligned id -> (face, i, j) of its min leaf."""
    cid_u = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    face = (cid_u >> np.uint64(61)).astype(np.int64)
    n = (cid_u >> np.uint64(1)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros(face.shape, dtype=np.int64)
    j = np.zeros(face.shape, dtype=np.int64)
    for k in range(7, -1, -1):
        # the top chunk holds only 2 levels (i/j are 30 = 7*4+2 bits);
        # zero-extension through the lookup table is exact because the
        # Hilbert pos-0 orientation flips cancel pairwise
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        bits += ((n >> (k * 2 * _LOOKUP_BITS)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


def lsb_for_level(level):
    return np.int64(1) << (2 * (MAX_LEVEL - np.asarray(level)))


def parent(cell_id, level):
    """Ancestor cell at `level` (id & -new_lsb) | new_lsb."""
    new_lsb = lsb_for_level(level)
    return (np.asarray(cell_id, dtype=np.int64) & (-new_lsb)) | new_lsb


def level_of(cell_id):
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = cell_id & (-cell_id)
    # level = 30 - (number of trailing zero bit-pairs)
    tz = np.zeros_like(cell_id)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (v & ((np.int64(1) << shift) - 1)) == 0
        tz = np.where(m & (v != 0), tz + shift, tz)
        v = np.where(m, v >> shift, v)
    return MAX_LEVEL - tz // 2


def cell_id(lon_deg, lat_deg, level=MAX_LEVEL):
    """lon/lat degrees -> S2 cell id at `level` (the headline encoder)."""
    lon = np.asarray(lon_deg, dtype=np.float64) * (np.pi / 180.0)
    lat = np.asarray(lat_deg, dtype=np.float64) * (np.pi / 180.0)
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    leaf = from_face_ij(face, i, j)
    if level >= MAX_LEVEL:
        return leaf
    return parent(leaf, level)


def cell_center(cell_id_arr):
    """Cell center -> (lon_deg, lat_deg)."""
    cell_id_arr = np.asarray(cell_id_arr, dtype=np.int64)
    face, i, j = to_face_ij(cell_id_arr)
    lsb = cell_id_arr & (-cell_id_arr)
    # center leaf coordinates: the decoded (i,j) is the min leaf; the
    # cell spans size = sqrt(lsb*2... ) use si/ti: size = 1 << (30-level)
    lvl = level_of(cell_id_arr)
    size = np.int64(1) << (MAX_LEVEL - lvl)
    ic = (i & ~(size - 1)) + size // 2
    jc = (j & ~(size - 1)) + size // 2
    # leaf cells: center of the leaf
    ic = np.where(lvl == MAX_LEVEL, i, ic)
    jc = np.where(lvl == MAX_LEVEL, j, jc)
    s = (ic.astype(np.float64) + 0.5) / _LIMIT_IJ
    t = (jc.astype(np.float64) + 0.5) / _LIMIT_IJ
    u = st_to_uv(s)
    v = st_to_uv(t)
    x, y, z = face_uv_to_xyz(face, u, v)
    lon = np.arctan2(y, x) * (180.0 / np.pi)
    lat = np.arctan2(z, np.hypot(x, y)) * (180.0 / np.pi)
    return lon, lat


def cover_bbox(lon_min, lat_min, lon_max, lat_max, level, pad_cells=1.0):
    """Conservative cell cover of a lon/lat bbox at `level`: every
    level-`level` cell intersecting the bbox is returned (a superset
    cover; exactness of the PIP join is restored by the ray-cast test).

    Strategy: rasterize the padded bbox at a step smaller than the
    minimum cell extent and dedupe cell ids.  Replaces PROJ's quadtree
    rectangle search (/root/reference/src/quadtree.hpp:60+) with
    cell-prefix partitioning, per SURVEY.md §2.2.
    """
    # min cell extent in degrees: S2 min edge ~ 0.21 * 2^-level rad
    min_edge_deg = 0.21 * (2.0 ** -level) * 180.0 / np.pi
    coslat = max(0.05, np.cos(np.deg2rad(min(abs(lat_min), abs(lat_max))
                                         if lat_min * lat_max > 0 else 0.0)))
    pad = pad_cells * min_edge_deg
    lo_step = min_edge_deg / 2.0 / coslat
    la_step = min_edge_deg / 2.0
    lons = np.arange(lon_min - pad, lon_max + pad + lo_step, lo_step)
    lats = np.arange(max(-90.0, lat_min - pad), min(90.0, lat_max + pad) + la_step, la_step)
    LO, LA = np.meshgrid(lons, lats)
    ids = cell_id(LO.ravel(), LA.ravel(), level)
    return np.unique(ids)
