"""H3-style hexagonal discrete global grid: icosahedral gnomonic
faces + aperture-7 hexagonal hierarchy, vectorized NumPy.

Algorithmic structure follows the public H3 design (and the ISEA
icosahedral family present in the reference,
/root/reference/src/projections/isea.cpp):

  1. find the icosahedron face whose center is nearest the point
     (max dot product over the 20 face centers);
  2. gnomonically project onto the face plane
     (the reference implements exactly this projection:
     /root/reference/src/projections/gnom.cpp);
  3. convert the planar offset to axial hex coordinates (q, r) on an
     aperture-7 grid at resolution `res`: the res-(r+1) grid is the
     res-r grid scaled by sqrt(7) and rotated by atan(sqrt(3)/5)
     ~ 19.106... degrees (Class II/III alternation);
  4. pack (face, res, q, r) into an int64 index; parents are computed
     by re-encoding the cell center at the coarser resolution
     (aperture-7 hex hierarchies have no exact containment — same as
     canonical H3, where a child may protrude from its parent).

NOT bit-compatible with the canonical `h3` library (whose 122
base-cell numbering/orientation tables aren't reproducible in this
offline sandbox); determinism, hierarchy and locality are tested by
invariants in tests/test_hexdggs.py.  The bit-exact production cell
index of this engine is S2 (index/s2.py) — this module supplies the
hex-grid alternative with H3's operational shape (encode / parent /
kRing / cell center).
"""

from __future__ import annotations

import math

import numpy as np

PHI = (1.0 + math.sqrt(5.0)) / 2.0

# aperture-7 rotation: atan2(sqrt(3), 5) / ... the canonical
# Class II->III rotation angle for aperture 7 is atan(sqrt(3)/5)
ROT7 = math.atan2(math.sqrt(3.0), 5.0)
SQRT7 = math.sqrt(7.0)

MAX_RES = 15


def _icosahedron():
    """12 vertices / 20 faces of the unit icosahedron; face centers
    and per-face orthonormal tangent frames."""
    v = []
    for a in (-1.0, 1.0):
        for b in (-PHI, PHI):
            v.append((0.0, a, b))
            v.append((a, b, 0.0))
            v.append((b, 0.0, a))
    verts = np.unique(np.array(v, dtype=np.float64).round(12), axis=0)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    # faces: triples of mutually-nearest vertices (edge length of unit
    # icosahedron = 2/sqrt(phi^2+1) after normalization)
    d = verts @ verts.T
    edge_cos = np.sort(np.unique(d.round(9)))[-2]  # largest non-self dot
    faces = []
    n = len(verts)
    for i in range(n):
        for j in range(i + 1, n):
            if not np.isclose(d[i, j], edge_cos, atol=1e-6):
                continue
            for k in range(j + 1, n):
                if (np.isclose(d[i, k], edge_cos, atol=1e-6)
                        and np.isclose(d[j, k], edge_cos, atol=1e-6)):
                    faces.append((i, j, k))
    assert len(faces) == 20, f"expected 20 faces, got {len(faces)}"
    centers = np.array([verts[list(f)].mean(axis=0) for f in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # deterministic face order: sort by (z, y, x) rounded
    order = np.lexsort((centers[:, 0].round(9), centers[:, 1].round(9),
                        centers[:, 2].round(9)))
    centers = centers[order]
    faces = [faces[o] for o in order]
    # tangent frame per face: u along (v0 - center) projected, w = c x u
    us, ws = [], []
    for f, c in zip(faces, centers):
        a = verts[f[0]] - c
        a -= c * (a @ c)
        a /= np.linalg.norm(a)
        w = np.cross(c, a)
        us.append(a)
        ws.append(w)
    return verts, np.array(faces), centers, np.array(us), np.array(ws)


_VERTS, _FACES, _CENTERS, _U, _W = _icosahedron()

# hexagon circumradius at res 0 on the gnomonic plane: the icosahedron
# face inradius (plane units) over ~1 — chosen so one res-0 hex covers
# a face generously; finer cells shrink by sqrt(7) per res
_R0 = 0.40


def _rot(res: int) -> np.ndarray:
    ang = res * ROT7
    c, s = math.cos(ang), math.sin(ang)
    return np.array([[c, -s], [s, c]])


def lonlat_to_xyz(lon_deg, lat_deg):
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    return np.stack([np.cos(lon) * cl, np.sin(lon) * cl, np.sin(lat)],
                    axis=-1)


def _hex_round(qf, rf):
    """Cube-coordinate rounding of fractional axial coords."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.round(xf)
    ry = np.round(yf)
    rz = np.round(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def encode(lon_deg, lat_deg, res: int):
    """(lon, lat) degrees -> int64 hex cell index at resolution
    0 <= res <= 15.

    Layout: [4 bits res][5 bits face][27 bits q+OFF][27 bits r+OFF]
    (q, r bounded well inside 2^26 for res <= 15: sqrt(7)^15 ~ 2.1e6).
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError("res out of range")
    xyz = lonlat_to_xyz(lon_deg, lat_deg)
    dots = xyz @ _CENTERS.T
    face = np.argmax(dots, axis=-1).astype(np.int64)
    c = _CENTERS[face]
    # gnomonic projection onto the tangent plane at the face center
    # (gnom.cpp semantics: scale by 1/cos(angular distance))
    denom = np.sum(xyz * c, axis=-1)
    p = xyz / denom[..., None] - c
    x = np.sum(p * _U[face], axis=-1)
    y = np.sum(p * _W[face], axis=-1)
    # rotate into the res grid frame and scale
    R = _rot(res)
    size = _R0 / (SQRT7 ** res)
    xr = (R[0, 0] * x + R[0, 1] * y) / size
    yr = (R[1, 0] * x + R[1, 1] * y) / size
    # axial coords for pointy-top hexes: q = (sqrt(3)/3 x - 1/3 y),
    # r = 2/3 y
    qf = (math.sqrt(3.0) / 3.0) * xr - (1.0 / 3.0) * yr
    rf = (2.0 / 3.0) * yr
    q, r = _hex_round(qf, rf)
    OFF = 1 << 26
    return ((np.int64(res) << np.int64(59))
            | (face << np.int64(54))
            | ((q + OFF) << np.int64(27))
            | (r + OFF))


def decode(cell):
    """int64 index -> (res, face, q, r)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(59)) & np.int64(0xF)
    face = (cell >> np.int64(54)) & np.int64(0x1F)
    OFF = 1 << 26
    q = ((cell >> np.int64(27)) & np.int64((1 << 27) - 1)) - OFF
    r = (cell & np.int64((1 << 27) - 1)) - OFF
    return res.astype(np.int64), face.astype(np.int64), q, r


def cell_center(cell):
    """Hex cell -> (lon_deg, lat_deg) of its center."""
    res, face, q, r = decode(cell)
    size = _R0 / (SQRT7 ** res.astype(np.float64))
    # axial -> plane (pointy-top): x = sqrt(3) (q + r/2), y = 3/2 r
    xr = math.sqrt(3.0) * (q + 0.5 * r)
    yr = 1.5 * r
    xs = xr * size
    ys = yr * size
    out = np.empty((cell.shape[0] if cell.ndim else 1, 3))
    # un-rotate per res value (res is small-cardinality)
    x = np.empty_like(xs)
    y = np.empty_like(ys)
    for rv in np.unique(res):
        R = _rot(int(rv))
        m = res == rv
        x[m] = R[0, 0] * xs[m] + R[1, 0] * ys[m]
        y[m] = R[0, 1] * xs[m] + R[1, 1] * ys[m]
    c = _CENTERS[face]
    p = c + x[..., None] * _U[face] + y[..., None] * _W[face]
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    lon = np.degrees(np.arctan2(p[..., 1], p[..., 0]))
    lat = np.degrees(np.arcsin(np.clip(p[..., 2], -1.0, 1.0)))
    return lon, lat


def parent(cell, parent_res: int):
    """Ancestor at `parent_res`: re-encode the center at coarser res
    (aperture-7 'approximate containment', as in canonical H3)."""
    lon, lat = cell_center(np.asarray(cell, dtype=np.int64))
    return encode(lon, lat, parent_res)


def k_ring_offsets(k: int) -> np.ndarray:
    """Axial offsets of the hex k-ring disc (1 + 3k(k+1) cells)."""
    out = [(0, 0)]
    for ring in range(1, k + 1):
        q, r = ring, 0
        for dq, dr in ((-1, 1), (-1, 0), (0, -1), (1, -1), (1, 0), (0, 1)):
            for _ in range(ring):
                out.append((q, r))
                q += dq
                r += dr
    return np.array(out, dtype=np.int64)


def k_ring(cell, k: int = 1):
    """Disc of cells within k hex steps (same face; cells whose
    neighbors cross a face edge are handled by re-encoding centers,
    which may land on the adjacent face)."""
    cell = np.asarray(cell, dtype=np.int64)
    res, face, q, r = decode(cell)
    offs = k_ring_offsets(k)
    OFF = 1 << 26
    qs = q[..., None] + offs[:, 0]
    rs = r[..., None] + offs[:, 1]
    ids = ((res[..., None] << np.int64(59))
           | (face[..., None] << np.int64(54))
           | ((qs + OFF) << np.int64(27))
           | (rs + OFF))
    # normalize across face edges: re-encode each neighbor's center
    lon, lat = cell_center(ids.ravel())
    return encode(lon, lat, int(res.flat[0])).reshape(ids.shape)
