"""Fuller Airocean / Dymaxion projection.

Vectorized NumPy re-derivation of
/root/reference/src/projections/airocean.cpp:
- 23-face (icosahedron + Australia/Japan subfaces) point location via
  signed determinants (:633-656)
- gnomonic projection onto the face plane (cartesian_to_ico, :686-703)
- per-face affine into the unfolded net (ico_to_dym / dym_to_ico) and
  the optional horizontal orientation transform

Constant tables (Gray 1995 exact transformation parameters) live in
airocean_data.py, transcribed from the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .airocean_data import (BASE_AIR_ICO_TRANS, BASE_AIROCEAN_FACES,
                            BASE_ICO_AIR_TRANS, BASE_ICO_CENTERS,
                            BASE_ICO_FACES, BASE_ICO_NORMALS,
                            ORIENT_HORIZONTAL_INV_TRANS,
                            ORIENT_HORIZONTAL_TRANS)

HALFPI = 0.5 * np.pi


@dataclass(frozen=True)
class AiroceanConsts:
    ico_faces: np.ndarray
    ico_centers: np.ndarray
    ico_normals: np.ndarray
    air_faces: np.ndarray
    ico_air: np.ndarray
    air_ico: np.ndarray
    es: float
    one_minus_f: float
    a: float
    b: float


def setup(params: dict, ell) -> AiroceanConsts:
    """airocean.cpp PJ_PROJECTION: +orient=vertical (default) or
    horizontal."""
    orient = params.get("orient", "vertical")
    if orient not in ("vertical", "horizontal"):
        raise ValueError("airocean: orient should be vertical or horizontal")
    ico_air = BASE_ICO_AIR_TRANS.copy()
    air_ico = BASE_AIR_ICO_TRANS.copy()
    air_faces = BASE_AIROCEAN_FACES.copy()
    if orient == "horizontal":
        m = ORIENT_HORIZONTAL_TRANS
        inv_m = ORIENT_HORIZONTAL_INV_TRANS
        ico_air = np.einsum("ij,fjk->fik", m, BASE_ICO_AIR_TRANS)
        air_ico = np.einsum("fij,jk->fik", BASE_AIR_ICO_TRANS, inv_m)
        # transform face vertices (affine on (x, y, z) with w=1)
        v = BASE_AIROCEAN_FACES  # (23, 3, 3)
        air_faces = np.einsum("ij,fvj->fvi", m[:3, :3], v) + m[:3, 3]
    b = ell.a * np.sqrt(1.0 - ell.es)
    omf = 1.0 - (ell.a - b) / ell.a
    return AiroceanConsts(ico_faces=BASE_ICO_FACES,
                          ico_centers=BASE_ICO_CENTERS,
                          ico_normals=BASE_ICO_NORMALS,
                          air_faces=air_faces, ico_air=ico_air,
                          air_ico=air_ico, es=ell.es,
                          one_minus_f=float(omf), a=ell.a, b=float(b))


def _det3(ux, uy, uz, vx, vy, vz, wx, wy, wz):
    return (ux * (vy * wz - vz * wy) - vx * (uy * wz - uz * wy)
            + wx * (uy * vz - uz * vy))


def _face_index(faces: np.ndarray, px, py, pz):
    """get_ico_face_index / get_dym_face_index: first face whose three
    signed determinants are all <= 0."""
    idx = np.full(px.shape, 23, dtype=np.int64)
    todo = np.ones(px.shape, dtype=bool)
    for i in range(23):
        if not todo.any():
            break
        p1, p2, p3 = faces[i]
        d1 = _det3(px, py, pz, p2[0], p2[1], p2[2], p3[0], p3[1], p3[2])
        d2 = _det3(p1[0], p1[1], p1[2], px, py, pz, p3[0], p3[1], p3[2])
        d3 = _det3(p1[0], p1[1], p1[2], p2[0], p2[1], p2[2], px, py, pz)
        hit = todo & (d1 <= 0) & (d2 <= 0) & (d3 <= 0)
        idx = np.where(hit, i, idx)
        todo = todo & ~hit
    return idx


def fwd(lam, phi, C: AiroceanConsts):
    """airocean.cpp airocean_forward."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.es != 0.0:
            lat = np.arctan(C.one_minus_f * C.one_minus_f * np.tan(phi))
        else:
            lat = phi
        coslat = np.cos(lat)
        x = coslat * np.cos(lam)
        y = coslat * np.sin(lam)
        z = np.sin(lat)
        fid = _face_index(C.ico_faces, x, y, z)
        ok = fid < 23
        fi = np.minimum(fid, 22)
        centers = C.ico_centers[fi]
        normals = C.ico_normals[fi]
        a = 1.0 - (centers[..., 0] * normals[..., 0]
                   + centers[..., 1] * normals[..., 1]
                   + centers[..., 2] * normals[..., 2]) \
            / (x * normals[..., 0] + y * normals[..., 1]
               + z * normals[..., 2])
        ix = x - a * x
        iy = y - a * y
        iz = z - a * z
        M = C.ico_air[fi]
        xo = M[..., 0, 0] * ix + M[..., 0, 1] * iy + M[..., 0, 2] * iz \
            + M[..., 0, 3]
        yo = M[..., 1, 0] * ix + M[..., 1, 1] * iy + M[..., 1, 2] * iz \
            + M[..., 1, 3]
    return np.where(ok, xo, np.nan), np.where(ok, yo, np.nan)


def inv(x, y, C: AiroceanConsts):
    """airocean.cpp airocean_inverse."""
    with np.errstate(invalid="ignore", divide="ignore"):
        one = np.ones_like(x)
        fid = _face_index(C.air_faces, x, y, one)
        ok = fid < 23
        fi = np.minimum(fid, 22)
        M = C.air_ico[fi]
        sx = M[..., 0, 0] * x + M[..., 0, 1] * y + M[..., 0, 3]
        sy = M[..., 1, 0] * x + M[..., 1, 1] * y + M[..., 1, 3]
        sz = M[..., 2, 0] * x + M[..., 2, 1] * y + M[..., 2, 3]
        norm = np.sqrt(sx * sx + sy * sy + sz * sz)
        q = sx / norm
        r = sy / norm
        s = sz / norm
        phi = np.arccos(np.clip(-s, -1.0, 1.0)) - HALFPI
        lam = np.arctan2(r, q)
        if C.es != 0.0:
            invert = phi < 0.0
            tanphi = np.tan(phi)
            xa = C.b / np.sqrt(tanphi * tanphi
                               + C.one_minus_f * C.one_minus_f)
            phi = np.arctan(np.sqrt(np.clip(C.a * C.a - xa * xa, 0, None))
                            / (C.one_minus_f * xa))
            phi = np.where(invert, -phi, phi)
    return np.where(ok, lam, np.nan), np.where(ok, phi, np.nan)
