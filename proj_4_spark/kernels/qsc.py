"""Quadrilateralized Spherical Cube (qsc) — the COBE cube-face
projection.

Vectorized NumPy re-derivation of /root/reference/src/projections/qsc.cpp:
- face selection from (lam0, phi0):  :310-331
- forward (geocentric-lat shift, per-face theta/phi, area fold,
  mu/nu):                            :66-180
- inverse (area unfold, unit-sphere rotation back):  :182-308

The face is a per-operation scalar; the 4 areas are per-point masks.
(lam, phi) radians relative to lam0 in; (x, y) in units of a out.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import FORTPI, HALFPI

EPS10 = 1e-10
TWOPI = 2.0 * np.pi

FACE_FRONT, FACE_RIGHT, FACE_BACK, FACE_LEFT, FACE_TOP, FACE_BOTTOM = range(6)


@dataclass(frozen=True)
class QscConsts:
    face: int
    es: float
    a: float
    b: float
    one_minus_f: float
    one_minus_f_squared: float


def setup(ell, lam0: float, phi0: float) -> QscConsts:
    """qsc.cpp:310-341."""
    if phi0 >= HALFPI - FORTPI / 2.0:
        face = FACE_TOP
    elif phi0 <= -(HALFPI - FORTPI / 2.0):
        face = FACE_BOTTOM
    elif abs(lam0) <= FORTPI:
        face = FACE_FRONT
    elif abs(lam0) <= HALFPI + FORTPI:
        face = FACE_RIGHT if lam0 > 0.0 else FACE_LEFT
    else:
        face = FACE_BACK
    b = ell.a * np.sqrt(1.0 - ell.es)
    omf = 1.0 - (ell.a - b) / ell.a
    return QscConsts(face=face, es=ell.es, a=ell.a, b=float(b),
                     one_minus_f=float(omf),
                     one_minus_f_squared=float(omf * omf))


def _shift_lon(lon, offset):
    s = lon + offset
    s = np.where(s < -np.pi, s + TWOPI, s)
    s = np.where(s > np.pi, s - TWOPI, s)
    return s


def _equat_face_theta(phi, y, x):
    """qsc.cpp:37-54: fold atan2(y, x) into area 0..3 and the local
    theta; returns (theta, area)."""
    th = np.arctan2(y, x)
    area = np.zeros(th.shape, dtype=np.int64)
    a1 = (th > FORTPI) & (th <= HALFPI + FORTPI)
    a2 = (th > HALFPI + FORTPI) | (th <= -(HALFPI + FORTPI))
    a3 = ~a1 & ~a2 & ~(np.abs(th) <= FORTPI)
    theta = th.copy()
    theta = np.where(a1, th - HALFPI, theta)
    theta = np.where(a2, np.where(th >= 0.0, th - np.pi, th + np.pi), theta)
    theta = np.where(a3, th + HALFPI, theta)
    area = np.where(a1, 1, area)
    area = np.where(a2, 2, area)
    area = np.where(a3, 3, area)
    small = phi < EPS10
    theta = np.where(small, 0.0, theta)
    area = np.where(small, 0, area)
    return theta, area


def fwd(lam, phi_in, C: QscConsts):
    """qsc.cpp:66-180."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.es != 0.0:
            lat = np.arctan(C.one_minus_f_squared * np.tan(phi_in))
        else:
            lat = phi_in
        lon = lam
        if C.face == FACE_TOP:
            phi = HALFPI - lat
            a0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
            a1 = (lon > HALFPI + FORTPI) | (lon <= -(HALFPI + FORTPI))
            a2 = (lon > -(HALFPI + FORTPI)) & (lon <= -FORTPI)
            theta = np.where(
                a0, lon - HALFPI,
                np.where(a1, np.where(lon > 0.0, lon - np.pi, lon + np.pi),
                         np.where(a2, lon + HALFPI, lon)))
            area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
        elif C.face == FACE_BOTTOM:
            phi = HALFPI + lat
            a0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
            a1 = (lon < FORTPI) & (lon >= -FORTPI)
            a2 = (lon < -FORTPI) & (lon >= -(HALFPI + FORTPI))
            theta = np.where(
                a0, -lon + HALFPI,
                np.where(a1, -lon,
                         np.where(a2, -lon - HALFPI,
                                  np.where(lon > 0.0, -lon + np.pi,
                                           -lon - np.pi))))
            area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
        else:
            if C.face == FACE_RIGHT:
                lon = _shift_lon(lon, HALFPI)
            elif C.face == FACE_BACK:
                lon = _shift_lon(lon, np.pi)
            elif C.face == FACE_LEFT:
                lon = _shift_lon(lon, -HALFPI)
            sinlat = np.sin(lat)
            coslat = np.cos(lat)
            sinlon = np.sin(lon)
            coslon = np.cos(lon)
            q = coslat * coslon
            r = coslat * sinlon
            s = sinlat
            if C.face == FACE_FRONT:
                phi = np.arccos(np.clip(q, -1, 1))
                theta, area = _equat_face_theta(phi, s, r)
            elif C.face == FACE_RIGHT:
                phi = np.arccos(np.clip(r, -1, 1))
                theta, area = _equat_face_theta(phi, s, -q)
            elif C.face == FACE_BACK:
                phi = np.arccos(np.clip(-q, -1, 1))
                theta, area = _equat_face_theta(phi, s, -r)
            else:  # FACE_LEFT
                phi = np.arccos(np.clip(-r, -1, 1))
                theta, area = _equat_face_theta(phi, s, q)
        mu = np.arctan((12.0 / np.pi)
                       * (theta + np.arccos(np.clip(
                           np.sin(theta) * np.cos(FORTPI), -1, 1))
                          - HALFPI))
        t = np.sqrt(np.clip(
            (1.0 - np.cos(phi))
            / (np.cos(mu) * np.cos(mu))
            / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))), 0.0, None))
        mu = mu + np.where(area == 1, HALFPI,
                           np.where(area == 2, np.pi,
                                    np.where(area == 3, np.pi + HALFPI,
                                             0.0)))
        x = t * np.cos(mu)
        y = t * np.sin(mu)
    return x, y


def inv(x, y, C: QscConsts):
    """qsc.cpp:182-308."""
    with np.errstate(invalid="ignore", divide="ignore"):
        nu = np.arctan(np.sqrt(x * x + y * y))
        mu = np.arctan2(y, x)
        a0 = (x >= 0.0) & (x >= np.abs(y))
        a1 = ~a0 & (y >= 0.0) & (y >= np.abs(x))
        a2 = ~a0 & ~a1 & (x < 0.0) & (-x >= np.abs(y))
        a3 = ~a0 & ~a1 & ~a2
        area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
        mu = np.where(a1, mu - HALFPI, mu)
        mu = np.where(a2, np.where(mu < 0.0, mu + np.pi, mu - np.pi), mu)
        mu = np.where(a3, mu + HALFPI, mu)
        t = (np.pi / 12.0) * np.tan(mu)
        tantheta = np.sin(t) / (np.cos(t) - 1.0 / np.sqrt(2.0))
        theta = np.arctan(tantheta)
        cosmu = np.cos(mu)
        tannu = np.tan(nu)
        cosphi = 1.0 - cosmu * cosmu * tannu * tannu * (
            1.0 - np.cos(np.arctan(1.0 / np.cos(theta))))
        cosphi = np.clip(cosphi, -1.0, 1.0)
        if C.face == FACE_TOP:
            phi = np.arccos(cosphi)
            out_phi = HALFPI - phi
            out_lam = np.where(
                area == 0, theta + HALFPI,
                np.where(area == 1,
                         np.where(theta < 0.0, theta + np.pi,
                                  theta - np.pi),
                         np.where(area == 2, theta - HALFPI, theta)))
        elif C.face == FACE_BOTTOM:
            phi = np.arccos(cosphi)
            out_phi = phi - HALFPI
            out_lam = np.where(
                area == 0, -theta + HALFPI,
                np.where(area == 1, -theta,
                         np.where(area == 2, -theta - HALFPI,
                                  np.where(theta < 0.0, -theta - np.pi,
                                           -theta + np.pi))))
        else:
            q = cosphi
            t2 = q * q
            s = np.where(t2 >= 1.0, 0.0,
                         np.sqrt(np.clip(1.0 - t2, 0, None))
                         * np.sin(theta))
            t2 = t2 + s * s
            r = np.where(t2 >= 1.0, 0.0, np.sqrt(np.clip(1.0 - t2, 0, None)))
            # rotate into the area
            r1 = np.where(area == 1, -s, np.where(area == 2, -r,
                          np.where(area == 3, s, r)))
            s1 = np.where(area == 1, r, np.where(area == 2, -s,
                          np.where(area == 3, -r, s)))
            r, s = r1, s1
            # rotate into the face
            if C.face == FACE_RIGHT:
                q, r = -r, q
            elif C.face == FACE_BACK:
                q, r = -q, -r
            elif C.face == FACE_LEFT:
                q, r = r, -q
            out_phi = np.arccos(np.clip(-s, -1, 1)) - HALFPI
            out_lam = np.arctan2(r, q)
            if C.face == FACE_RIGHT:
                out_lam = _shift_lon(out_lam, -HALFPI)
            elif C.face == FACE_BACK:
                out_lam = _shift_lon(out_lam, -np.pi)
            elif C.face == FACE_LEFT:
                out_lam = _shift_lon(out_lam, HALFPI)
        if C.es != 0.0:
            invert = out_phi < 0.0
            tanphi = np.tan(out_phi)
            xa = C.b / np.sqrt(tanphi * tanphi + C.one_minus_f_squared)
            out_phi = np.arctan(
                np.sqrt(np.clip(C.a * C.a - xa * xa, 0, None))
                / (C.one_minus_f * xa))
            out_phi = np.where(invert, -out_phi, out_phi)
    return out_lam, out_phi


# ------------------------------------------------------------------- s2

# ValidFaceXYZtoUV / FaceUVtoXYZ (s2.cpp:95-140; standard S2 layout)

def _face_xyz_to_uv(face: int, x, y, z):
    if face == FACE_FRONT:
        return y / x, z / x
    if face == FACE_RIGHT:
        return -x / y, z / y
    if face == FACE_TOP:
        return -x / z, -y / z
    if face == FACE_BACK:
        return z / x, y / x
    if face == FACE_LEFT:
        return z / y, -x / y
    return -y / z, -x / z  # bottom


def _face_uv_to_xyz(face: int, u, v):
    one = np.ones_like(u)
    if face == FACE_FRONT:
        return one, u, v
    if face == FACE_RIGHT:
        return -u, one, v
    if face == FACE_TOP:
        return -u, -v, one
    if face == FACE_BACK:
        return -one, -v, -u
    if face == FACE_LEFT:
        return v, -one, -u
    return v, u, -one  # bottom


_S2_TAN_EPS = 1.0 / float(1 << 53)


def _uv_to_st(u, kind: str):
    """UVtoST (s2.cpp:73-94)."""
    if kind == "linear":
        return 0.5 * (u + 1.0)
    if kind == "quadratic":
        return np.where(u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(np.clip(1.0 - 3.0 * u,
                                                    0, None)))
    if kind == "tangent":
        return (2.0 / np.pi) * (np.arctan(u) + np.pi / 4.0)
    return u


def _st_to_uv(s, kind: str):
    """STtoUV (s2.cpp:50-72)."""
    if kind == "linear":
        return 2.0 * s - 1.0
    if kind == "quadratic":
        return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))
    if kind == "tangent":
        t = np.tan(0.5 * np.pi * s - 0.25 * np.pi)
        return t + _S2_TAN_EPS * t
    return s


@dataclass(frozen=True)
class S2Consts:
    face: int
    kind: str
    es: float
    a: float
    b: float
    one_minus_f: float
    one_minus_f_squared: float


def s2_setup(params: dict, ell, lam0: float, phi0: float) -> S2Consts:
    """s2.cpp setup: face from the projection center, UVtoST kind."""
    kind = str(params.get("UVtoST", "quadratic"))
    if kind not in ("linear", "quadratic", "tangent", "none"):
        raise ValueError("s2: UVtoST should be linear, quadratic, "
                         "tangent, or none")
    base = setup(ell, lam0, phi0)  # reuse qsc face selection
    return S2Consts(face=base.face, kind=kind, es=ell.es, a=ell.a,
                    b=base.b, one_minus_f=base.one_minus_f,
                    one_minus_f_squared=base.one_minus_f_squared)


def s2_fwd(lam, phi, C: S2Consts):
    """s2.cpp s2_forward: geocentric-lat shift, face UV, UVtoST.
    Output is the raw (s, t) pair (PJ_IO_UNITS_PROJECTED)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.es != 0.0:
            lat = np.arctan(C.one_minus_f_squared * np.tan(phi))
        else:
            lat = phi
        coslat = np.cos(lat)
        x = coslat * np.cos(lam)
        y = coslat * np.sin(lam)
        z = np.sin(lat)
        u, v = _face_xyz_to_uv(C.face, x, y, z)
        s = _uv_to_st(u, C.kind)
        t = _uv_to_st(v, C.kind)
    return s, t


def s2_inv(x, y, C: S2Consts):
    """s2.cpp s2_inverse."""
    with np.errstate(invalid="ignore", divide="ignore"):
        u = _st_to_uv(x, C.kind)
        v = _st_to_uv(y, C.kind)
        q, r, s = _face_uv_to_xyz(C.face, u, v)
        norm = np.sqrt(q * q + r * r + s * s)
        q, r, s = q / norm, r / norm, s / norm
        phi = np.arccos(np.clip(-s, -1, 1)) - HALFPI
        lam = np.arctan2(r, q)
        if C.es != 0.0:
            invert = phi < 0.0
            tanphi = np.tan(phi)
            xa = C.b / np.sqrt(tanphi * tanphi + C.one_minus_f_squared)
            phi = np.arctan(np.sqrt(np.clip(C.a * C.a - xa * xa, 0, None))
                            / (C.one_minus_f * xa))
            phi = np.where(invert, -phi, phi)
    return lam, phi
