"""HEALPix / rHEALPix equal-area projections.

Vectorized NumPy re-derivation of
/root/reference/src/projections/healpix.cpp:
- healpix_sphere fwd/inv:        :181-229 (equatorial Lambert strip +
  4 interrupted polar triangles)
- authalic latitude shift:       :160-178 (qsfn ratio fwd, series inv)
- combine_caps (rHEALPix):       :266-393 (cap disassembly/rotation;
  the 7 rotation matrices have 0/±1 entries, selected per point)
- image membership:              analytic triangle/band tests replace
  the reference's pnpoly jitter polygon
- rot_xy plane rotation:         :51-56

(lam, phi) radians in; (x, y) in units of the AUTHALIC radius out (the
setup rescales op.ell.a exactly like the reference resets P->a).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import FORTPI, HALFPI
from .misc_proj import _authlat, _authset, qsfn

EPS = 1e-15

# IDENT, R1(ccw 90), R2(180), R3(ccw 270), R3, R2, R1
_ROT = np.array([
    [[1, 0], [0, 1]],
    [[0, -1], [1, 0]],
    [[-1, 0], [0, -1]],
    [[0, 1], [-1, 0]],
    [[0, 1], [-1, 0]],
    [[-1, 0], [0, -1]],
    [[0, -1], [1, 0]],
], dtype=np.float64)


def _rot_index(k):
    """get_rotate_index (healpix.cpp:58-75): k in -3..3 -> 0..6."""
    return np.where(k >= 0, k, 3 - k)


@dataclass(frozen=True)
class HealpixConsts:
    spherical: bool
    e: float
    es: float
    one_es: float
    qp: float
    apa: tuple | None
    rot_xy: float
    north_square: int
    south_square: int
    rhealpix: bool


def setup(params: dict, ell, rhealpix: bool) -> HealpixConsts:
    if rhealpix:
        ns = int(params.get("north_square", 0))
        ss = int(params.get("south_square", 0))
        if not (0 <= ns <= 3):
            raise ValueError("rhealpix: north_square should be in [0,3]")
        if not (0 <= ss <= 3):
            raise ValueError("rhealpix: south_square should be in [0,3]")
        rot_xy = 0.0
    else:
        ns = ss = 0
        rot_xy = np.radians(float(params.get("rot_xy", 0.0)))
    if ell.es != 0.0:
        qp = float(qsfn(np.float64(1.0), ell.e, ell.one_es))
        apa = _authset(ell.es)
        return HealpixConsts(spherical=False, e=ell.e, es=ell.es,
                             one_es=ell.one_es, qp=qp, apa=apa,
                             rot_xy=float(rot_xy), north_square=ns,
                             south_square=ss, rhealpix=rhealpix)
    return HealpixConsts(spherical=True, e=0.0, es=0.0, one_es=1.0,
                         qp=2.0, apa=None, rot_xy=float(rot_xy),
                         north_square=ns, south_square=ss,
                         rhealpix=rhealpix)


def authalic_radius_factor(C: HealpixConsts) -> float:
    """P->a *= sqrt(qp/2) (healpix.cpp:631,675)."""
    return float(np.sqrt(0.5 * C.qp)) if not C.spherical else 1.0


def _auth_lat_fwd(phi, C: HealpixConsts):
    q = qsfn(np.sin(phi), C.e, C.one_es)
    ratio = np.clip(q / C.qp, -1.0, 1.0)
    return np.arcsin(ratio)


def _healpix_sphere_fwd(lam, phi):
    """healpix.cpp:181-202."""
    phi0 = np.arcsin(2.0 / 3.0)
    equ = np.abs(phi) <= phi0
    with np.errstate(invalid="ignore"):
        sigma = np.sqrt(np.clip(3.0 * (1.0 - np.abs(np.sin(phi))), 0, None))
        cn = np.minimum(np.floor(2.0 * lam / np.pi + 2.0), 3.0)
        lamc = -3.0 * FORTPI + HALFPI * cn
        xp = lamc + (lam - lamc) * sigma
        yp = np.sign(phi) * FORTPI * (2.0 - sigma)
    x = np.where(equ, lam, xp)
    y = np.where(equ, 3.0 * np.pi / 8.0 * np.sin(phi), yp)
    return x, y


def _healpix_sphere_inv(x, y):
    """healpix.cpp:204-229."""
    with np.errstate(invalid="ignore", divide="ignore"):
        equ = np.abs(y) <= FORTPI
        polar = (np.abs(y) < HALFPI) & ~equ
        cn = np.minimum(np.floor(2.0 * x / np.pi + 2.0), 3.0)
        xc = -3.0 * FORTPI + HALFPI * cn
        tau = 2.0 - 4.0 * np.abs(y) / np.pi
        lam_p = xc + (x - xc) / np.where(tau == 0, np.nan, tau)
        phi_p = np.sign(y) * np.arcsin(np.clip(1.0 - tau * tau / 3.0,
                                               -1.0, 1.0))
        lam = np.where(equ, x, np.where(polar, lam_p, -np.pi))
        phi = np.where(equ, np.arcsin(np.clip(8.0 * y / (3.0 * np.pi),
                                              -1, 1)),
                       np.where(polar, phi_p, np.sign(y) * HALFPI))
    return lam, phi


def _in_healpix_image(x, y):
    """Analytic membership in the HEALPix plane image (band + 4 polar
    triangles), with the reference's EPS slack."""
    band = (np.abs(x) <= np.pi + EPS) & (np.abs(y) <= FORTPI + EPS)
    ay = np.abs(y)
    cn = np.minimum(np.floor(2.0 * x / np.pi + 2.0), 3.0)
    xc = -3.0 * FORTPI + HALFPI * cn
    tri = (ay > FORTPI) & (ay <= HALFPI + EPS) \
        & (np.abs(x - xc) <= HALFPI - ay + 1e-12) \
        & (np.abs(x) <= np.pi + EPS)
    return band | tri


def _in_rhealpix_image(x, y, ns, ss):
    band = (np.abs(x) <= np.pi + EPS) & (np.abs(y) <= FORTPI + EPS)
    north = ((y > FORTPI) & (y <= 3.0 * FORTPI + EPS)
             & (x >= -np.pi + ns * HALFPI - EPS)
             & (x <= -np.pi + (ns + 1) * HALFPI + EPS))
    south = ((y < -FORTPI) & (y >= -3.0 * FORTPI - EPS)
             & (x >= -np.pi + ss * HALFPI - EPS)
             & (x <= -np.pi + (ss + 1) * HALFPI + EPS))
    return band | north | south


def _combine_caps_fwd(x, y, ns, ss):
    """combine_caps(..., inverse=0) (healpix.cpp:337-393)."""
    north = y > FORTPI
    south = y < -FORTPI
    polar = north | south
    cn = np.where(x < -HALFPI, 0,
                  np.where(x < 0, 1, np.where(x < HALFPI, 2, 3)))
    cx = -3.0 * FORTPI + HALFPI * cn
    cy = np.where(north, HALFPI, -HALFPI)
    pole = np.where(north, ns, ss)
    k = np.where(north, cn - pole, -(cn - pole))
    R = _ROT[_rot_index(k)]
    vx = x - cx
    vy = y - cy
    rx = R[..., 0, 0] * vx + R[..., 0, 1] * vy
    ry = R[..., 1, 0] * vx + R[..., 1, 1] * vy
    ox = rx + (-3.0 * FORTPI + pole * HALFPI)
    oy = ry + np.where(north, HALFPI, -HALFPI)
    return np.where(polar, ox, x), np.where(polar, oy, y)


def _combine_caps_inv(x, y, ns, ss):
    """combine_caps(..., inverse=1) incl. the cap-number disassembly
    tests (healpix.cpp:293-335)."""
    north = y > FORTPI
    south = y < -FORTPI
    polar = north | south
    xs = np.where(north, x - ns * HALFPI, np.where(south, x - ss * HALFPI, x))
    # north cap number
    n1 = (y >= -xs - FORTPI - EPS) & (y < xs + 5.0 * FORTPI - EPS)
    n2 = (y > -xs - FORTPI + EPS) & (y >= xs + 5.0 * FORTPI - EPS)
    n3 = (y <= -xs - FORTPI + EPS) & (y > xs + 5.0 * FORTPI + EPS)
    cn_n = np.where(n1, (ns + 1) % 4,
                    np.where(n2, (ns + 2) % 4,
                             np.where(n3, (ns + 3) % 4, ns)))
    s1 = (y <= xs + FORTPI + EPS) & (y > -xs - 5.0 * FORTPI + EPS)
    s2 = (y < xs + FORTPI - EPS) & (y <= -xs - 5.0 * FORTPI + EPS)
    s3 = (y >= xs + FORTPI - EPS) & (y < -xs - 5.0 * FORTPI - EPS)
    cn_s = np.where(s1, (ss + 1) % 4,
                    np.where(s2, (ss + 2) % 4,
                             np.where(s3, (ss + 3) % 4, ss)))
    cn = np.where(north, cn_n, cn_s)
    cx = np.where(north, -3.0 * FORTPI + ns * HALFPI,
                  -3.0 * FORTPI + ss * HALFPI)
    cy = np.where(north, HALFPI, -HALFPI)
    pole = np.where(north, ns, ss)
    k = np.where(north, -(cn - pole), cn - pole)
    R = _ROT[_rot_index(k)]
    vx = x - cx
    vy = y - cy
    rx = R[..., 0, 0] * vx + R[..., 0, 1] * vy
    ry = R[..., 1, 0] * vx + R[..., 1, 1] * vy
    ox = rx + (-3.0 * FORTPI + cn * HALFPI)
    oy = ry + np.where(north, HALFPI, -HALFPI)
    return np.where(polar, ox, x), np.where(polar, oy, y)


def fwd(lam, phi, C: HealpixConsts):
    if not C.spherical:
        phi = _auth_lat_fwd(phi, C)
    x, y = _healpix_sphere_fwd(lam, phi)
    if C.rhealpix:
        return _combine_caps_fwd(x, y, C.north_square, C.south_square)
    if C.rot_xy != 0.0:
        a = -C.rot_xy
        x, y = x * np.cos(a) - y * np.sin(a), y * np.cos(a) + x * np.sin(a)
    return x, y


def inv(x, y, C: HealpixConsts):
    if C.rhealpix:
        ok = _in_rhealpix_image(x, y, C.north_square, C.south_square)
        x, y = _combine_caps_inv(x, y, C.north_square, C.south_square)
    else:
        if C.rot_xy != 0.0:
            a = C.rot_xy
            x, y = (x * np.cos(a) - y * np.sin(a),
                    y * np.cos(a) + x * np.sin(a))
        ok = _in_healpix_image(x, y)
    lam, phi = _healpix_sphere_inv(x, y)
    if not C.spherical:
        phi = _authlat(phi, C.apa)
    lam = np.where(ok, lam, np.nan)
    phi = np.where(ok, phi, np.nan)
    return lam, phi
