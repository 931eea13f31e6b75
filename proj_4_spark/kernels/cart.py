"""Geodetic <-> geocentric cartesian conversion.

Re-derivation of /root/reference/src/conversions/cart.cpp:
- forward (closed-form, HM 5-27):        :139-153
- inverse (Bowring-style, polar guards): :156-239

Forward: (lam, phi) radians + h meters -> (X, Y, Z) meters.
Inverse: (X, Y, Z) meters -> (lam, phi) radians + h meters.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import HALFPI
from .ellipsoid import Ellipsoid


@dataclass(frozen=True)
class CartConsts:
    a: float
    es: float
    ra: float
    f: float
    e2s: float


def setup(params: dict, ell: Ellipsoid) -> CartConsts:
    return CartConsts(a=ell.a, es=ell.es, ra=ell.ra, f=ell.f, e2s=ell.e2s)


def fwd(lam, phi, z, C: CartConsts):
    cosphi = np.cos(phi)
    sinphi = np.sin(phi)
    if C.es == 0:
        N = C.a
    else:
        N = C.a / np.sqrt(1.0 - C.es * sinphi * sinphi)
    X = (N + z) * cosphi * np.cos(lam)
    Y = (N + z) * cosphi * np.sin(lam)
    Z = (N * (1.0 - C.es) + z) * sinphi
    return X, Y, Z


def inv(X, Y, Z, C: CartConsts):
    x_div_a = X * C.ra
    y_div_a = Y * C.ra
    z_div_a = Z * C.ra
    p_div_a = np.sqrt(x_div_a * x_div_a + y_div_a * y_div_a)

    b_div_a = 1.0 - C.f
    p_b = p_div_a * b_div_a
    norm = np.sqrt(z_div_a * z_div_a + p_b * p_b)
    with np.errstate(invalid="ignore", divide="ignore"):
        inv_norm = np.where(norm != 0, 1.0 / norm, 0.0)
    c = np.where(norm != 0, p_b * inv_norm, 1.0)
    s = np.where(norm != 0, z_div_a * inv_norm, 0.0)

    y_phi = z_div_a + C.e2s * b_div_a * s * s * s
    x_phi = p_div_a - C.es * c * c * c
    norm_phi = np.sqrt(y_phi * y_phi + x_phi * x_phi)
    with np.errstate(invalid="ignore", divide="ignore"):
        inv_np = np.where(norm_phi != 0, 1.0 / norm_phi, 0.0)
    cosphi = np.where(norm_phi != 0, x_phi * inv_np, 1.0)
    sinphi = np.where(norm_phi != 0, y_phi * inv_np, 0.0)

    degenerate = x_phi <= 0
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.where(degenerate, np.where(Z >= 0, HALFPI, -HALFPI), np.arctan(y_phi / x_phi))
    cosphi = np.where(degenerate, 0.0, cosphi)
    sinphi = np.where(degenerate, np.where(Z >= 0, 1.0, -1.0), sinphi)
    lam = np.arctan2(y_div_a, x_div_a)

    polar = cosphi < 1e-6
    # geocentric radius (cart.cpp:115-136)
    cos2 = cosphi * cosphi
    sin2 = sinphi * sinphi
    b2 = b_div_a * b_div_a
    b2s2 = b2 * sin2
    r = C.a * np.sqrt((cos2 + b2 * b2s2) / (cos2 + b2s2))
    if C.es == 0:
        N = np.full_like(phi, C.a)
    else:
        N = C.a / np.sqrt(1.0 - C.es * sinphi * sinphi)
    with np.errstate(invalid="ignore", divide="ignore"):
        h = np.where(polar, np.abs(Z) - r, C.a * p_div_a / cosphi - N)
    return lam, phi, h
