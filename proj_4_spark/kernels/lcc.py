"""Lambert Conformal Conic (1SP / 2SP, ellipsoidal + spherical).

Re-derivation of /root/reference/src/projections/lcc.cpp:22-171.
(lam, phi) radians in, (x, y) in units of semimajor axis out.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import DEG_TO_RAD, FORTPI, HALFPI, msfn, phi2, tsfn
from .ellipsoid import Ellipsoid

EPS10 = 1e-10


@dataclass(frozen=True)
class LccConsts:
    n: float
    rho0: float
    c: float
    es: float
    e: float
    k0: float


def setup(params: dict, ell: Ellipsoid, k0: float, phi0: float) -> LccConsts:
    """lcc.cpp:78-171. Note: when lat_2 absent and lat_0 absent,
    phi0 defaults to lat_1 — the caller must apply the returned phi0."""
    phi1 = float(params["lat_1"]) * DEG_TO_RAD if "lat_1" in params else 0.0
    if "lat_2" in params:
        phi2_ = float(params["lat_2"]) * DEG_TO_RAD
    else:
        phi2_ = phi1
        if "lat_0" not in params:
            phi0 = phi1
    if abs(phi1 + phi2_) < EPS10:
        raise ValueError("|lat_1 + lat_2| should be > 0")
    n = sinphi = np.sin(phi1)
    cosphi = np.cos(phi1)
    if abs(cosphi) < EPS10 or abs(phi1) >= HALFPI:
        raise ValueError("|lat_1| should be < 90")
    if abs(np.cos(phi2_)) < EPS10 or abs(phi2_) >= HALFPI:
        raise ValueError("|lat_2| should be < 90")
    secant = abs(phi1 - phi2_) >= EPS10
    if ell.es != 0.0:
        m1 = float(msfn(sinphi, cosphi, ell.es))
        ml1 = float(tsfn(np.float64(phi1), np.float64(sinphi), ell.e))
        if secant:
            sinphi = np.sin(phi2_)
            n = np.log(m1 / float(msfn(sinphi, np.cos(phi2_), ell.es)))
            ml2 = float(tsfn(np.float64(phi2_), np.float64(sinphi), ell.e))
            denom = np.log(ml1 / ml2)
            if denom == 0:
                raise ValueError("invalid eccentricity")
            n = n / denom
        rho0 = m1 * ml1 ** (-n) / n
        c = rho0
        if abs(abs(phi0) - HALFPI) < EPS10:
            rho0 = 0.0
        else:
            rho0 = rho0 * float(tsfn(np.float64(phi0), np.sin(np.float64(phi0)), ell.e)) ** n
    else:
        if secant:
            n = np.log(cosphi / np.cos(phi2_)) / np.log(
                np.tan(FORTPI + 0.5 * phi2_) / np.tan(FORTPI + 0.5 * phi1)
            )
        if n == 0:
            raise ValueError("|lat_1 + lat_2| should be > 0")
        c = cosphi * np.tan(FORTPI + 0.5 * phi1) ** n / n
        if abs(abs(phi0) - HALFPI) < EPS10:
            rho0 = 0.0
        else:
            rho0 = c * np.tan(FORTPI + 0.5 * phi0) ** (-n)
    return LccConsts(n=float(n), rho0=float(rho0), c=float(c), es=ell.es, e=ell.e, k0=k0), phi0


def fwd(lam, phi, C: LccConsts):
    """lcc.cpp:22-42."""
    pole = np.abs(np.abs(phi) - HALFPI) < EPS10
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.es != 0.0:
            rho = C.c * tsfn(phi, np.sin(phi), C.e) ** C.n
        else:
            rho = C.c * np.tan(FORTPI + 0.5 * phi) ** (-C.n)
    bad = pole & ((phi * C.n) <= 0.0)
    rho = np.where(pole, 0.0, rho)
    lamn = lam * C.n
    x = C.k0 * (rho * np.sin(lamn))
    y = C.k0 * (C.rho0 - rho * np.cos(lamn))
    if bad.any():
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    return x, y


def inv(x, y, C: LccConsts):
    """lcc.cpp:44-76."""
    x = x / C.k0
    y = y / C.k0
    y = C.rho0 - y
    rho = np.hypot(x, y)
    if C.n < 0.0:
        rho = -rho
        x = -x
        y = -y
    zero = rho == 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.es != 0.0:
            phi = phi2((rho / C.c) ** (1.0 / C.n), C.e)
        else:
            phi = 2.0 * np.arctan((C.c / rho) ** (1.0 / C.n)) - HALFPI
        lam = np.arctan2(x, y) / C.n
    phi = np.where(zero, HALFPI if C.n > 0 else -HALFPI, phi)
    lam = np.where(zero, 0.0, lam)
    return lam, phi
