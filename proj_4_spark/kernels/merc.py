"""Mercator (ellipsoidal + spherical) and WebMercator.

Re-derivation of /root/reference/src/projections/merc.cpp:13-84.
(lam, phi) radians in, (x, y) in units of semimajor axis out.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import HALFPI, msfn, sinhpsi2tanphi
from .ellipsoid import Ellipsoid


@dataclass(frozen=True)
class MercConsts:
    k0: float
    e: float
    spherical: bool


def setup(params: dict, ell: Ellipsoid, k0: float, proj_id: str = "merc") -> MercConsts:
    """merc.cpp:45-84. +lat_ts rescales k0; webmerc forces k0=1 + sphere path."""
    if proj_id == "webmerc":
        return MercConsts(k0=1.0, e=0.0, spherical=True)
    if "lat_ts" in params:
        phits = abs(float(params["lat_ts"])) * np.pi / 180.0
        if phits >= HALFPI:
            raise ValueError("|lat_ts| should be <= 90 deg")
        if ell.es != 0.0:
            k0 = float(msfn(np.sin(phits), np.cos(phits), ell.es))
        else:
            k0 = float(np.cos(phits))
    return MercConsts(k0=k0, e=ell.e, spherical=ell.es == 0.0)


def fwd(lam, phi, C: MercConsts):
    x = C.k0 * lam
    if C.spherical:
        y = C.k0 * np.arcsinh(np.tan(phi))
    else:
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            y = C.k0 * (np.arcsinh(sphi / cphi) - C.e * np.arctanh(C.e * sphi))
    return x, y


def inv(x, y, C: MercConsts):
    lam = x / C.k0
    if C.spherical:
        phi = np.arctan(np.sinh(y / C.k0))
    else:
        phi = np.arctan(sinhpsi2tanphi(np.sinh(y / C.k0), C.e))
    return lam, phi
