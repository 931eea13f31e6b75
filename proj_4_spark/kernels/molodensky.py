"""Molodensky datum shift (standard + abridged) and geocentric
latitude conversion.

Vectorized NumPy re-derivations of:
- molodensky: /root/reference/src/transformations/molodensky.cpp:52-300
  (RN/RM curvature radii, standard and abridged delta formulas; the
  reverse applies the deltas computed AT the input point with flipped
  sign, exactly like the reference)
- geoc:       /root/reference/src/conversions/geoc.cpp:37-80

Both operate radians->radians on the (lam, phi, z) channels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import HALFPI


@dataclass(frozen=True)
class MolodenskyConsts:
    dx: float
    dy: float
    dz: float
    da: float
    df: float
    abridged: bool
    a: float
    es: float
    f: float


def setup(params: dict, ell) -> MolodenskyConsts:
    """molodensky.cpp:305-350: all five of dx dy dz da df required."""
    for key in ("dx", "dy", "dz", "da", "df"):
        if key not in params:
            raise ValueError(f"molodensky: missing +{key}")
    return MolodenskyConsts(
        dx=float(params["dx"]), dy=float(params["dy"]),
        dz=float(params["dz"]), da=float(params["da"]),
        df=float(params["df"]), abridged="abridged" in params,
        a=ell.a, es=ell.es, f=ell.f)


def _RN(a: float, es: float, phi):
    """Prime-vertical radius (molodensky.cpp:68-80)."""
    if es == 0:
        return np.full_like(phi, a)
    s = np.sin(phi)
    return a / np.sqrt(1.0 - es * s * s)


def _RM(a: float, es: float, phi):
    """Meridian curvature radius (molodensky.cpp:84-117, eq. 13/13a/13b)."""
    if es == 0:
        return np.full_like(phi, a)
    s = np.sin(phi)
    r = (a * (1.0 - es)) / (1.0 - es * s * s) ** 1.5
    r = np.where(phi == 0.0, a * (1.0 - es), r)
    r = np.where(np.abs(phi) == HALFPI, a / np.sqrt(1.0 - es), r)
    return r


def _deltas(lam, phi, z, C: MolodenskyConsts):
    """(dlam, dphi, dh) at the input point; molodensky.cpp:120-208."""
    slam = np.sin(lam)
    clam = np.cos(lam)
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    dx, dy, dz, da, df = C.dx, C.dy, C.dz, C.da, C.df
    a, f = C.a, C.f
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.abridged:
            adffda = a * df + f * da
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + adffda * np.sin(2.0 * phi))
            dphi = dphi / _RM(a, C.es, phi)
            dlam = (-dx * slam + dy * clam) / (_RN(a, C.es, phi) * cphi)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi - da
                  + adffda * sphi * sphi)
        else:
            rho = _RM(a, C.es, phi)
            nu = _RN(a, C.es, phi)
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + (nu * C.es * sphi * cphi * da) / a
                    + sphi * cphi * (rho / (1.0 - f)
                                     + nu * (1.0 - f)) * df)
            dphi = dphi / (rho + z)
            dlam = (-dx * slam + dy * clam) / ((nu + z) * cphi)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi
                  - (a / nu) * da + nu * (1.0 - f) * sphi * sphi * df)
    return dlam, dphi, dh


def fwd(lam, phi, z, C: MolodenskyConsts):
    dlam, dphi, dh = _deltas(lam, phi, z, C)
    return lam + dlam, phi + dphi, z + dh


def inv(lam, phi, z, C: MolodenskyConsts):
    """molodensky.cpp:271-300: deltas at the input point, subtracted."""
    dlam, dphi, dh = _deltas(lam, phi, z, C)
    return lam - dlam, phi - dphi, z - dh


# ----------------------------------------------------------------- geoc

_GEOC_LIMIT = HALFPI - 1e-9


def geoc_fwd(phi, one_es: float):
    """Geographic -> geocentric latitude (geoc.cpp:38-64)."""
    if one_es == 1.0:
        return phi
    out = np.arctan(one_es * np.tan(phi))
    return np.where(np.abs(phi) > _GEOC_LIMIT, phi, out)


def geoc_inv(phi, one_es: float):
    if one_es == 1.0:
        return phi
    out = np.arctan(np.tan(phi) / one_es)
    return np.where(np.abs(phi) > _GEOC_LIMIT, phi, out)
