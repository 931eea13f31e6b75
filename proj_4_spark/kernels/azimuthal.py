"""Azimuthal + modern pseudocylindrical projections.

- aeqd: azimuthal equidistant, ellipsoidal via the Karney geodesic
  (exactly the reference's e_guam=false path, which delegates to
  geod_inverse/geod_direct — /root/reference/src/projections/aeqd.cpp:53+,
  forward :175-215, inverse :118-150)
- gnom / ortho: spherical closed forms (gnom.cpp, ortho.cpp)
- eqearth: Equal Earth (eqearth.cpp:24-75; A1..A4 constants, authalic
  latitude + Newton inverse)
- natearth: Natural Earth (natearth.cpp:20-90; polynomial + Newton)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import geodesic as geod
from .common import HALFPI
from .misc_proj import qsfn

EPS10 = 1e-10


# ------------------------------------------------------------------ aeqd

@dataclass(frozen=True)
class AeqdConsts:
    phi0: float
    lam0_deg: float
    g: object  # Geodesic
    spherical: bool
    a: float


def aeqd_setup(ell, phi0: float, lam0: float) -> AeqdConsts:
    g = geod.Geodesic.init(ell.a, ell.f) if ell.es != 0 else None
    return AeqdConsts(phi0=phi0, lam0_deg=np.degrees(lam0), g=g,
                      spherical=ell.es == 0, a=ell.a)


def aeqd_fwd(lam, phi, C: AeqdConsts):
    """x = s12·sin(azi1), y = s12·cos(azi1) from the center (meters /
    a for the pipeline's CLASSIC scaling — we return units of a)."""
    lat1 = np.full_like(phi, np.degrees(C.phi0))
    lon1 = np.zeros_like(lam)  # lam is already center-relative
    lat2 = np.degrees(phi)
    lon2 = np.degrees(lam)
    if C.spherical:
        # great-circle distance + bearing on the sphere
        p0 = C.phi0
        cosc = (np.sin(p0) * np.sin(phi)
                + np.cos(p0) * np.cos(phi) * np.cos(lam))
        c = np.arccos(np.clip(cosc, -1.0, 1.0))
        az = np.arctan2(np.cos(phi) * np.sin(lam),
                        np.cos(p0) * np.sin(phi)
                        - np.sin(p0) * np.cos(phi) * np.cos(lam))
        return c * np.sin(az), c * np.cos(az)
    s12, azi1, _, _ = geod.inverse(C.g, lat1, lon1, lat2, lon2)
    az = np.radians(azi1)
    return s12 * np.sin(az) / C.a, s12 * np.cos(az) / C.a


def aeqd_inv(x, y, C: AeqdConsts):
    if C.spherical:
        c = np.hypot(x, y)
        p0 = C.phi0
        with np.errstate(invalid="ignore", divide="ignore"):
            sinc = np.sin(c)
            cosc = np.cos(c)
            phi = np.arcsin(np.clip(
                cosc * np.sin(p0) + y * sinc * np.cos(p0) / np.where(c == 0, 1.0, c),
                -1, 1))
            lam = np.arctan2(x * sinc,
                             c * np.cos(p0) * cosc - y * np.sin(p0) * sinc)
        phi = np.where(c < EPS10, p0, phi)
        lam = np.where(c < EPS10, 0.0, lam)
        return lam, phi
    s12 = np.hypot(x, y) * C.a
    azi1 = np.degrees(np.arctan2(x, y))
    lat1 = np.full_like(s12, np.degrees(C.phi0))
    lon1 = np.zeros_like(s12)
    lat2, lon2, _ = geod.direct(C.g, lat1, lon1, azi1, s12)
    return np.radians(lon2), np.radians(lat2)


# ------------------------------------------------------ gnom / ortho

def gnom_fwd(lam, phi, phi0: float):
    """Gnomonic, spherical (gnom.cpp)."""
    sinp0, cosp0 = np.sin(phi0), np.cos(phi0)
    sinp, cosp = np.sin(phi), np.cos(phi)
    coslam = np.cos(lam)
    cosc = sinp0 * sinp + cosp0 * cosp * coslam
    with np.errstate(invalid="ignore", divide="ignore"):
        k = np.where(cosc > EPS10, 1.0 / cosc, np.nan)
        x = k * cosp * np.sin(lam)
        y = k * (cosp0 * sinp - sinp0 * cosp * coslam)
    return x, y


def ortho_fwd(lam, phi, phi0: float):
    """Orthographic, spherical (ortho.cpp); far hemisphere -> NaN."""
    sinp0, cosp0 = np.sin(phi0), np.cos(phi0)
    sinp, cosp = np.sin(phi), np.cos(phi)
    coslam = np.cos(lam)
    cosc = sinp0 * sinp + cosp0 * cosp * coslam
    x = np.where(cosc >= -EPS10, cosp * np.sin(lam), np.nan)
    y = np.where(cosc >= -EPS10, cosp0 * sinp - sinp0 * cosp * coslam,
                 np.nan)
    return x, y


def ortho_inv(x, y, phi0: float):
    rh = np.hypot(x, y)
    sinc = np.clip(rh, 0.0, 1.0)
    cosc = np.sqrt(1.0 - sinc * sinc)
    sinp0, cosp0 = np.sin(phi0), np.cos(phi0)
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = np.arcsin(np.clip(
            cosc * sinp0 + y * sinc * cosp0 / np.where(rh == 0, 1.0, rh),
            -1, 1))
        lam = np.arctan2(x * sinc, rh * cosc * cosp0 - y * sinc * sinp0)
    phi = np.where(rh < EPS10, phi0, phi)
    lam = np.where(rh < EPS10, 0.0, lam)
    return lam, phi


# --------------------------------------------------------- eqearth

_EE_A1, _EE_A2, _EE_A3, _EE_A4 = 1.340264, -0.081106, 0.000893, 0.003796
_EE_M = np.sqrt(3.0) / 2.0


@dataclass(frozen=True)
class EqearthConsts:
    qp: float
    rqda: float
    e: float
    one_es: float
    es: float


def eqearth_setup(ell) -> EqearthConsts:
    if ell.es == 0:
        return EqearthConsts(qp=2.0, rqda=1.0, e=0.0, one_es=1.0, es=0.0)
    qp = float(qsfn(np.float64(1.0), ell.e, ell.one_es))
    rqda = float(np.sqrt(0.5 * qp))  # authalic radius / a
    return EqearthConsts(qp=qp, rqda=rqda, e=ell.e, one_es=ell.one_es,
                         es=ell.es)


def eqearth_fwd(lam, phi, C: EqearthConsts):
    sbeta = np.sin(phi)
    if C.es != 0.0:
        sbeta = np.clip(qsfn(sbeta, C.e, C.one_es) / C.qp, -1.0, 1.0)
    psi = np.arcsin(_EE_M * sbeta)
    psi2 = psi * psi
    psi6 = psi2 * psi2 * psi2
    x = (lam * np.cos(psi)
         / (_EE_M * (_EE_A1 + 3 * _EE_A2 * psi2
                     + psi6 * (7 * _EE_A3 + 9 * _EE_A4 * psi2))))
    y = psi * (_EE_A1 + _EE_A2 * psi2 + psi6 * (_EE_A3 + _EE_A4 * psi2))
    return x * C.rqda, y * C.rqda


# --------------------------------------------------------- natearth

_NE_A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
_NE_B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)


def natearth_fwd(lam, phi, _=None):
    A0, A1, A2, A3, A4 = _NE_A
    B0, B1, B2, B3, B4 = _NE_B
    phi2 = phi * phi
    phi4 = phi2 * phi2
    x = lam * (A0 + phi2 * (A1 + phi2 * (A2 + phi4 * phi2 * (A3 + phi2 * A4))))
    y = phi * (B0 + phi2 * (B1 + phi4 * (B2 + B3 * phi2 + B4 * phi4)))
    return x, y


def natearth_inv(x, y, _=None, max_iter: int = 100, eps: float = 1e-11):
    A0, A1, A2, A3, A4 = _NE_A
    B0, B1, B2, B3, B4 = _NE_B
    C0, C1, C2, C3, C4 = B0, 3 * B1, 7 * B2, 9 * B3, 11 * B4
    MAX_Y = 0.8707 * 0.52 * np.pi
    yv = np.clip(y, -MAX_Y, MAX_Y)
    yc = yv.copy()
    for _i in range(max_iter):
        y2 = yc * yc
        y4 = y2 * y2
        f = (yc * (B0 + y2 * (B1 + y4 * (B2 + B3 * y2 + B4 * y4)))) - yv
        fder = C0 + y2 * (C1 + y4 * (C2 + C3 * y2 + C4 * y4))
        tol = f / fder
        yc = yc - tol
        if np.all(np.abs(tol) < eps):
            break
    y2 = yc * yc
    phi = yc
    lam = x / (A0 + y2 * (_NE_A[1] + y2 * (_NE_A[2]
               + y2 * y2 * y2 * (_NE_A[3] + y2 * _NE_A[4]))))
    return lam, phi


# ------------------------------------------------- hammer / aitoff family

def hammer_setup(params: dict):
    """hammer.cpp:54-91: W (default .5) and M (default 1) parameters;
    returns (w, m, rm) with m pre-divided by w."""
    w = abs(float(params.get("W", 0.5)))
    if w <= 0:
        raise ValueError("hammer: W should be > 0")
    m = abs(float(params.get("M", 1.0)))
    if m <= 0:
        raise ValueError("hammer: M should be > 0")
    return w, m / w, 1.0 / m


def hammer_fwd(lam, phi, w: float, m: float, rm: float):
    """hammer.cpp:19-35."""
    cosphi = np.cos(phi)
    lamw = lam * w
    denom = 1.0 + cosphi * np.cos(lamw)
    denom = np.where(denom == 0.0, np.nan, denom)
    d = np.sqrt(2.0 / denom)
    return m * d * cosphi * np.sin(lamw), rm * d * np.sin(phi)


def hammer_inv(x, y, w: float, m: float, rm: float):
    """hammer.cpp:37-52: z = sqrt(1 - w^2 x^2/4 - y^2/4), applied to
    the raw plane coordinates exactly as the reference does."""
    with np.errstate(invalid="ignore"):
        z = np.sqrt(1.0 - 0.25 * w * w * x * x - 0.25 * y * y)
        bad = np.abs(2.0 * z * z - 1.0) < EPS10
        lam = np.arctan2(w * x * z, 2.0 * z * z - 1.0) / w
        phi = np.arcsin(np.clip(z * y, -1.0, 1.0))
    lam = np.where(bad, np.nan, lam)
    phi = np.where(bad, np.nan, phi)
    return lam, phi


def aitoff_fwd(lam, phi, winkel: bool = False, cosphi1: float = 0.0):
    """aitoff.cpp s_forward (:26-53): basic Aitoff, optionally
    averaged with equirectangular for Winkel Tripel."""
    c = 0.5 * lam
    d = np.arccos(np.clip(np.cos(phi) * np.cos(c), -1.0, 1.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        inv_sd = 1.0 / np.sin(d)
        x = 2.0 * d * np.cos(phi) * np.sin(c) * inv_sd
        y = d * np.sin(phi) * inv_sd
    x = np.where(d == 0.0, 0.0, x)
    y = np.where(d == 0.0, 0.0, y)
    if winkel:
        x = (x + lam * cosphi1) * 0.5
        y = (y + phi) * 0.5
    return x, y


def wintri_setup(params: dict) -> float:
    """aitoff.cpp:160-174: cos(lat_1), default lat_1 = acos(2/pi)."""
    if "lat_1" in params:
        cosphi1 = np.cos(float(params["lat_1"]) * np.pi / 180.0)
        if cosphi1 == 0.0:
            raise ValueError("wintri: |lat_1| should be < 90")
        return float(cosphi1)
    return 2.0 / np.pi


# ------------------------------------------------- nsper / tpers

@dataclass(frozen=True)
class NsperConsts:
    mode: str
    sinph0: float
    cosph0: float
    p: float
    rp: float
    pn1: float
    h: float
    cg: float
    sg: float
    sw: float
    cw: float
    pfact: float
    tilt: bool
    phi0: float


def nsper_setup(params: dict, ell, phi0: float,
                tilt: bool = False) -> NsperConsts:
    """nsper.cpp:139-167 (+tpers tilt/azi, :182-200); es forced 0."""
    height = float(params.get("h", 0.0))
    if abs(abs(phi0) - HALFPI) < EPS10:
        mode = "s_pole" if phi0 < 0 else "n_pole"
    elif abs(phi0) < EPS10:
        mode = "equit"
    else:
        mode = "obliq"
    pn1 = height / ell.a
    if pn1 <= 0 or pn1 > 1e10:
        raise ValueError("nsper: invalid value for h")
    p = 1.0 + pn1
    omega = np.radians(float(params.get("tilt", 0.0)))
    gamma = np.radians(float(params.get("azi", 0.0)))
    return NsperConsts(mode=mode, sinph0=float(np.sin(phi0)),
                       cosph0=float(np.cos(phi0)), p=p, rp=1.0 / p,
                       pn1=pn1, h=1.0 / pn1, cg=float(np.cos(gamma)),
                       sg=float(np.sin(gamma)), sw=float(np.sin(omega)),
                       cw=float(np.cos(omega)),
                       pfact=(p + 1.0) / pn1, tilt=tilt, phi0=phi0)


def nsper_fwd(lam, phi, C: NsperConsts):
    """nsper.cpp:36-88."""
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    coslam = np.cos(lam)
    if C.mode == "obliq":
        yb = C.sinph0 * sinphi + C.cosph0 * cosphi * coslam
    elif C.mode == "equit":
        yb = cosphi * coslam
    elif C.mode == "s_pole":
        yb = -sinphi
    else:
        yb = sinphi
    bad = yb < C.rp
    with np.errstate(invalid="ignore", divide="ignore"):
        t = C.pn1 / (C.p - yb)
        x = t * cosphi * np.sin(lam)
        if C.mode == "obliq":
            y = t * (C.cosph0 * sinphi - C.sinph0 * cosphi * coslam)
        elif C.mode == "equit":
            y = t * sinphi
        elif C.mode == "n_pole":
            y = t * cosphi * (-coslam)
        else:
            y = t * cosphi * coslam
        if C.tilt:
            yt = y * C.cg + x * C.sg
            ba = 1.0 / (yt * C.sw * C.h + C.cw)
            x, y = (x * C.cg - y * C.sg) * C.cw * ba, yt * ba
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y


def nsper_inv(x, y, C: NsperConsts):
    """nsper.cpp:90-137."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.tilt:
            yt = 1.0 / (C.pn1 - y * C.sw)
            bm = C.pn1 * x * yt
            bq = C.pn1 * y * C.cw * yt
            x = bm * C.cg + bq * C.sg
            y = bq * C.cg - bm * C.sg
        rh = np.hypot(x, y)
        center = np.abs(rh) <= EPS10
        sinz = 1.0 - rh * rh * C.pfact
        bad = sinz < 0.0
        sinz = (C.p - np.sqrt(np.clip(sinz, 0, None))) \
            / (C.pn1 / np.where(rh == 0, 1.0, rh)
               + np.where(rh == 0, 1.0, rh) / C.pn1)
        cosz = np.sqrt(np.clip(1.0 - sinz * sinz, 0, None))
        if C.mode == "obliq":
            phi = np.arcsin(np.clip(
                cosz * C.sinph0 + y * sinz * C.cosph0
                / np.where(rh == 0, 1.0, rh), -1, 1))
            yy = (cosz - C.sinph0 * np.sin(phi)) * rh
            xx = x * sinz * C.cosph0
        elif C.mode == "equit":
            phi = np.arcsin(np.clip(y * sinz / np.where(rh == 0, 1.0, rh),
                                    -1, 1))
            yy = cosz * rh
            xx = x * sinz
        elif C.mode == "n_pole":
            phi = np.arcsin(np.clip(cosz, -1, 1))
            yy = -y
            xx = x
        else:
            phi = -np.arcsin(np.clip(cosz, -1, 1))
            yy = y
            xx = x
        lam = np.arctan2(xx, yy)
    phi = np.where(center, C.phi0, np.where(bad, np.nan, phi))
    lam = np.where(center, 0.0, np.where(bad, np.nan, lam))
    return lam, phi
