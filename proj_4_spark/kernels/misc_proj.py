"""Long-tail projection kernels (SURVEY.md §2.3 registry expansion).

Each is the standard closed-form map re-derived from the reference
implementation (file:line cited per function), vectorized over NumPy
point arrays: (lam, phi) radians in -> (x, y) in units of the
semimajor axis (the pipeline compiler applies a-scaling/offsets).

Ellipsoidal forms use the shared helpers in kernels.common (qsfn,
tsfn, msfn, mlfn ...) exactly as the reference does.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import DEG_TO_RAD, FORTPI, HALFPI, aasin, enfn, inv_mlfn, mlfn, msfn, phi2, tsfn
from .ellipsoid import Ellipsoid

EPS10 = 1e-10


def qsfn(sinphi, e, one_es):
    """Authalic-latitude q function (src/qsfn.cpp:6-18)."""
    if e < 1e-7:
        return sinphi + sinphi
    con = e * sinphi
    return one_es * (sinphi / (1.0 - con * con)
                     - (0.5 / e) * np.log((1.0 - con) / (1.0 + con)))


# ---------------------------------------------------------------- eqc

@dataclass(frozen=True)
class EqcConsts:
    rc: float
    phi0: float


def eqc_setup(params: dict, ell: Ellipsoid, k0: float, phi0: float) -> EqcConsts:
    """Equidistant cylindrical / Plate Carrée (src/projections/eqc.cpp):
    x = rc·lam, y = phi - phi0; rc = cos(lat_ts)."""
    phits = float(params.get("lat_ts", 0.0)) * DEG_TO_RAD
    rc = float(np.cos(phits))
    if rc <= 0:
        raise ValueError("|lat_ts| should be < 90")
    return EqcConsts(rc=rc, phi0=phi0)


def eqc_fwd(lam, phi, C: EqcConsts):
    return C.rc * lam, phi - C.phi0


def eqc_inv(x, y, C: EqcConsts):
    return x / C.rc, y + C.phi0


# ---------------------------------------------------------------- cea

@dataclass(frozen=True)
class CeaConsts:
    k0: float
    qp: float
    e: float
    one_es: float
    spherical: bool
    apa: tuple | None


def _authset(es: float) -> tuple:
    """Authalic latitude series coefficients (src/authlat.cpp?; the
    classic P00..P31 constants used by pj_authset/pj_authlat)."""
    P00, P01, P02 = 0.33333333333333333333, 0.17222222222222222222, 0.10257936507936507936
    P10, P11, P20 = 0.06388888888888888888, 0.06640211640211640211, 0.01641501294219154443
    t = es * es
    apa0 = es * P00 + t * P01 + t * es * P02
    apa1 = t * P10 + t * es * P11
    apa2 = t * es * P20
    return (apa0, apa1, apa2)


def _authlat(beta, apa) -> np.ndarray:
    return (beta + apa[0] * np.sin(beta + beta)
            + apa[1] * np.sin(4.0 * beta) + apa[2] * np.sin(6.0 * beta))


def cea_setup(params: dict, ell: Ellipsoid, k0: float) -> CeaConsts:
    """Lambert cylindrical equal-area (src/projections/cea.cpp):
    +lat_ts rescales k0 (with msfn on the ellipsoid)."""
    if "lat_ts" in params:
        phits = float(params["lat_ts"]) * DEG_TO_RAD
        if ell.es != 0.0:
            k0 = float(msfn(np.sin(phits), np.cos(phits), ell.es))
        else:
            k0 = float(np.cos(phits))
    if ell.es == 0.0:
        return CeaConsts(k0=k0, qp=2.0, e=0.0, one_es=1.0,
                         spherical=True, apa=None)
    qp = float(qsfn(np.float64(1.0), ell.e, ell.one_es))
    return CeaConsts(k0=k0, qp=qp, e=ell.e, one_es=ell.one_es,
                     spherical=False, apa=_authset(ell.es))


def cea_fwd(lam, phi, C: CeaConsts):
    x = C.k0 * lam
    if C.spherical:
        y = np.sin(phi) / C.k0
    else:
        y = 0.5 * qsfn(np.sin(phi), C.e, C.one_es) / C.k0
    return x, y


def cea_inv(x, y, C: CeaConsts):
    lam = x / C.k0
    if C.spherical:
        phi = np.arcsin(np.clip(y * C.k0, -1.0, 1.0))
    else:
        beta = np.arcsin(np.clip(2.0 * y * C.k0 / C.qp, -1.0, 1.0))
        phi = _authlat(beta, C.apa)
    return lam, phi


# ---------------------------------------------------------------- aea/leac

@dataclass(frozen=True)
class AeaConsts:
    n: float
    c: float
    rho0: float
    ec: float
    e: float
    es: float
    one_es: float
    dd: float
    n2: float
    spherical: bool
    apa: tuple | None
    qp: float


def aea_setup(params: dict, ell: Ellipsoid, phi0: float,
              phi1: float, phi2_: float) -> AeaConsts:
    """Albers equal-area conic (src/projections/aea.cpp:60-150)."""
    if abs(phi1 + phi2_) < EPS10:
        raise ValueError("|lat_1 + lat_2| should be > 0")
    sinphi = np.sin(phi1)
    cosphi = np.cos(phi1)
    n = float(sinphi)
    secant = abs(phi1 - phi2_) >= EPS10
    if ell.es > 0.0:
        m1 = float(msfn(sinphi, cosphi, ell.es))
        ml1 = float(qsfn(sinphi, ell.e, ell.one_es))
        if secant:
            sinphi = np.sin(phi2_)
            cosphi = np.cos(phi2_)
            m2 = float(msfn(sinphi, cosphi, ell.es))
            ml2 = float(qsfn(sinphi, ell.e, ell.one_es))
            n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
        ec = 1.0 - 0.5 * ell.one_es * np.log((1.0 - ell.e) / (1.0 + ell.e)) / ell.e
        c = m1 * m1 + n * ml1
        dd = 1.0 / n
        rho0 = dd * np.sqrt(c - n * qsfn(np.sin(phi0), ell.e, ell.one_es))
        qp = float(qsfn(np.float64(1.0), ell.e, ell.one_es))
        return AeaConsts(n=n, c=float(c), rho0=float(rho0), ec=float(ec),
                         e=ell.e, es=ell.es, one_es=ell.one_es,
                         dd=float(dd), n2=n + n, spherical=False,
                         apa=_authset(ell.es), qp=qp)
    else:
        if secant:
            n = 0.5 * (n + np.sin(phi2_))
        n2 = n + n
        c = cosphi * cosphi + n2 * sinphi
        dd = 1.0 / n
        rho0 = dd * np.sqrt(c - n2 * np.sin(phi0))
        return AeaConsts(n=float(n), c=float(c), rho0=float(rho0), ec=0.0,
                         e=0.0, es=0.0, one_es=1.0, dd=float(dd),
                         n2=float(n2), spherical=True, apa=None, qp=2.0)


def aea_fwd(lam, phi, C: AeaConsts):
    """aea.cpp e_forward/s_forward."""
    if C.spherical:
        rho = C.dd * np.sqrt(C.c - C.n2 * np.sin(phi))
    else:
        rho = C.dd * np.sqrt(C.c - C.n * qsfn(np.sin(phi), C.e, C.one_es))
    lamn = lam * C.n
    x = rho * np.sin(lamn)
    y = C.rho0 - rho * np.cos(lamn)
    return x, y


def aea_inv(x, y, C: AeaConsts):
    yy = C.rho0 - y
    rho = np.hypot(x, yy)
    xx, yv = x, yy
    if C.n < 0:
        rho = -rho
        xx = -x
        yv = -yy
    lam = np.arctan2(xx, yv) / C.n
    if C.spherical:
        s = np.clip((C.c - (rho / C.dd) ** 2) / C.n2, -1.0, 1.0)
        phi = np.arcsin(s)
    else:
        q = (C.c - (rho / C.dd) ** 2) / C.n
        beta = np.arcsin(np.clip(q / C.qp, -1.0, 1.0))
        phi = _authlat(beta, C.apa)
    return lam, phi


# ---------------------------------------------------------------- laea

@dataclass(frozen=True)
class LaeaConsts:
    mode: str  # equit|obliq|n_pole|s_pole
    phi0: float
    sinb1: float
    cosb1: float
    qp: float
    rq: float
    dd: float
    xmf: float
    ymf: float
    e: float
    one_es: float
    spherical: bool
    apa: tuple | None


def laea_setup(params: dict, ell: Ellipsoid, phi0: float) -> LaeaConsts:
    """Lambert azimuthal equal-area (src/projections/laea.cpp)."""
    t = abs(phi0)
    if abs(t - HALFPI) < EPS10:
        mode = "n_pole" if phi0 > 0 else "s_pole"
    elif t < EPS10:
        mode = "equit"
    else:
        mode = "obliq"
    if ell.es == 0.0:
        sinb1 = np.sin(phi0)
        return LaeaConsts(mode=mode, phi0=phi0, sinb1=float(np.sin(phi0)),
                          cosb1=float(np.cos(phi0)), qp=2.0, rq=1.0,
                          dd=1.0, xmf=1.0, ymf=1.0, e=0.0, one_es=1.0,
                          spherical=True, apa=None)
    qp = float(qsfn(np.float64(1.0), ell.e, ell.one_es))
    rq = float(np.sqrt(0.5 * qp))
    apa = _authset(ell.es)
    sinb1 = float(qsfn(np.sin(phi0), ell.e, ell.one_es)) / qp
    cosb1 = float(np.sqrt(1.0 - sinb1 * sinb1))
    if mode == "obliq":
        dd = float(np.cos(phi0) / (np.sqrt(1.0 - ell.es * np.sin(phi0) ** 2)
                                   * rq * cosb1))
        xmf = rq * dd
        ymf = rq / dd
    elif mode == "equit":
        # laea.cpp:280-283: dd = 1/rq, xmf = 1, ymf = qp/2
        dd, xmf, ymf = 1.0 / rq, 1.0, 0.5 * qp
    else:
        dd, xmf, ymf = 1.0, rq, rq
    return LaeaConsts(mode=mode, phi0=phi0, sinb1=sinb1, cosb1=cosb1,
                      qp=qp, rq=rq, dd=dd, xmf=float(xmf), ymf=float(ymf),
                      e=ell.e, one_es=ell.one_es, spherical=False, apa=apa)


def laea_fwd(lam, phi, C: LaeaConsts):
    coslam = np.cos(lam)
    sinlam = np.sin(lam)
    if C.spherical:
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        if C.mode == "equit":
            yv = 1.0 + cosphi * coslam
            yv = np.where(yv <= EPS10, np.nan, yv)
            yv = np.sqrt(2.0 / yv)
            x = yv * cosphi * sinlam
            y = yv * sinphi
        elif C.mode == "obliq":
            yv = 1.0 + C.sinb1 * sinphi + C.cosb1 * cosphi * coslam
            yv = np.where(yv <= EPS10, np.nan, yv)
            yv = np.sqrt(2.0 / yv)
            x = yv * cosphi * sinlam
            y = yv * (C.cosb1 * sinphi - C.sinb1 * cosphi * coslam)
        else:
            # antipodal pole -> domain error (laea_s_forward :121-124)
            bad = np.abs(phi + C.phi0) < EPS10
            if C.mode == "n_pole":
                rho = 2.0 * np.sin(FORTPI - 0.5 * phi)
                y = -rho * coslam
            else:
                rho = 2.0 * np.sin(FORTPI + 0.5 * phi)
                y = rho * coslam
            x = np.where(bad, np.nan, rho * sinlam)
            y = np.where(bad, np.nan, y)
        return x, y
    # ellipsoidal
    sinb = qsfn(np.sin(phi), C.e, C.one_es) / C.qp
    cosb2 = 1.0 - sinb * sinb
    cosb = np.sqrt(np.clip(cosb2, 0.0, None))
    if C.mode == "obliq":
        b = 1.0 + C.sinb1 * sinb + C.cosb1 * cosb * coslam
        b = np.where(b < EPS10, np.nan, b)
        b = np.sqrt(2.0 / b)
        x = C.xmf * b * cosb * sinlam
        y = C.ymf * b * (C.cosb1 * sinb - C.sinb1 * cosb * coslam)
    elif C.mode == "equit":
        b = 1.0 + cosb * coslam
        b = np.where(b < EPS10, np.nan, b)
        b = np.sqrt(2.0 / b)
        x = C.xmf * b * cosb * sinlam
        y = C.ymf * b * sinb
    elif C.mode == "n_pole":
        # |phi + pi/2| < EPS10 (the antipodal pole) -> domain error
        # (laea_e_forward :50-66)
        bad = np.abs(phi + HALFPI) < EPS10
        b = np.sqrt(np.clip(C.qp - qsfn(np.sin(phi), C.e, C.one_es),
                            0.0, None))
        x = np.where(bad, np.nan, b * sinlam)
        y = np.where(bad, np.nan, -b * coslam)
    else:
        bad = np.abs(phi - HALFPI) < EPS10
        b = np.sqrt(np.clip(C.qp + qsfn(np.sin(phi), C.e, C.one_es),
                            0.0, None))
        x = np.where(bad, np.nan, b * sinlam)
        y = np.where(bad, np.nan, b * coslam)
    return x, y


# ---------------------------------------------------------------- stere

@dataclass(frozen=True)
class StereConsts:
    mode: str
    phi0: float
    sinX1: float
    cosX1: float
    akm1: float
    e: float
    k0: float
    spherical: bool


def stere_setup(params: dict, ell: Ellipsoid, k0: float, phi0: float,
                proj_id: str = "stere") -> StereConsts:
    """Stereographic (src/projections/stere.cpp setup :282-360).
    ups: forced polar with k0=0.994, lat_0=+-90."""
    if proj_id == "ups":
        phi0 = HALFPI if "south" not in params else -HALFPI
        k0 = 0.994
    phits = (abs(float(params["lat_ts"]) * DEG_TO_RAD)
             if "lat_ts" in params else HALFPI)
    t = abs(phi0)
    if abs(t - HALFPI) < EPS10:
        mode = "n_pole" if phi0 > 0 else "s_pole"
    elif t < EPS10:
        mode = "equit"
    else:
        mode = "obliq"
    if ell.es == 0.0:
        if mode in ("n_pole", "s_pole"):
            akm1 = (2.0 * k0 if abs(phits - HALFPI) < EPS10
                    else np.cos(phits) / np.tan(FORTPI - 0.5 * phits))
        else:
            akm1 = 2.0 * k0
        return StereConsts(mode=mode, phi0=phi0, sinX1=float(np.sin(phi0)),
                           cosX1=float(np.cos(phi0)), akm1=float(akm1),
                           e=0.0, k0=k0, spherical=True)
    e = ell.e
    if mode in ("n_pole", "s_pole"):
        if abs(phits - HALFPI) < EPS10:
            akm1 = 2.0 * k0 / np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
        else:
            sp = np.sin(phits)
            akm1 = np.cos(phits) / tsfn(np.float64(phits), np.float64(sp), e)
            sp *= e
            akm1 /= np.sqrt(1.0 - sp * sp)
    else:
        # conformal sphere reference latitude
        sp = np.sin(phi0)
        X = 2.0 * np.arctan(_ssfn(phi0, sp, e)) - HALFPI
        sp *= e
        akm1 = 2.0 * k0 * np.cos(phi0) / np.sqrt(1.0 - sp * sp)
        return StereConsts(mode=mode, phi0=phi0, sinX1=float(np.sin(X)),
                           cosX1=float(np.cos(X)), akm1=float(akm1),
                           e=e, k0=k0, spherical=False)
    return StereConsts(mode=mode, phi0=phi0, sinX1=0.0, cosX1=1.0,
                       akm1=float(akm1), e=e, k0=k0, spherical=False)


def _ssfn(phit, sinphi, eccen):
    """ssfn (stere.cpp:42-47)."""
    sinphi = sinphi * eccen
    return np.tan(0.5 * (HALFPI + phit)) * ((1.0 - sinphi) / (1.0 + sinphi)) ** (0.5 * eccen)


def stere_fwd(lam, phi, C: StereConsts):
    coslam = np.cos(lam)
    sinlam = np.sin(lam)
    sinphi = np.sin(phi)
    if C.spherical:
        cosphi = np.cos(phi)
        if C.mode in ("equit", "obliq"):
            if C.mode == "equit":
                yv = 1.0 + cosphi * coslam
            else:
                yv = 1.0 + C.sinX1 * sinphi + C.cosX1 * cosphi * coslam
            yv = np.where(yv <= EPS10, np.nan, yv)
            yv = C.akm1 / yv
            x = yv * cosphi * sinlam
            if C.mode == "equit":
                y = yv * sinphi
            else:
                y = yv * (C.cosX1 * sinphi - C.sinX1 * cosphi * coslam)
        else:
            if C.mode == "n_pole":
                coslam = -coslam
                phiv = -phi
            else:
                phiv = phi
            x = C.akm1 * np.tan(FORTPI + 0.5 * phiv) * sinlam
            y = x / sinlam * coslam  # = akm1 tan(..) coslam
            x = C.akm1 * np.tan(FORTPI + 0.5 * phiv) * sinlam
            y = C.akm1 * np.tan(FORTPI + 0.5 * phiv) * coslam
        return x, y
    # ellipsoidal (stere.cpp e_forward :60-105)
    if C.mode in ("obliq", "equit"):
        X = 2.0 * np.arctan(_ssfn(phi, sinphi, C.e)) - HALFPI
        sinX = np.sin(X)
        cosX = np.cos(X)
        A = C.akm1 / (C.cosX1 * (1.0 + C.sinX1 * sinX
                                 + C.cosX1 * cosX * coslam))
        y = A * (C.cosX1 * sinX - C.sinX1 * cosX * coslam)
        x = A * cosX * sinlam
    else:
        if C.mode == "s_pole":
            phiv = -phi
            coslamv = coslam
            sinphiv = -sinphi
            yv_sign = 1.0
        else:
            phiv = phi
            coslamv = -coslam
            sinphiv = sinphi
            yv_sign = 1.0
        # exact pole -> exactly 0 (stere.cpp:82-83), not akm1*cos(pi/2)
        r = np.where(np.abs(phiv - HALFPI) < 1e-15, 0.0,
                     C.akm1 * tsfn(phiv, sinphiv, C.e))
        y = r * coslamv
        x = r * sinlam
    return x, y


# ---------------------------------------------------------------- moll

@dataclass(frozen=True)
class MollConsts:
    C_x: float
    C_y: float
    C_p: float


def moll_setup(p: float = HALFPI) -> MollConsts:
    """Mollweide family general setup (src/projections/moll.cpp:116-133)
    with p=pi/2 (moll), p=pi/3 (wag4), p=pi/2? (wag5 uses fixed)."""
    p2 = p + p
    sp = np.sin(p)
    r = np.sqrt(2.0 * np.pi * sp / (p2 + np.sin(p2)))
    C_x = 2.0 * r / np.pi
    C_y = r / sp
    C_p = p2 + np.sin(p2)
    return MollConsts(C_x=float(C_x), C_y=float(C_y), C_p=float(C_p))


def moll_fwd(lam, phi, C: MollConsts, max_iter: int = 30, tol: float = 1e-7):
    """moll.cpp forward: Newton for theta; points whose Newton does not
    meet LOOP_TOL within MAX_ITER (the poles — the derivative 1+cos
    vanishes there) snap to ±pi/2 exactly like the reference's
    loop-exhaustion fallback (moll.cpp:28-40)."""
    k = C.C_p * np.sin(phi)
    theta = np.array(phi, dtype=np.float64, copy=True)
    conv = np.zeros(np.shape(phi), dtype=bool)
    with np.errstate(invalid="ignore", divide="ignore"):
        for _ in range(max_iter):
            V = (theta + np.sin(theta) - k) / (1.0 + np.cos(theta))
            V = np.where(conv | ~np.isfinite(V), 0.0, V)
            theta = theta - V
            conv = conv | (np.abs(V) < tol)
            if conv.all():
                break
    theta = np.where(conv, theta * 0.5,
                     np.where(phi < 0.0, -HALFPI, HALFPI))
    x = C.C_x * lam * np.cos(theta)
    y = C.C_y * np.sin(theta)
    return x, y


def moll_inv(x, y, C: MollConsts):
    """moll.cpp inverse; |lam| >= pi -> domain error (moll.cpp:43-56)."""
    theta = aasin(y / C.C_y)
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = x / (C.C_x * np.cos(theta))
    bad = np.abs(lam) >= np.pi
    theta2 = theta + theta
    phi = aasin((theta2 + np.sin(theta2)) / C.C_p)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


# ---------------------------------------------------------------- sinu

def sinu_setup(ell: Ellipsoid):
    """Sinusoidal (src/projections/sinu.cpp): ellipsoidal uses mlfn."""
    if ell.es != 0.0:
        return enfn(ell.n)
    return None


def sinu_fwd(lam, phi, en, es: float):
    if en is not None:
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        x = lam * cphi / np.sqrt(1.0 - es * sphi * sphi)
        y = mlfn(phi, sphi, cphi, en)
    else:
        x = lam * np.cos(phi)
        y = phi
    return x, y


def sinu_inv(x, y, en, es: float):
    if en is not None:
        phi = inv_mlfn(y, en)
        sphi = np.sin(phi)
        lam = x * np.sqrt(1.0 - es * sphi * sphi) / np.cos(phi)
    else:
        phi = y
        lam = x / np.cos(phi)
    return lam, phi


# ---------------------------------------------------------------- misc sphericals

def gall_fwd(lam, phi, _=None):
    """Gall stereographic (src/projections/gall.cpp):
    x = lam/sqrt(2), y = (1+sqrt(2)/2) tan(phi/2)."""
    YF = 1.0 + np.sqrt(2.0) / 2.0
    XF = 1.0 / np.sqrt(2.0)
    return XF * lam, YF * np.tan(0.5 * phi)


def gall_inv(x, y, _=None):
    YF = 1.0 + np.sqrt(2.0) / 2.0
    XF = 1.0 / np.sqrt(2.0)
    return x / XF, 2.0 * np.arctan(y / YF)


def mill_fwd(lam, phi, _=None):
    """Miller cylindrical (src/projections/mill.cpp):
    y = log(tan(pi/4 + 0.4 phi)) * 1.25."""
    return lam, np.log(np.tan(FORTPI + 0.4 * phi)) * 1.25


def mill_inv(x, y, _=None):
    return x, 2.5 * (np.arctan(np.exp(0.8 * y)) - FORTPI)


_ECK4_CX = 0.42223820031577120149   # 2/sqrt(4π+π²)
_ECK4_CY = 1.32650042817700232218   # 2 sqrt(π/(4+π))
_ECK4_RCY = 0.75386330736002178205
_ECK4_CP = 3.57079632679489661922   # 2 + π/2
_ECK4_RCP = 0.28004957675577868795


def eck4_fwd(lam, phi, max_iter: int = 6, tol: float = 1e-7):
    """Eckert IV forward (src/projections/eck4.cpp:23-51): Newton for
    θ + sinθ(cosθ+2) = C_p sinφ from the reference's cubic seed;
    points not meeting EPS within NITER (the poles, where the
    derivative 2cosθ(1+cosθ) vanishes) take the exact pole fallback
    x = C_x·λ, y = ±C_y."""
    k = _ECK4_CP * np.sin(phi)
    V0 = phi * phi
    theta = phi * (0.895168 + V0 * (0.0218849 + V0 * 0.00826809))
    conv = np.zeros(np.shape(phi), dtype=bool)
    with np.errstate(invalid="ignore", divide="ignore"):
        for _ in range(max_iter):
            c = np.cos(theta)
            s = np.sin(theta)
            V = (theta + s * (c + 2.0) - k) / (1.0 + c * (c + 2.0) - s * s)
            V = np.where(conv | ~np.isfinite(V), 0.0, V)
            theta = theta - V
            conv = conv | (np.abs(V) < tol)
            if conv.all():
                break
    x = np.where(conv, _ECK4_CX * lam * (1.0 + np.cos(theta)),
                 _ECK4_CX * lam)
    y = np.where(conv, _ECK4_CY * np.sin(theta),
                 np.where(theta < 0.0, -_ECK4_CY, _ECK4_CY))
    return x, y


def eck4_inv(x, y, over: bool = False):
    """Eckert IV closed-form inverse (eck4.cpp:53-92) with the pole
    row special case and the |lam| > π domain check."""
    sin_theta = y * _ECK4_RCY
    one_minus = 1.0 - np.abs(sin_theta)
    at_pole = (one_minus >= 0.0) & (one_minus <= 1e-12)
    theta = aasin(sin_theta)
    cos_theta = np.cos(theta)
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = np.where(at_pole, x / _ECK4_CX,
                       x / (_ECK4_CX * (1.0 + cos_theta)))
    phi = np.where(at_pole, np.where(sin_theta > 0, HALFPI, -HALFPI),
                   aasin((theta + sin_theta * (cos_theta + 2.0))
                         * _ECK4_RCP))
    if not over:
        over_pi = np.abs(lam) - np.pi
        bad = over_pi > 1e-10
        lam = np.where((over_pi > 0.0) & ~bad,
                       np.where(lam > 0, np.pi, -np.pi), lam)
        lam = np.where(bad, np.nan, lam)
        phi = np.where(bad, np.nan, phi)
    return lam, phi


# Robinson cubic interpolation tables (published Robinson 1974 node
# values with the cubic-spline coefficients used by the reference,
# src/projections/robin.cpp:27-70; stored as float32 exactly as the
# reference declares them `float`)
_ROBIN_X = np.array([
    [1.0, 2.2199e-17, -7.15515e-05, 3.1103e-06],
    [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
    [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
    [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
    [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
    [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
    [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
    [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
    [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
    [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
    [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
    [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
    [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
    [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
    [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
    [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
    [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
    [0.5722, -0.00906601, 0.000182, 6.24051e-06],
    [0.5322, -0.00677797, 0.000275608, 6.24051e-06],
], dtype=np.float32).astype(np.float64)

_ROBIN_Y = np.array([
    [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
    [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
    [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
    [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
    [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
    [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
    [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
    [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
    [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
    [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
    [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
    [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
    [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
    [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
    [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
    [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
    [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
    [0.9761, 0.00616527, -0.000256, -4.2106e-06],
    [1.0, 0.00328947, -0.000319159, -4.2106e-06],
], dtype=np.float32).astype(np.float64)

_ROBIN_FXC = 0.8487
_ROBIN_FYC = 1.3523
_ROBIN_C1 = 11.45915590261646417544  # nodes per radian (1/5deg)
_ROBIN_RC1 = 0.08726646259971647884  # 5 degrees in radians
_ROBIN_NODES = 18


def robin_fwd(lam, phi, _=None):
    """Robinson (robin.cpp s_forward): per-5-degree-node cubic
    V(C, dphi_deg) with the reference's coefficient tables."""
    dphi = np.abs(phi)
    i = np.floor(dphi * _ROBIN_C1 + 1e-15).astype(np.int64)
    i = np.clip(i, 0, _ROBIN_NODES)
    z = (dphi - _ROBIN_RC1 * i) / DEG_TO_RAD  # degrees past the node
    cx = _ROBIN_X[i]
    cy = _ROBIN_Y[i]
    vx = cx[:, 0] + z * (cx[:, 1] + z * (cx[:, 2] + z * cx[:, 3]))
    vy = cy[:, 0] + z * (cy[:, 1] + z * (cy[:, 2] + z * cy[:, 3]))
    x = vx * _ROBIN_FXC * lam
    y = np.where(phi < 0.0, -vy, vy) * _ROBIN_FYC
    return x, y


def robin_inv(x, y, _=None):
    """Robinson inverse (robin.cpp s_inverse): pathologic |Y|>=FYC
    rows snap to ±90° (error beyond ONEEPS), otherwise locate the
    5-degree table interval in Y space and Newton on the cubic."""
    ONEEPS = 1.000001
    lam = x / _ROBIN_FXC
    yf = np.abs(y / _ROBIN_FYC)
    bad = yf > ONEEPS
    at_pole = (yf >= 1.0) & ~bad
    # general rows: table interval search
    yg = np.minimum(yf, 1.0 - 1e-12)
    i = np.clip(np.floor(yg * _ROBIN_NODES).astype(np.int64),
                0, _ROBIN_NODES - 1)
    # the Y nodes are monotone; one up/down adjustment suffices after
    # the floor seed (the reference loops, but intervals are uniform
    # to within one node)
    for _ in range(2):
        i = np.where((i > 0) & (_ROBIN_Y[i, 0] > yg), i - 1, i)
        i = np.where((i < _ROBIN_NODES - 1) & (_ROBIN_Y[i + 1, 0] <= yg),
                     i + 1, i)
    T = _ROBIN_Y[i]
    t = 5.0 * (yg - T[:, 0]) / (_ROBIN_Y[i + 1, 0] - T[:, 0])
    with np.errstate(invalid="ignore", divide="ignore"):
        for _ in range(100):
            t1 = ((T[:, 0] + t * (T[:, 1] + t * (T[:, 2] + t * T[:, 3])))
                  - yg) / (T[:, 1] + 2 * t * T[:, 2] + t * t * 3.0 * T[:, 3])
            t1 = np.where(np.isfinite(t1), t1, 0.0)
            t = t - t1
            if np.all(np.abs(t1) < 1e-10):
                break
    phi = (5.0 * i + t) * DEG_TO_RAD
    phi = np.where(y < 0.0, -phi, phi)
    cx = _ROBIN_X[i]
    with np.errstate(invalid="ignore", divide="ignore"):
        lam_g = lam / (cx[:, 0] + t * (cx[:, 1]
                                       + t * (cx[:, 2] + t * cx[:, 3])))
    # pathologic rows: exactly (or nearly) the pole line
    phi = np.where(at_pole, np.where(y < 0, -HALFPI, HALFPI), phi)
    lam_p = lam / _ROBIN_X[_ROBIN_NODES, 0]
    lam = np.where(at_pole, lam_p, lam_g)
    bad = bad | (np.abs(lam) > np.pi)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


def laea_inv(x, y, C: LaeaConsts):
    """Closed-form LAEA inverse (laea.cpp:134-185 e_inverse,
    :200-240 s_inverse): authalic latitude series, no Newton."""
    if C.spherical:
        rh = np.hypot(x, y)
        with np.errstate(invalid="ignore"):
            z = 2.0 * np.arcsin(np.where(0.5 * rh > 1.0, np.nan, 0.5 * rh))
        sinz = np.sin(z)
        cosz = np.cos(z)
        if C.mode == "equit":
            with np.errstate(invalid="ignore", divide="ignore"):
                phi = np.where(np.abs(rh) <= EPS10, 0.0,
                               np.arcsin(np.clip(y * sinz / rh, -1, 1)))
            xx = x * sinz
            yy = cosz * rh
        elif C.mode == "obliq":
            with np.errstate(invalid="ignore", divide="ignore"):
                phi = np.where(
                    np.abs(rh) <= EPS10, C.phi0,
                    np.arcsin(np.clip(
                        cosz * C.sinb1 + y * sinz * C.cosb1 / np.where(
                            rh == 0, 1.0, rh), -1, 1)))
            xx = x * sinz * C.cosb1
            yy = (cosz - np.sin(phi) * C.sinb1) * rh
        elif C.mode == "n_pole":
            phi = HALFPI - z
            xx, yy = x, -y
        else:
            phi = z - HALFPI
            xx, yy = x, y
        if C.mode in ("equit", "obliq"):
            lam = np.where(yy == 0.0, 0.0, np.arctan2(xx, yy))
        else:
            lam = np.arctan2(xx, yy)
        return lam, phi
    if C.mode in ("equit", "obliq"):
        xx = x / C.dd
        yy = y * C.dd
        rho = np.hypot(xx, yy)
        arg = 0.5 * rho / C.rq
        with np.errstate(invalid="ignore"):
            Ce = 2.0 * np.arcsin(np.where(arg > 1.0, np.nan, arg))
        cCe = np.cos(Ce)
        sCe = np.sin(Ce)
        xx = xx * sCe
        if C.mode == "obliq":
            with np.errstate(invalid="ignore", divide="ignore"):
                ab = cCe * C.sinb1 + yy * sCe * C.cosb1 / np.where(
                    rho == 0, 1.0, rho)
            yy = rho * C.cosb1 * cCe - yy * C.sinb1 * sCe
        else:
            with np.errstate(invalid="ignore", divide="ignore"):
                ab = yy * sCe / np.where(rho == 0, 1.0, rho)
            yy = rho * cCe
        center = rho < EPS10
    else:
        if C.mode == "n_pole":
            xx, yy = x, -y
        else:
            xx, yy = x, y
        q = xx * xx + yy * yy
        ab = 1.0 - q / C.qp
        if C.mode == "s_pole":
            ab = -ab
        center = q == 0.0
    lam = np.arctan2(xx, yy)
    phi = _authlat(np.arcsin(np.clip(ab, -1.0, 1.0)), C.apa)
    lam = np.where(center, 0.0, lam)
    phi = np.where(center, C.phi0, phi)
    return lam, phi


def stere_inv(x, y, C: StereConsts, max_iter: int = 8, tol: float = 1e-10):
    """Closed-form stereographic inverse (stere.cpp:137-188 e_inverse
    with the bounded tp fixed-point, :190-232 s_inverse)."""
    rho = np.hypot(x, y)
    if C.spherical:
        c = 2.0 * np.arctan(rho / C.akm1)
        sinc = np.sin(c)
        cosc = np.cos(c)
        if C.mode == "equit":
            with np.errstate(invalid="ignore", divide="ignore"):
                phi = np.where(np.abs(rho) <= EPS10, 0.0,
                               np.arcsin(np.clip(y * sinc / np.where(
                                   rho == 0, 1.0, rho), -1, 1)))
            lam = np.where((cosc != 0.0) | (x != 0.0),
                           np.arctan2(x * sinc, cosc * rho), 0.0)
        elif C.mode == "obliq":
            sinph0, cosph0 = C.sinX1, C.cosX1
            with np.errstate(invalid="ignore", divide="ignore"):
                phi = np.where(np.abs(rho) <= EPS10, C.phi0,
                               np.arcsin(np.clip(
                                   cosc * sinph0 + y * sinc * cosph0
                                   / np.where(rho == 0, 1.0, rho), -1, 1)))
            cc = cosc - sinph0 * np.sin(phi)
            lam = np.where((cc != 0.0) | (x != 0.0),
                           np.arctan2(x * sinc * cosph0, cc * rho), 0.0)
        else:
            yy = -y if C.mode == "n_pole" else y
            phi = np.where(np.abs(rho) <= EPS10, C.phi0,
                           np.arcsin(np.clip(
                               -cosc if C.mode == "s_pole" else cosc, -1, 1)))
            lam = np.where((x == 0.0) & (yy == 0.0), 0.0, np.arctan2(x, yy))
        return lam, phi
    # ellipsoidal: one closed-form seed + bounded fixed-point on phi
    if C.mode in ("obliq", "equit"):
        tp0 = 2.0 * np.arctan2(rho * C.cosX1, C.akm1)
        cosphi = np.cos(tp0)
        sinphi = np.sin(tp0)
        with np.errstate(invalid="ignore", divide="ignore"):
            phi_l = np.where(
                rho == 0.0, np.arcsin(np.clip(cosphi * C.sinX1, -1, 1)),
                np.arcsin(np.clip(cosphi * C.sinX1 + y * sinphi * C.cosX1
                                  / np.where(rho == 0, 1.0, rho), -1, 1)))
        tp = np.tan(0.5 * (HALFPI + phi_l))
        xx = x * sinphi
        yy = rho * C.cosX1 * cosphi - y * C.sinX1 * sinphi
        halfpi = HALFPI
        halfe = 0.5 * C.e
    else:
        yy = -y if C.mode == "n_pole" else y
        tp = -rho / C.akm1
        phi_l = HALFPI - 2.0 * np.arctan(tp)
        halfpi = -HALFPI
        halfe = -0.5 * C.e
        xx = x
    phi = phi_l.copy()
    for _ in range(max_iter):
        sinphi = C.e * np.sin(phi_l)
        phi = 2.0 * np.arctan(
            tp * ((1.0 + sinphi) / (1.0 - sinphi)) ** halfe) - halfpi
        if np.all(np.abs(phi_l - phi) < tol):
            break
        phi_l = phi
    if C.mode == "s_pole":
        phi = -phi
    lam = np.where((xx == 0.0) & (yy == 0.0), 0.0, np.arctan2(xx, yy))
    return lam, phi


# ---------------------------------------------------------------- eqdc

@dataclass(frozen=True)
class EqdcConsts:
    n: float
    c: float
    rho0: float
    en: np.ndarray | None  # None = spherical
    ellips: bool


def eqdc_setup(params: dict, ell: Ellipsoid, phi0: float) -> EqdcConsts:
    """Equidistant conic setup (src/projections/eqdc.cpp:105-147)."""
    phi1 = float(params.get("lat_1", 0.0)) * np.pi / 180.0
    phi2 = float(params.get("lat_2", phi1 * 180.0 / np.pi)) * np.pi / 180.0
    if abs(phi1 + phi2) < EPS10 and abs(phi1 - phi2) < EPS10:
        raise ValueError("eqdc: |lat_1 + lat_2| should be > 0")
    sinphi = np.sin(phi1)
    cosphi = np.cos(phi1)
    n = sinphi
    secant = abs(phi1 - phi2) >= EPS10
    if ell.es > 0.0:
        en = enfn(ell.n)
        m1 = msfn(np.float64(sinphi), np.float64(cosphi), ell.es)
        ml1 = float(mlfn(np.float64(phi1), np.float64(sinphi),
                         np.float64(cosphi), en))
        if secant:
            s2, c2 = np.sin(phi2), np.cos(phi2)
            ml2 = float(mlfn(np.float64(phi2), np.float64(s2),
                             np.float64(c2), en))
            n = (m1 - msfn(np.float64(s2), np.float64(c2), ell.es)) \
                / (ml2 - ml1)
        c = ml1 + m1 / n
        rho0 = c - float(mlfn(np.float64(phi0), np.float64(np.sin(phi0)),
                              np.float64(np.cos(phi0)), en))
        return EqdcConsts(n=float(n), c=float(c), rho0=float(rho0),
                          en=en, ellips=True)
    if secant:
        n = (cosphi - np.cos(phi2)) / (phi2 - phi1)
    if n == 0:
        raise ValueError("eqdc: lat_1 + lat_2 should be > 0")
    c = phi1 + np.cos(phi1) / n
    rho0 = c - phi0
    return EqdcConsts(n=float(n), c=float(c), rho0=float(rho0),
                      en=None, ellips=False)


def eqdc_fwd(lam, phi, C: EqdcConsts):
    """eqdc.cpp:54-66."""
    if C.ellips:
        rho = C.c - mlfn(phi, np.sin(phi), np.cos(phi), C.en)
    else:
        rho = C.c - phi
    ln = lam * C.n
    return rho * np.sin(ln), C.rho0 - rho * np.cos(ln)


def eqdc_inv(x, y, C: EqdcConsts):
    """eqdc.cpp:68-88."""
    yy = C.rho0 - y
    rho = np.hypot(x, yy)
    sgn = -1.0 if C.n < 0 else 1.0
    rho_s = sgn * rho
    xs = sgn * x
    ys = sgn * yy
    phi = C.c - rho_s
    if C.ellips:
        phi = inv_mlfn(phi, C.en)
    with np.errstate(invalid="ignore"):
        lam = np.arctan2(xs, ys) / C.n
    center = rho == 0.0
    phi = np.where(center, HALFPI if C.n > 0 else -HALFPI, phi)
    lam = np.where(center, 0.0, lam)
    return lam, phi


# ---------------------------------------------------------------- nzmg

# complex series coefficients (src/projections/nzmg.cpp:36-41,55-57,77-79)
_NZMG_BF = np.array([0.7557853228 + 0.0j, 0.249204646 + 0.003371507j,
                     -0.001541739 + 0.041058560j, -0.10162907 + 0.01727609j,
                     -0.26623489 - 0.36249218j, -0.6870983 - 1.1651967j])
_NZMG_TPSI = (0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
              0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067,
              -0.00034)
_NZMG_TPHI = (1.5627014243, 0.5185406398, -0.03333098, -0.1052906,
              -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)
_SEC5_TO_RAD = 0.4848136811095359935899141023
_RAD_TO_SEC5 = 2.062648062470963551564733573
NZMG_PHI0 = -41.0 * np.pi / 180.0


def _zpoly1(z, C):
    """pj_zpoly1 (src/zpoly1.cpp:4-16): Horner then multiply by z."""
    a = np.full_like(z, C[-1])
    for k in range(len(C) - 2, -1, -1):
        a = C[k] + z * a
    return z * a


def _zpolyd1(z, C):
    """pj_zpolyd1 (src/zpoly1.cpp:18-40): value + derivative."""
    a = np.full_like(z, C[-1])
    b = np.full_like(z, C[-1])
    first = True
    for k in range(len(C) - 2, -1, -1):
        if first:
            first = False
        else:
            b = a + z * b
        a = C[k] + z * a
    b = a + z * b
    return z * a, b


def nzmg_fwd(lam, phi, _=None):
    """New Zealand Map Grid forward (nzmg.cpp:44-68): real Horner in
    sec-1e-5 latitude offset, then the 6-term complex polynomial.
    phi is already center-relative? No — the Operation subtracts lam0
    only; the phi0 offset happens here (kernel keeps phi absolute)."""
    dphi = (phi - NZMG_PHI0) * _RAD_TO_SEC5
    r = np.full_like(dphi, _NZMG_TPSI[-1])
    for k in range(len(_NZMG_TPSI) - 2, -1, -1):
        r = _NZMG_TPSI[k] + dphi * r
    r = r * dphi
    p = _zpoly1(r + 1j * lam, _NZMG_BF)
    return p.imag, p.real


def nzmg_inv(x, y, _=None, max_iter: int = 20, tol: float = 1e-10):
    """nzmg.cpp:70-105: complex Newton on the series, then the
    psi->phi real series."""
    p = y + 1j * x
    target = p.copy()
    for _i in range(max_iter):
        f, fp = _zpolyd1(p, _NZMG_BF)
        f = f - target
        with np.errstate(invalid="ignore", divide="ignore"):
            dp = -f / fp
        p = p + dp
        if np.all(np.abs(dp.real) + np.abs(dp.imag) <= tol):
            break
    lam = p.imag
    pr = p.real
    phi = np.full_like(pr, _NZMG_TPHI[-1])
    for k in range(len(_NZMG_TPHI) - 2, -1, -1):
        phi = _NZMG_TPHI[k] + pr * phi
    phi = NZMG_PHI0 + pr * phi * _SEC5_TO_RAD
    return lam, phi


# ---------------------------------------------------------------- cass

_CASS_C1 = 0.16666666666666666666
_CASS_C2 = 0.00833333333333333333
_CASS_C3 = 0.04166666666666666666
_CASS_C4 = 0.33333333333333333333
_CASS_C5 = 0.06666666666666666666


@dataclass(frozen=True)
class CassConsts:
    en: np.ndarray | None
    m0: float
    es: float
    one_es: float
    phi0: float
    hyperbolic: bool
    spherical: bool


def cass_setup(params: dict, ell: Ellipsoid, phi0: float) -> CassConsts:
    """Cassini-Soldner (src/projections/cass.cpp:105-135)."""
    if ell.es == 0.0:
        return CassConsts(en=None, m0=0.0, es=0.0, one_es=1.0, phi0=phi0,
                          hyperbolic=False, spherical=True)
    en = enfn(ell.n)
    m0 = float(mlfn(np.float64(phi0), np.float64(np.sin(phi0)),
                    np.float64(np.cos(phi0)), en))
    return CassConsts(en=en, m0=m0, es=ell.es, one_es=ell.one_es, phi0=phi0,
                      hyperbolic="hyperbolic" in params, spherical=False)


def cass_fwd(lam, phi, C: CassConsts):
    """cass.cpp e_forward (:25-49) / s_forward (:51-56)."""
    if C.spherical:
        x = np.arcsin(np.clip(np.cos(phi) * np.sin(lam), -1.0, 1.0))
        y = np.arctan2(np.tan(phi), np.cos(lam)) - C.phi0
        return x, y
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    M = mlfn(phi, sinphi, cosphi, C.en)
    nu_sq = 1.0 / (1.0 - C.es * sinphi * sinphi)
    nu = np.sqrt(nu_sq)
    with np.errstate(invalid="ignore", divide="ignore"):
        tanphi = np.tan(phi)
    T = tanphi * tanphi
    A = lam * cosphi
    Cc = C.es * (cosphi * cosphi) / (1.0 - C.es)
    A2 = A * A
    x = nu * A * (1.0 - A2 * T * (_CASS_C1 + (8.0 - T + 8.0 * Cc) * A2 * _CASS_C2))
    y = M - C.m0 + nu * tanphi * A2 * (0.5 + (5.0 - T + 6.0 * Cc) * A2 * _CASS_C3)
    if C.hyperbolic:
        rho = nu_sq * (1.0 - C.es) * nu
        y = y - y * y * y / (6.0 * rho * nu)
    return x, y


def cass_inv(x, y, C: CassConsts):
    """cass.cpp e_inverse (:58-85: series seed + generic 2D Newton
    refinement at 1e-12, mirrored with the repo's vectorized
    generic_inverse) / s_inverse (:87-93)."""
    if C.spherical:
        dd = y + C.phi0
        phi = np.arcsin(np.clip(np.sin(dd) * np.cos(x), -1.0, 1.0))
        lam = np.arctan2(np.tan(x), np.cos(dd))
        return lam, phi
    phi1 = inv_mlfn(C.m0 + y, C.en)
    tanphi1 = np.tan(phi1)
    T1 = tanphi1 * tanphi1
    sinphi1 = np.sin(phi1)
    nu1_sq = 1.0 / (1.0 - C.es * sinphi1 * sinphi1)
    nu1 = np.sqrt(nu1_sq)
    rho1 = nu1_sq * (1.0 - C.es) * nu1
    D = x / nu1
    D2 = D * D
    phi = phi1 - (nu1 * tanphi1 / rho1) * D2 * (0.5 - (1.0 + 3.0 * T1) * D2 * _CASS_C3)
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = D * (1.0 + T1 * D2 * (-_CASS_C4 + (1.0 + 3.0 * T1) * D2 * _CASS_C5)) / np.cos(phi1)
    # the reference refines the analytic seed with the generic 2D
    # Newton unconditionally (cass.cpp:76-83) — for the hyperbolic
    # variant this is what inverts the extra -y^3/(6 rho nu) term
    from .generic_inverse import generic_inverse

    lam, phi = generic_inverse(
        lambda la, ph: cass_fwd(la, ph, C), x, y,
        lam0=lam, phi0=phi, seed_from_xy=False,
        max_iter=4 if not C.hyperbolic else 10)
    return lam, phi


# ---------------------------------------------------------------- poly

@dataclass(frozen=True)
class PolyConsts:
    en: np.ndarray | None
    ml0: float
    es: float
    one_es: float
    phi0: float
    spherical: bool


def poly_setup(params: dict, ell: Ellipsoid, phi0: float) -> PolyConsts:
    """American polyconic (src/projections/poly.cpp:154-177)."""
    if ell.es == 0.0:
        return PolyConsts(en=None, ml0=-phi0, es=0.0, one_es=1.0,
                          phi0=phi0, spherical=True)
    en = enfn(ell.n)
    ml0 = float(mlfn(np.float64(phi0), np.float64(np.sin(phi0)),
                     np.float64(np.cos(phi0)), en))
    return PolyConsts(en=en, ml0=ml0, es=ell.es, one_es=ell.one_es,
                      phi0=phi0, spherical=False)


_POLY_TOL = 1e-10


def poly_fwd(lam, phi, C: PolyConsts):
    """poly.cpp e_forward (:25-46) / s_forward (:48-64)."""
    small = np.abs(phi) <= _POLY_TOL
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.spherical:
            cot = 1.0 / np.tan(phi)
            E = lam * np.sin(phi)
            x = np.sin(E) * cot
            y = phi - C.phi0 + cot * (1.0 - np.cos(E))
            x = np.where(small, lam, x)
            y = np.where(small, C.ml0, y)
        else:
            sp = np.sin(phi)
            cp = np.cos(phi)
            ms = np.where(np.abs(cp) > _POLY_TOL,
                          msfn(sp, cp, C.es) / np.where(sp == 0, 1.0, sp),
                          0.0)
            E = lam * sp
            x = ms * np.sin(E)
            y = (mlfn(phi, sp, cp, C.en) - C.ml0) + ms * (1.0 - np.cos(E))
            x = np.where(small, lam, x)
            y = np.where(small, -C.ml0, y)
    return x, y


def poly_inv(x, y, C: PolyConsts, max_iter: int = 20, tol: float = 1e-12):
    """poly.cpp e_inverse (:66-115) / s_inverse (:117-145), Newton on
    phi with per-point masking."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.spherical:
            yy = C.phi0 + y
            small = np.abs(yy) <= _POLY_TOL
            B = x * x + yy * yy
            phi = yy.copy()
            for _ in range(10):
                tp = np.tan(phi)
                dphi = ((yy * (phi * tp + 1.0) - phi
                         - 0.5 * (phi * phi + B) * tp)
                        / ((phi - yy) / tp - 1.0))
                phi = phi - dphi
                if np.all(np.abs(dphi) <= 1e-10):
                    break
            lam = np.arcsin(np.clip(x * np.tan(phi), -1.0, 1.0)) / np.sin(phi)
            lam = np.where(small, x, lam)
            phi = np.where(small, 0.0, phi)
            return lam, phi
        yy = y + C.ml0
        small = np.abs(yy) <= _POLY_TOL
        r = yy * yy + x * x
        phi = yy.copy()
        for _ in range(max_iter):
            sp = np.sin(phi)
            cp = np.cos(phi)
            s2ph = sp * cp
            mlp = np.sqrt(1.0 - C.es * sp * sp)
            c = sp * mlp / cp
            ml = mlfn(phi, sp, cp, C.en)
            mlb = ml * ml + r
            mlp = C.one_es / (mlp * mlp * mlp)
            dphi = ((ml + ml + c * mlb - 2.0 * yy * (c * ml + 1.0))
                    / (C.es * s2ph * (mlb - 2.0 * yy * ml) / c
                       + 2.0 * (yy - ml) * (c * mlp - 1.0 / s2ph)
                       - mlp - mlp))
            phi = phi + dphi
            if np.all(np.abs(dphi) <= tol):
                break
        cs = np.sin(phi)
        lam = (np.arcsin(np.clip(x * np.tan(phi)
                                 * np.sqrt(1.0 - C.es * cs * cs), -1, 1))
               / np.sin(phi))
        lam = np.where(small, x, lam)
        phi = np.where(small, 0.0, phi)
    return lam, phi


# ---------------------------------------------------------------- bonne

@dataclass(frozen=True)
class BonneConsts:
    phi1: float
    cphi1: float
    am1: float
    m1: float
    en: np.ndarray | None
    es: float
    spherical: bool


def bonne_setup(params: dict, ell: Ellipsoid) -> BonneConsts:
    """Bonne (src/projections/bonne.cpp:116-151)."""
    phi1 = float(params.get("lat_1", 0.0)) * np.pi / 180.0
    if abs(phi1) < EPS10:
        raise ValueError("bonne: |lat_1| should be > 0")
    if ell.es != 0.0:
        en = enfn(ell.n)
        am1 = np.sin(phi1)
        c = np.cos(phi1)
        m1 = float(mlfn(np.float64(phi1), np.float64(am1), np.float64(c), en))
        am1 = c / (np.sqrt(1.0 - ell.es * am1 * am1) * am1)
        return BonneConsts(phi1=phi1, cphi1=0.0, am1=float(am1), m1=m1,
                           en=en, es=ell.es, spherical=False)
    cphi1 = 0.0 if abs(phi1) + EPS10 >= HALFPI else 1.0 / np.tan(phi1)
    return BonneConsts(phi1=phi1, cphi1=float(cphi1), am1=0.0, m1=0.0,
                       en=None, es=0.0, spherical=True)


def bonne_fwd(lam, phi, C: BonneConsts):
    """bonne.cpp e_forward (:21-42) / s_forward (:44-58)."""
    if C.spherical:
        rh = C.cphi1 + C.phi1 - phi
        with np.errstate(invalid="ignore", divide="ignore"):
            E = lam * np.cos(phi) / rh
            x = rh * np.sin(E)
            y = C.cphi1 - rh * np.cos(E)
        small = np.abs(rh) <= EPS10
        return np.where(small, 0.0, x), np.where(small, 0.0, y)
    E = np.sin(phi)
    c = np.cos(phi)
    rh = C.am1 + C.m1 - mlfn(phi, E, c, C.en)
    with np.errstate(invalid="ignore", divide="ignore"):
        E2 = c * lam / (rh * np.sqrt(1.0 - C.es * E * E))
        x = rh * np.sin(E2)
        y = C.am1 - rh * np.cos(E2)
    small = np.abs(rh) <= EPS10
    return np.where(small, 0.0, x), np.where(small, 0.0, y)


def bonne_inv(x, y, C: BonneConsts):
    """bonne.cpp s_inverse (:60-86) / e_inverse (:88-113)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.spherical:
            yy = C.cphi1 - y
            rh = np.copysign(np.hypot(x, yy), C.phi1)
            phi = C.cphi1 + C.phi1 - rh
            bad = np.abs(phi) > HALFPI
            pole = HALFPI - np.abs(phi) <= EPS10
            lm = rh / np.cos(phi)
            if C.phi1 > 0:
                lam = lm * np.arctan2(x, yy)
            else:
                lam = lm * np.arctan2(-x, -yy)
            lam = np.where(pole, 0.0, lam)
            lam = np.where(bad, np.nan, lam)
            phi = np.where(bad, np.nan, phi)
            return lam, phi
        yy = C.am1 - y
        rh = np.copysign(np.hypot(x, yy), C.phi1)
        phi = inv_mlfn(C.am1 + C.m1 - rh, C.en)
        abs_phi = np.abs(phi)
        sinphi = np.sin(phi)
        lm = rh * np.sqrt(1.0 - C.es * sinphi * sinphi) / np.cos(phi)
        if C.phi1 > 0:
            lam = lm * np.arctan2(x, yy)
        else:
            lam = lm * np.arctan2(-x, -yy)
        pole = np.abs(abs_phi - HALFPI) <= EPS10
        bad = (abs_phi > HALFPI) & ~pole
        lam = np.where(pole, 0.0, lam)
        lam = np.where(bad, np.nan, lam)
        phi = np.where(bad, np.nan, phi)
    return lam, phi


# ----------------------------------------------------------------- igh

IGH_PHI_B = (40 + 44 / 60.0 + 11.8 / 3600.0) * np.pi / 180.0

_D = {d: d * np.pi / 180.0 for d in (10, 20, 30, 40, 50, 60, 80, 90,
                                     100, 140, 160, 180)}
_IGH_EPS = 1e-10


@dataclass(frozen=True)
class IghConsts:
    moll: MollConsts
    dy0: float
    # per-zone (is_moll, lam0, x0, y0), index 0..11 for zones 1..12
    zones: tuple


def igh_setup() -> IghConsts:
    """Interrupted Goode homolosine (src/projections/igh.cpp:243-293):
    12 sub-projections — Mollweide above |phi|=40d44'11.8", sinusoidal
    below, with per-zone central meridians and false offsets."""
    moll = moll_setup(HALFPI)
    # dy0: sinu y == phi at the boundary; moll y = C_y sin(theta(phi))
    xb, yb_moll = moll_fwd(np.array([0.0]), np.array([IGH_PHI_B]), moll)
    dy0 = float(IGH_PHI_B - yb_moll[0])
    d = _D
    zones = (
        (True, -d[100], -d[100], dy0),    # 1
        (True, d[30], d[30], dy0),        # 2
        (False, -d[100], -d[100], 0.0),   # 3
        (False, d[30], d[30], 0.0),       # 4
        (False, -d[160], -d[160], 0.0),   # 5
        (False, -d[60], -d[60], 0.0),     # 6
        (False, d[20], d[20], 0.0),       # 7
        (False, d[140], d[140], 0.0),     # 8
        (True, -d[160], -d[160], -dy0),   # 9
        (True, -d[60], -d[60], -dy0),     # 10
        (True, d[20], d[20], -dy0),       # 11
        (True, d[140], d[140], -dy0),     # 12
    )
    return IghConsts(moll=moll, dy0=dy0, zones=zones)


def _igh_zone_from(lam, phi):
    """Zone labels 1..12 from (lam, phi); igh.cpp:58-85."""
    d = _D
    z = np.empty(lam.shape, dtype=np.int64)
    top = phi >= IGH_PHI_B
    mid = (phi >= 0) & ~top
    low = (phi >= -IGH_PHI_B) & (phi < 0)
    bot = phi < -IGH_PHI_B
    z[top] = np.where(lam[top] <= -d[40], 1, 2)
    z[mid] = np.where(lam[mid] <= -d[40], 3, 4)
    for m, base in ((low, 5), (bot, 9)):
        lm = lam[m]
        z[m] = np.where(lm <= -d[100], base,
                        np.where(lm <= -d[20], base + 1,
                                 np.where(lm <= d[80], base + 2, base + 3)))
    return z


def igh_fwd(lam, phi, C: IghConsts):
    """igh.cpp s_forward (:57-93), vectorized: compute zone, then the
    masked sinu/moll forward with per-zone lam0/x0/y0."""
    z = _igh_zone_from(lam, phi)
    zi = z - 1
    is_moll = np.array([zz[0] for zz in C.zones])[zi]
    lam0 = np.array([zz[1] for zz in C.zones])[zi]
    x0 = np.array([zz[2] for zz in C.zones])[zi]
    y0 = np.array([zz[3] for zz in C.zones])[zi]
    lrel = lam - lam0
    xs = lrel * np.cos(phi)
    ys = phi
    xm, ym = moll_fwd(lrel, phi, C.moll)
    x = np.where(is_moll, xm, xs) + x0
    y = np.where(is_moll, ym, ys) + y0
    return x, y


def igh_inv(x, y, C: IghConsts):
    """igh.cpp s_inverse (:95-186): zone from plane coordinates, the
    sub-projection inverse, then the per-zone validity gate."""
    d = _D
    y90 = C.dy0 + np.sqrt(2.0)
    z = np.zeros(x.shape, dtype=np.int64)
    inside = (y <= y90 + _IGH_EPS) & (y >= -y90 + _IGH_EPS)
    top = inside & (y >= IGH_PHI_B)
    mid = inside & (y >= 0) & ~top
    low = inside & (y >= -IGH_PHI_B) & (y < 0)
    bot = inside & (y < -IGH_PHI_B)
    z[top] = np.where(x[top] <= -d[40], 1, 2)
    z[mid] = np.where(x[mid] <= -d[40], 3, 4)
    for m, base in ((low, 5), (bot, 9)):
        xm = x[m]
        z[m] = np.where(xm <= -d[100], base,
                        np.where(xm <= -d[20], base + 1,
                                 np.where(xm <= d[80], base + 2, base + 3)))
    zi = np.maximum(z - 1, 0)
    is_moll = np.array([zz[0] for zz in C.zones])[zi]
    lam0 = np.array([zz[1] for zz in C.zones])[zi]
    x0 = np.array([zz[2] for zz in C.zones])[zi]
    y0 = np.array([zz[3] for zz in C.zones])[zi]
    xr = x - x0
    yr = y - y0
    with np.errstate(invalid="ignore", divide="ignore"):
        ls, ps = xr / np.cos(yr), yr
        lm, pm = moll_inv(xr, yr, C.moll)
    lam = np.where(is_moll, lm, ls) + lam0
    phi = np.where(is_moll, pm, ps)
    # validity gate (igh.cpp:137-180)
    e = _igh_EPS = _IGH_EPS
    ok = np.zeros(x.shape, dtype=bool)
    rules = {
        1: lambda la, ph: ((la >= -d[180] - e) & (la <= -d[40] + e))
        | ((la >= -d[40] - e) & (la <= -d[10] + e)
           & (ph >= d[60] - e) & (ph <= d[90] + e)),
        2: lambda la, ph: ((la >= -d[40] - e) & (la <= d[180] + e))
        | ((la >= -d[180] - e) & (la <= -d[160] + e)
           & (ph >= d[50] - e) & (ph <= d[90] + e))
        | ((la >= -d[50] - e) & (la <= -d[40] + e)
           & (ph >= d[60] - e) & (ph <= d[90] + e)),
        3: lambda la, ph: (la >= -d[180] - e) & (la <= -d[40] + e),
        4: lambda la, ph: (la >= -d[40] - e) & (la <= d[180] + e),
        5: lambda la, ph: (la >= -d[180] - e) & (la <= -d[100] + e),
        6: lambda la, ph: (la >= -d[100] - e) & (la <= -d[20] + e),
        7: lambda la, ph: (la >= -d[20] - e) & (la <= d[80] + e),
        8: lambda la, ph: (la >= d[80] - e) & (la <= d[180] + e),
        9: lambda la, ph: (la >= -d[180] - e) & (la <= -d[100] + e),
        10: lambda la, ph: (la >= -d[100] - e) & (la <= -d[20] + e),
        11: lambda la, ph: (la >= -d[20] - e) & (la <= d[80] + e),
        12: lambda la, ph: (la >= d[80] - e) & (la <= d[180] + e),
    }
    for zz, rule in rules.items():
        m = z == zz
        if m.any():
            ok[m] = rule(lam[m], phi[m])
    lam = np.where(ok, lam, np.nan)
    phi = np.where(ok, phi, np.nan)
    return lam, phi


# ----------------------------------------------- mod_ster family

# fixed complex coefficient tables (mod_ster.cpp:128-248)
_MODSTER_TABLES = {
    "mil_os": (np.array([0.924500 + 0j, 0j, 0.019430 + 0j]),
               np.radians(20.0), np.radians(18.0), None, None),
    "lee_os": (np.array([0.721316 + 0j, 0j, -0.0088162 - 0.00617325j]),
               np.radians(-165.0), np.radians(-10.0), None, None),
    "gs48": (np.array([0.98879 + 0j, 0j, -0.050909 + 0j, 0j,
                       0.075528 + 0j]),
             np.radians(-96.0), np.radians(39.0), 6370997.0, 0.0),
    "alsk_e": (np.array([0.9945303 + 0j, 0.0052083 - 0.0027404j,
                         0.0072721 + 0.0048181j, -0.0151089 - 0.1932526j,
                         0.0642675 - 0.1381226j, 0.3582802 - 0.2884586j]),
               np.radians(-152.0), np.radians(64.0), 6378206.4, 0.00676866),
    "alsk_s": (np.array([0.9972523 + 0j, 0.0052513 - 0.0041175j,
                         0.0074606 + 0.0048125j, -0.0153783 - 0.1968253j,
                         0.0636871 - 0.1408027j, 0.3660976 - 0.2937382j]),
               np.radians(-152.0), np.radians(64.0), 6370997.0, 0.0),
    "gs50_e": (np.array([0.9827497 + 0j, 0.0210669 + 0.0053804j,
                         -0.1031415 - 0.0571664j, -0.0323337 - 0.0322847j,
                         0.0502303 + 0.1211983j, 0.0251805 + 0.0895678j,
                         -0.0012315 - 0.1416121j, 0.0072202 - 0.1317091j,
                         -0.0194029 + 0.0759677j, -0.0210072 + 0.0834037j]),
               np.radians(-120.0), np.radians(45.0), 6378206.4, 0.00676866),
    "gs50_s": (np.array([0.9842990 + 0j, 0.0211642 + 0.0037608j,
                         -0.1036018 - 0.0575102j, -0.0329095 - 0.0320119j,
                         0.0499471 + 0.1223335j, 0.0260460 + 0.0899805j,
                         0.0007388 - 0.1435792j, 0.0075848 - 0.1334108j,
                         -0.0216473 + 0.0776645j, -0.0225161 + 0.0853673j]),
               np.radians(-120.0), np.radians(45.0), 6370997.0, 0.0),
}


@dataclass(frozen=True)
class ModSterConsts:
    zcoeff: np.ndarray
    schio: float
    cchio: float
    e: float
    phi0: float


def mod_ster_setup(zcoeff, phi0: float, e: float, es: float) -> ModSterConsts:
    """mod_ster.cpp:106-126: conformal latitude of the center."""
    if es != 0.0:
        esphi = e * np.sin(phi0)
        chio = 2.0 * np.arctan(np.tan((HALFPI + phi0) * 0.5)
                               * ((1.0 - esphi) / (1.0 + esphi))
                               ** (e * 0.5)) - HALFPI
    else:
        chio = phi0
    return ModSterConsts(zcoeff=np.asarray(zcoeff), schio=float(np.sin(chio)),
                         cchio=float(np.cos(chio)), e=e, phi0=phi0)


def mod_ster_fwd(lam, phi, C: ModSterConsts):
    """mod_ster.cpp:22-50: conformal-sphere stereographic, then the
    complex distortion polynomial."""
    sinlon = np.sin(lam)
    coslon = np.cos(lam)
    esphi = C.e * np.sin(phi)
    chi = 2.0 * np.arctan(np.tan((HALFPI + phi) * 0.5)
                          * ((1.0 - esphi) / (1.0 + esphi))
                          ** (C.e * 0.5)) - HALFPI
    schi = np.sin(chi)
    cchi = np.cos(chi)
    denom = 1.0 + C.schio * schi + C.cchio * cchi * coslon
    with np.errstate(invalid="ignore", divide="ignore"):
        s = 2.0 / np.where(denom == 0, np.nan, denom)
        p = (s * cchi * sinlon) \
            + 1j * (s * (C.cchio * schi - C.schio * cchi * coslon))
        out = _zpoly1(p, C.zcoeff)
    return out.real, out.imag


def mod_ster_inv(x, y, C: ModSterConsts, max_iter: int = 20,
                 tol: float = 1e-12):
    """mod_ster.cpp:52-104: complex Newton then conformal-to-geodetic
    fixed point."""
    with np.errstate(invalid="ignore", divide="ignore"):
        p = x + 1j * y
        target = p.copy()
        for _ in range(max_iter):
            f, fp = _zpolyd1(p, C.zcoeff)
            f = f - target
            dp = -f / fp
            p = p + dp
            if np.all(np.abs(dp.real) + np.abs(dp.imag) <= tol):
                break
        rh = np.hypot(p.real, p.imag)
        z = 2.0 * np.arctan(0.5 * rh)
        sinz = np.sin(z)
        cosz = np.cos(z)
        chi = np.arcsin(np.clip(
            cosz * C.schio + p.imag * sinz * C.cchio
            / np.where(rh == 0, 1.0, rh), -1, 1))
        phi = chi.copy()
        for _ in range(max_iter):
            esphi = C.e * np.sin(phi)
            dphi = 2.0 * np.arctan(np.tan((HALFPI + chi) * 0.5)
                                   * ((1.0 + esphi) / (1.0 - esphi))
                                   ** (C.e * 0.5)) - HALFPI - phi
            phi = phi + dphi
            if np.all(np.abs(dphi) <= tol):
                break
        lam = np.arctan2(p.real * sinz,
                         rh * C.cchio * cosz - p.imag * C.schio * sinz)
    center = np.abs(rh) <= tol
    lam = np.where(center, 0.0, lam)
    phi = np.where(center, C.phi0, phi)
    return lam, phi


# ----------------------------------------------- lcca / ccon / rpoly

@dataclass(frozen=True)
class LccaConsts:
    en: np.ndarray
    l: float
    M0: float
    r0: float
    C: float
    k0: float


def lcca_setup(ell: Ellipsoid, k0: float, phi0: float) -> LccaConsts:
    """lcca.cpp:127-155 (LCC alternative, EST-97)."""
    if phi0 == 0.0:
        raise ValueError("lcca: lat_0 should be different from 0")
    en = enfn(ell.n)
    ll = np.sin(phi0)
    M0 = float(mlfn(np.float64(phi0), np.float64(ll),
                    np.float64(np.cos(phi0)), en))
    s2p0 = ll * ll
    R0 = 1.0 / (1.0 - ell.es * s2p0)
    N0 = np.sqrt(R0)
    R0 = R0 * ell.one_es * N0
    r0 = N0 / np.tan(phi0)
    Cc = 1.0 / (6.0 * R0 * N0)
    return LccaConsts(en=en, l=float(ll), M0=M0, r0=float(r0),
                      C=float(Cc), k0=k0)


def lcca_fwd(lam, phi, C: LccaConsts):
    S = mlfn(phi, np.sin(phi), np.cos(phi), C.en) - C.M0
    dr = S * (1.0 + S * S * C.C)
    r = C.r0 - dr
    ll = lam * C.l
    return C.k0 * r * np.sin(ll), C.k0 * (C.r0 - r * np.cos(ll))


def lcca_inv(x, y, C: LccaConsts, max_iter: int = 10, tol: float = 1e-12):
    x = x / C.k0
    y = y / C.k0
    theta = np.arctan2(x, C.r0 - y)
    dr = y - x * np.tan(0.5 * theta)
    lam = theta / C.l
    S = dr.copy()
    for _ in range(max_iter):
        dif = (S * (1.0 + S * S * C.C) - dr) / (1.0 + 3.0 * S * S * C.C)
        S = S - dif
        if np.all(np.abs(dif) < tol):
            break
    phi = inv_mlfn(S + C.M0, C.en)
    return lam, phi


def ccon_setup(params: dict) -> tuple:
    """ccon.cpp: (phi1, sinphi1, ctgphi1)."""
    phi1 = np.radians(float(params.get("lat_1", 0.0)))
    if abs(phi1) < EPS10:
        raise ValueError("ccon: |lat_1| should be > 0")
    return float(phi1), float(np.sin(phi1)), \
        float(np.cos(phi1) / np.sin(phi1))


def ccon_fwd(lam, phi, phi1, sinphi1, ctgphi1):
    r = ctgphi1 - np.tan(phi - phi1)
    return r * np.sin(lam * sinphi1), ctgphi1 - r * np.cos(lam * sinphi1)


def ccon_inv(x, y, phi1, sinphi1, ctgphi1):
    yy = ctgphi1 - y
    phi = phi1 - np.arctan(np.hypot(x, yy) - ctgphi1)
    lam = np.arctan2(x, yy) / sinphi1
    return lam, phi


def rpoly_setup(params: dict) -> tuple:
    """rpoly.cpp: (mode, fxa, fxb)."""
    phi1 = abs(np.radians(float(params.get("lat_ts", 0.0))))
    mode = phi1 > 1e-9
    if mode:
        fxb = 0.5 * np.sin(phi1)
        fxa = 0.5 / fxb
    else:
        fxa = fxb = 0.0
    return mode, float(fxa), float(fxb)


def rpoly_fwd(lam, phi, mode, fxa, fxb, phi0):
    """rpoly.cpp (rectangular polyconic, fwd only)."""
    if mode:
        fa = np.tan(lam * fxb) * fxa
    else:
        fa = 0.5 * lam
    eq = np.abs(phi) < 1e-9
    with np.errstate(invalid="ignore", divide="ignore"):
        cot = 1.0 / np.tan(phi)
        fa2 = 2.0 * np.arctan(fa * np.sin(phi))
        x = np.sin(fa2) * cot
        y = phi - phi0 + (1.0 - np.cos(fa2)) * cot
    x = np.where(eq, fa + fa, x)
    y = np.where(eq, -phi0, y)
    return x, y


# ----------------------------------------------- gstmerc

@dataclass(frozen=True)
class GstmercConsts:
    n1: float
    n2: float
    c: float
    XS: float
    YS: float
    e: float
    a: float
    ra: float


def gstmerc_setup(ell: Ellipsoid, k0: float, phi0: float) -> GstmercConsts:
    """gstmerc.cpp:53-74 (Gauss-Schreiber TM, Reunion grid)."""
    es, e = ell.es, ell.e
    n1 = np.sqrt(1.0 + es * np.cos(phi0) ** 4 / (1.0 - es))
    phic = np.arcsin(np.sin(phi0) / n1)
    sp = np.sin(phi0) / n1
    c = (np.log(float(tsfn(np.float64(-phic), np.float64(-sp), 0.0)))
         - n1 * np.log(float(tsfn(np.float64(-phi0),
                                  np.float64(-np.sin(phi0)), e))))
    n2 = k0 * ell.a * np.sqrt(1.0 - es) / (1.0 - es * np.sin(phi0) ** 2)
    return GstmercConsts(n1=float(n1), n2=float(n2), c=float(c), XS=0.0,
                         YS=float(-n2 * phic), e=e, a=ell.a,
                         ra=1.0 / ell.a)


def gstmerc_fwd(lam, phi, C: GstmercConsts):
    """gstmerc.cpp:24-38."""
    L = C.n1 * lam
    Ls = C.c + C.n1 * np.log(tsfn(-phi, -np.sin(phi), C.e))
    sinLs1 = np.sin(L) / np.cosh(Ls)
    Ls1 = np.log(tsfn(-np.arcsin(sinLs1), -sinLs1, 0.0))
    x = (C.XS + C.n2 * Ls1) * C.ra
    y = (C.YS + C.n2 * np.arctan(np.sinh(Ls) / np.cos(L))) * C.ra
    return x, y


def gstmerc_inv(x, y, C: GstmercConsts):
    """gstmerc.cpp:40-52."""
    L = np.arctan(np.sinh((x * C.a - C.XS) / C.n2)
                  / np.cos((y * C.a - C.YS) / C.n2))
    sinC = np.sin((y * C.a - C.YS) / C.n2) \
        / np.cosh((x * C.a - C.XS) / C.n2)
    LC = np.log(tsfn(-np.arcsin(sinC), -sinC, 0.0))
    lam = L / C.n1
    phi = -phi2((np.exp((LC - C.c) / C.n1)), C.e)
    return lam, phi


# -------------------------------- generic interrupted compositions
# (igh_o.cpp, imoll.cpp, imoll_o.cpp — same skeleton as igh)

_DD = {d: d * np.pi / 180.0 for d in (10, 20, 40, 50, 60, 80, 90, 100,
                                      110, 130, 140, 150, 160, 180)}
_I_EPS = 1e-10


@dataclass(frozen=True)
class InterruptedConsts:
    kind: str  # 'igh_o' | 'imoll' | 'imoll_o'
    moll: MollConsts
    dy0: float
    zones: tuple  # idx0 -> (is_moll, lam0, x0, y0)
    boundaries: tuple = ()  # imoll kinds: inverse zone x boundaries


def interrupted_setup(kind: str) -> InterruptedConsts:
    moll = moll_setup(HALFPI)
    d = _DD
    if kind == "igh_o":
        _, yb = moll_fwd(np.array([0.0]), np.array([IGH_PHI_B]), moll)
        dy0 = float(IGH_PHI_B - yb[0])
        zones = (
            (True, -d[140], -d[140], dy0), (True, -d[10], -d[10], dy0),
            (True, d[130], d[130], dy0),
            (False, -d[140], -d[140], 0.0), (False, -d[10], -d[10], 0.0),
            (False, d[130], d[130], 0.0),
            (False, -d[110], -d[110], 0.0), (False, d[20], d[20], 0.0),
            (False, d[150], d[150], 0.0),
            (True, -d[110], -d[110], -dy0), (True, d[20], d[20], -dy0),
            (True, d[150], d[150], -dy0),
        )
    elif kind == "imoll":
        dy0 = 0.0
        lam0s = [-d[100], np.radians(30.0), -d[160], -d[60], d[20], d[140]]
        x0 = [v for v in lam0s]
        eps = _I_EPS

        def off(z1, z2, lam, p1, p2):
            x1, _ = moll_fwd(np.array([lam - lam0s[z1 - 1]]),
                             np.array([p1]), moll)
            x2, _ = moll_fwd(np.array([lam - lam0s[z2 - 1]]),
                             np.array([p2]), moll)
            return (float(x2[0]) + x0[z2 - 1]) - (float(x1[0]) + x0[z1 - 1])

        # seam matching (imoll.cpp "Adjust zones", order-sensitive)
        x0[2] += off(3, 1, -d[160], -eps, eps)
        x0[1] += off(2, 1, -d[40], eps, eps)
        x0[3] += off(4, 1, -d[100], -eps, eps)
        x0[4] += off(5, 2, -d[20], -eps, eps)
        x0[5] += off(6, 2, d[80], -eps, eps)
        zones = tuple((True, lam0s[i], x0[i], 0.0) for i in range(6))
    else:  # imoll_o
        dy0 = 0.0
        lam0s = [-d[140], -d[10], d[130], -d[110], d[20], d[150]]
        x0 = [v for v in lam0s]
        eps = _I_EPS

        def off(z1, z2, lam, p1, p2):
            x1, _ = moll_fwd(np.array([lam - lam0s[z1 - 1]]),
                             np.array([p1]), moll)
            x2, _ = moll_fwd(np.array([lam - lam0s[z2 - 1]]),
                             np.array([p2]), moll)
            return (float(x2[0]) + x0[z2 - 1]) - (float(x1[0]) + x0[z1 - 1])

        x0[1] += off(2, 1, -d[90], eps, eps)
        x0[2] += off(3, 2, d[60], eps, eps)
        x0[3] += off(4, 1, -d[180], -eps, eps)
        x0[4] += off(5, 2, -d[60], -eps, eps)
        x0[5] += off(6, 3, d[90], -eps, eps)
        zones = tuple((True, lam0s[i], x0[i], 0.0) for i in range(6))
    C0 = InterruptedConsts(kind=kind, moll=moll, dy0=dy0, zones=zones)
    if kind == "igh_o":
        return C0
    # inverse zone x boundaries: forward at the seam +- eps, averaged
    # (imoll.cpp compute_zone_x_boundary)
    eps = _I_EPS

    def xbound(lam, phi):
        x1, _ = interrupted_fwd(np.array([lam - eps]), np.array([phi]), C0)
        x2, _ = interrupted_fwd(np.array([lam + eps]), np.array([phi]), C0)
        return 0.5 * (float(x1[0]) + float(x2[0]))

    if kind == "imoll":
        boundaries = (xbound(-d[40], eps), xbound(-d[100], -eps),
                      xbound(-d[20], -eps), xbound(d[80], -eps))
    else:
        boundaries = (xbound(-d[90], eps), xbound(d[60], eps),
                      xbound(-d[60], -eps), xbound(d[90], -eps))
    return InterruptedConsts(kind=kind, moll=moll, dy0=dy0, zones=zones,
                             boundaries=boundaries)


def _izone_fwd(kind: str, lam, phi):
    d = _DD
    z = np.empty(lam.shape, dtype=np.int64)
    if kind == "igh_o":
        top = phi >= IGH_PHI_B
        mid = (phi >= 0) & ~top
        low = (phi >= -IGH_PHI_B) & (phi < 0)
        bot = phi < -IGH_PHI_B
        for m, base, lo, hi in ((top, 1, -d[90], d[60]),
                                (mid, 4, -d[90], d[60]),
                                (low, 7, -d[60], d[90]),
                                (bot, 10, -d[60], d[90])):
            lm = lam[m]
            z[m] = np.where(lm <= lo, base,
                            np.where(lm >= hi, base + 2, base + 1))
    elif kind == "imoll":
        north = phi >= 0
        z[north] = np.where(lam[north] <= -d[40], 1, 2)
        s = ~north
        lm = lam[s]
        z[s] = np.where(lm <= -d[100], 3,
                        np.where(lm <= -d[20], 4,
                                 np.where(lm <= d[80], 5, 6)))
    else:  # imoll_o
        north = phi >= 0
        lm = lam[north]
        z[north] = np.where(lm <= -d[90], 1, np.where(lm >= d[60], 3, 2))
        s = ~north
        lm = lam[s]
        z[s] = np.where(lm <= -d[60], 4, np.where(lm >= d[90], 6, 5))
    return z


def interrupted_fwd(lam, phi, C: InterruptedConsts):
    z = _izone_fwd(C.kind, lam, phi)
    zi = z - 1
    is_moll = np.array([zz[0] for zz in C.zones])[zi]
    lam0 = np.array([zz[1] for zz in C.zones])[zi]
    x0 = np.array([zz[2] for zz in C.zones])[zi]
    y0 = np.array([zz[3] for zz in C.zones])[zi]
    lrel = lam - lam0
    xs = lrel * np.cos(phi)
    ys = phi
    xm, ym = moll_fwd(lrel, phi, C.moll)
    x = np.where(is_moll, xm, xs) + x0
    y = np.where(is_moll, ym, ys) + y0
    return x, y


# per-zone validity rules (lam, phi) -> bool, mirrored from the
# reference switch blocks
def _irules(kind: str):
    d = _DD
    e = _I_EPS
    if kind == "igh_o":
        return {
            1: lambda la, ph: ((la >= -d[180] - e) & (la <= -d[90] + e))
            | ((la >= d[160] - e) & (la <= d[180] + e)
               & (ph >= d[50] - e) & (ph <= d[90] + e)),
            2: lambda la, ph: (la >= -d[90] - e) & (la <= d[60] + e),
            3: lambda la, ph: ((la >= d[60] - e) & (la <= d[180] + e))
            | ((la >= -d[180] - e) & (la <= -d[160] + e)
               & (ph >= d[50] - e) & (ph <= d[90] + e)),
            4: lambda la, ph: (la >= -d[180] - e) & (la <= -d[90] + e),
            5: lambda la, ph: (la >= -d[90] - e) & (la <= d[60] + e),
            6: lambda la, ph: (la >= d[60] - e) & (la <= d[180] + e),
            7: lambda la, ph: (la >= -d[180] - e) & (la <= -d[60] + e),
            8: lambda la, ph: (la >= -d[60] - e) & (la <= d[90] + e),
            9: lambda la, ph: (la >= d[90] - e) & (la <= d[180] + e),
            10: lambda la, ph: (la >= -d[180] - e) & (la <= -d[60] + e),
            11: lambda la, ph: ((la >= -d[60] - e) & (la <= d[90] + e))
            | ((la >= d[90] - e) & (la <= d[100] + e)
               & (ph >= -d[90] - e) & (ph <= -d[40] + e)),
            12: lambda la, ph: (la >= d[90] - e) & (la <= d[180] + e),
        }
    if kind == "imoll":
        return {
            1: lambda la, ph: (la >= -d[180] - e) & (la <= -d[40] + e)
            & (ph >= -e),
            2: lambda la, ph: (la >= -d[40] - e) & (la <= d[180] + e)
            & (ph >= -e),
            3: lambda la, ph: (la >= -d[180] - e) & (la <= -d[100] + e)
            & (ph <= e),
            4: lambda la, ph: (la >= -d[100] - e) & (la <= -d[20] + e)
            & (ph <= e),
            5: lambda la, ph: (la >= -d[20] - e) & (la <= d[80] + e)
            & (ph <= e),
            6: lambda la, ph: (la >= d[80] - e) & (la <= d[180] + e)
            & (ph <= e),
        }
    return {
        1: lambda la, ph: (la >= -d[180] - e) & (la <= -d[90] + e)
        & (ph >= -e),
        2: lambda la, ph: (la >= -d[90] - e) & (la <= d[60] + e)
        & (ph >= -e),
        3: lambda la, ph: (la >= d[60] - e) & (la <= d[180] + e)
        & (ph >= -e),
        4: lambda la, ph: (la >= -d[180] - e) & (la <= -d[60] + e)
        & (ph <= e),
        5: lambda la, ph: (la >= -d[60] - e) & (la <= d[90] + e)
        & (ph <= e),
        6: lambda la, ph: (la >= d[90] - e) & (la <= d[180] + e)
        & (ph <= e),
    }


def interrupted_inv(x, y, C: InterruptedConsts):
    d = _DD
    e = _I_EPS
    z = np.zeros(x.shape, dtype=np.int64)
    if C.kind == "igh_o":
        y90 = C.dy0 + np.sqrt(2.0)
        inside = (y <= y90 + e) & (y >= -y90 + e)
        top = inside & (y >= IGH_PHI_B)
        mid = inside & (y >= 0) & ~top
        low = inside & (y >= -IGH_PHI_B) & (y < 0)
        bot = inside & (y < -IGH_PHI_B)
        for m, base, lo, hi in ((top, 1, -d[90], d[60]),
                                (mid, 4, -d[90], d[60]),
                                (low, 7, -d[60], d[90]),
                                (bot, 10, -d[60], d[90])):
            xm = x[m]
            z[m] = np.where(xm <= lo, base,
                            np.where(xm >= hi, base + 2, base + 1))
    elif C.kind == "imoll":
        b12, b34, b45, b56 = C.boundaries
        y90 = np.sqrt(2.0)
        inside = (y <= y90 + e) & (y >= -y90 + e)
        north = inside & (y >= 0)
        z[north] = np.where(x[north] <= b12, 1, 2)
        s = inside & ~north
        xm = x[s]
        z[s] = np.where(xm <= b34, 3,
                        np.where(xm <= b45, 4,
                                 np.where(xm <= b56, 5, 6)))
    else:
        b12, b23, b45, b56 = C.boundaries
        y90 = np.sqrt(2.0)
        inside = (y <= y90 + e) & (y >= -y90 + e)
        north = inside & (y >= 0)
        xm = x[north]
        z[north] = np.where(xm <= b12, 1, np.where(xm <= b23, 2, 3))
        s = inside & ~north
        xm = x[s]
        z[s] = np.where(xm <= b45, 4, np.where(xm <= b56, 5, 6))
    zi = np.maximum(z - 1, 0)
    is_moll = np.array([zz[0] for zz in C.zones])[zi]
    lam0 = np.array([zz[1] for zz in C.zones])[zi]
    x0 = np.array([zz[2] for zz in C.zones])[zi]
    y0 = np.array([zz[3] for zz in C.zones])[zi]
    xr = x - x0
    yr = y - y0
    with np.errstate(invalid="ignore", divide="ignore"):
        ls, ps = xr / np.cos(yr), yr
        lm, pm = moll_inv(xr, yr, C.moll)
    lam = np.where(is_moll, lm, ls) + lam0
    phi = np.where(is_moll, pm, ps)
    ok = np.zeros(x.shape, dtype=bool)
    for zz, rule in _irules(C.kind).items():
        m = z == zz
        if m.any():
            ok[m] = rule(lam[m], phi[m])
    lam = np.where(ok, lam, np.nan)
    phi = np.where(ok, phi, np.nan)
    return lam, phi


# ------------------------------------------------------------ calcofi

_CAL_DEG_TO_LINE = 5.0
_CAL_DEG_TO_STATION = 15.0
_CAL_LINE_TO_RAD = 0.0034906585039886592
_CAL_STATION_TO_RAD = 0.0011635528346628863
_CAL_O_LINE = 80.0
_CAL_O_STATION = 60.0
_CAL_O_LAMBDA = -2.1144663887911301
_CAL_O_PHI = 0.59602993955606354
_CAL_ROT = 0.52359877559829882
_RAD_TO_DEG_ = 180.0 / np.pi


def calcofi_fwd(lam, phi, es: float):
    """CalCOFI line/station grid (calcofi.cpp e/s forward)."""
    e = np.sqrt(es)
    rot = _CAL_ROT
    bad = np.abs(np.abs(phi) - HALFPI) <= EPS10
    with np.errstate(invalid="ignore", divide="ignore"):
        if es != 0.0:
            my = -np.log(tsfn(phi, np.sin(phi), e))
            oy = -np.log(float(tsfn(np.float64(_CAL_O_PHI),
                                    np.float64(np.sin(_CAL_O_PHI)), e)))
        else:
            my = np.log(np.tan(FORTPI + 0.5 * phi))
            oy = float(np.log(np.tan(FORTPI + 0.5 * _CAL_O_PHI)))
        l1 = (my - oy) * np.tan(rot)
        l2 = -lam - l1 + _CAL_O_LAMBDA
        ry = l2 * np.cos(rot) * np.sin(rot) + my
        if es != 0.0:
            ry = phi2(np.exp(-ry), e)
        else:
            ry = HALFPI - 2.0 * np.arctan(np.exp(-ry))
        x = _CAL_O_LINE - _RAD_TO_DEG_ * (ry - _CAL_O_PHI) \
            * _CAL_DEG_TO_LINE / np.cos(rot)
        y = _CAL_O_STATION + _RAD_TO_DEG_ * (ry - phi) \
            * _CAL_DEG_TO_STATION / np.sin(rot)
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def calcofi_inv(x, y, es: float):
    """calcofi.cpp e/s inverse."""
    e = np.sqrt(es)
    rot = _CAL_ROT
    ry = _CAL_O_PHI - _CAL_LINE_TO_RAD * (x - _CAL_O_LINE) * np.cos(rot)
    phi = ry - _CAL_STATION_TO_RAD * (y - _CAL_O_STATION) * np.sin(rot)
    if es != 0.0:
        oym = -np.log(float(tsfn(np.float64(_CAL_O_PHI),
                                 np.float64(np.sin(_CAL_O_PHI)), e)))
        rym = -np.log(tsfn(ry, np.sin(ry), e))
        xym = -np.log(tsfn(phi, np.sin(phi), e))
    else:
        oym = float(np.log(np.tan(FORTPI + 0.5 * _CAL_O_PHI)))
        rym = np.log(np.tan(FORTPI + 0.5 * ry))
        xym = np.log(np.tan(FORTPI + 0.5 * phi))
    l1 = (xym - oym) * np.tan(rot)
    l2 = (rym - xym) / (np.cos(rot) * np.sin(rot))
    lam = _CAL_O_LAMBDA - (l1 + l2)
    return lam, phi


# ---------------------------------------------------------- col_urban

@dataclass(frozen=True)
class ColUrbanConsts:
    h0: float
    rho0: float
    A: float
    B: float
    C: float
    D: float
    es: float
    phi0: float


def col_urban_setup(params: dict, ell: Ellipsoid,
                    phi0: float) -> ColUrbanConsts:
    """EPSG Colombia Urban (col_urban.cpp:55-80)."""
    es = ell.es
    h0 = float(params.get("h_0", 0.0)) / ell.a
    s0 = np.sin(phi0)
    nu0 = 1.0 / np.sqrt(1.0 - es * s0 * s0)
    A = 1.0 + h0 / nu0
    rho0 = (1.0 - es) / (1.0 - es * s0 * s0) ** 1.5
    B = np.tan(phi0) / (2.0 * rho0 * nu0)
    C = 1.0 + h0
    D = rho0 * (1.0 + h0 / (1.0 - es))
    return ColUrbanConsts(h0=h0, rho0=float(rho0), A=float(A), B=float(B),
                          C=float(C), D=float(D), es=es, phi0=phi0)


def col_urban_fwd(lam, phi, C: ColUrbanConsts):
    """col_urban.cpp:25-42."""
    cosphi = np.cos(phi)
    sinphi = np.sin(phi)
    nu = 1.0 / np.sqrt(1.0 - C.es * sinphi * sinphi)
    lnc = lam * nu * cosphi
    x = C.A * lnc
    sm = np.sin(0.5 * (phi + C.phi0))
    rho_m = (1.0 - C.es) / (1.0 - C.es * sm * sm) ** 1.5
    G = 1.0 + C.h0 / rho_m
    y = G * C.rho0 * ((phi - C.phi0) + C.B * lnc * lnc)
    return x, y


def col_urban_inv(x, y, C: ColUrbanConsts):
    """col_urban.cpp:44-53."""
    phi = C.phi0 + y / C.D - C.B * (x / C.C) ** 2
    sinphi = np.sin(phi)
    nu = 1.0 / np.sqrt(1.0 - C.es * sinphi * sinphi)
    lam = x / (C.C * nu * np.cos(phi))
    return lam, phi


# ------------------------------------------------------------- labrd

@dataclass(frozen=True)
class LabrdConsts:
    kRg: float
    p0s: float
    A: float
    C: float
    Ca: float
    Cb: float
    Cc: float
    Cd: float
    e: float
    es: float
    one_es: float
    k0: float
    phi0: float


def labrd_setup(params: dict, ell: Ellipsoid, k0: float,
                phi0: float) -> LabrdConsts:
    """Laborde Madagascar (labrd.cpp:95-137)."""
    if phi0 == 0.0:
        raise ValueError("labrd: lat_0 should be different from 0")
    Az = np.radians(float(params.get("azi", 0.0)))
    sinp = np.sin(phi0)
    t = 1.0 - ell.es * sinp * sinp
    N = 1.0 / np.sqrt(t)
    R = ell.one_es * N / t
    kRg = k0 * np.sqrt(N * R)
    p0s = np.arctan(np.sqrt(R / N) * np.tan(phi0))
    A = sinp / np.sin(p0s)
    te = ell.e * sinp
    C = (0.5 * ell.e * A * np.log((1.0 + te) / (1.0 - te))
         - A * np.log(np.tan(FORTPI + 0.5 * phi0))
         + np.log(np.tan(FORTPI + 0.5 * p0s)))
    t2 = Az + Az
    Cb = 1.0 / (12.0 * kRg * kRg)
    Ca = (1.0 - np.cos(t2)) * Cb
    Cb = Cb * np.sin(t2)
    return LabrdConsts(kRg=float(kRg), p0s=float(p0s), A=float(A),
                       C=float(C), Ca=float(Ca), Cb=float(Cb),
                       Cc=float(3.0 * (Ca * Ca - Cb * Cb)),
                       Cd=float(6.0 * Ca * Cb), e=ell.e, es=ell.es,
                       one_es=ell.one_es, k0=k0, phi0=phi0)


def labrd_fwd(lam, phi, C: LabrdConsts):
    """labrd.cpp:25-58."""
    V1 = C.A * np.log(np.tan(FORTPI + 0.5 * phi))
    t = C.e * np.sin(phi)
    V2 = 0.5 * C.e * C.A * np.log((1.0 + t) / (1.0 - t))
    ps = 2.0 * (np.arctan(np.exp(V1 - V2 + C.C)) - FORTPI)
    I1 = ps - C.p0s
    cosps = np.cos(ps)
    cosps2 = cosps * cosps
    sinps = np.sin(ps)
    sinps2 = sinps * sinps
    I4 = C.A * cosps
    I2 = 0.5 * C.A * I4 * sinps
    I3 = I2 * C.A * C.A * (5.0 * cosps2 - sinps2) / 12.0
    I6 = I4 * C.A * C.A
    I5 = I6 * (cosps2 - sinps2) / 6.0
    I6 = I6 * C.A * C.A * (5.0 * cosps2 * cosps2
                           + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0
    t = lam * lam
    x = C.kRg * lam * (I4 + t * (I5 + t * I6))
    y = C.kRg * (I1 + t * (I2 + t * I3))
    x2 = x * x
    y2 = y * y
    V1 = 3.0 * x * y2 - x * x2
    V2 = y * y2 - 3.0 * x2 * y
    return x + C.Ca * V1 + C.Cb * V2, y + C.Ca * V2 - C.Cb * V1


def labrd_inv(x, y, C: LabrdConsts, max_iter: int = 20, tol: float = 1e-10):
    """labrd.cpp:60-93."""
    x2 = x * x
    y2 = y * y
    V1 = 3.0 * x * y2 - x * x2
    V2 = y * y2 - 3.0 * x2 * y
    V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
    V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
    xx = x + (-C.Ca * V1 - C.Cb * V2 + C.Cc * V3 + C.Cd * V4)
    yy = y + (C.Cb * V1 - C.Ca * V2 - C.Cd * V3 + C.Cc * V4)
    ps = C.p0s + yy / C.kRg
    pe = ps + C.phi0 - C.p0s
    for _ in range(max_iter):
        V1 = C.A * np.log(np.tan(FORTPI + 0.5 * pe))
        tpe = C.e * np.sin(pe)
        V2 = 0.5 * C.e * C.A * np.log((1.0 + tpe) / (1.0 - tpe))
        t = ps - 2.0 * (np.arctan(np.exp(V1 - V2 + C.C)) - FORTPI)
        pe = pe + t
        if np.all(np.abs(t) < tol):
            break
    t = C.e * np.sin(pe)
    t = 1.0 - t * t
    Re = C.one_es / (t * np.sqrt(t))
    t = np.tan(ps)
    t2 = t * t
    s = C.kRg * C.kRg
    d = Re * C.k0 * C.kRg
    I7 = t / (2.0 * d)
    I8 = t * (5.0 + 3.0 * t2) / (24.0 * d * s)
    d = np.cos(ps) * C.kRg * C.A
    I9 = 1.0 / d
    d = d * s
    I10 = (1.0 + 2.0 * t2) / (6.0 * d)
    I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
    x2 = xx * xx
    phi = pe + x2 * (-I7 + I8 * x2)
    lam = xx * (I9 + x2 * (-I10 + x2 * I11))
    return lam, phi


# -------------------------------------------------------------- bipc

_BIPC = dict(
    lamB=-0.34894976726250681539, n=0.63055844881274687180,
    F=1.89724742567461030582, Azab=0.81650043674686363166,
    Azba=1.82261843856185925133, T=1.27246578267089012270,
    rhoc=1.20709121521568721927, cAzc=0.69691523038678375519,
    sAzc=0.71715351331143607555, C45=0.70710678118654752469,
    S45=0.70710678118654752410, C20=0.93969262078590838411,
    S20=-0.34202014332566873287, R110=1.91986217719376253360,
    R104=1.81514242207410275904)


def bipc_fwd(lam, phi, noskew: bool):
    """Bipolar oblique conic conformal (bipc.cpp s_forward)."""
    B = _BIPC
    with np.errstate(invalid="ignore", divide="ignore"):
        cphi = np.cos(phi)
        sphi = np.sin(phi)
        sdlam = B["lamB"] - lam
        cdlam = np.cos(sdlam)
        sdlam = np.sin(sdlam)
        polar = np.abs(np.abs(phi) - HALFPI) < EPS10
        tphi = np.where(polar, np.inf, sphi / np.where(cphi == 0, 1.0, cphi))
        Az = np.where(polar, np.where(phi < 0.0, np.pi, 0.0),
                      np.arctan2(sdlam, B["C45"] * (tphi - cdlam)))
        tag = Az > B["Azba"]
        # tag branch (Azab pole)
        sd2 = np.sin(lam + B["R110"])
        cd2 = np.cos(lam + B["R110"])
        z_t = B["S20"] * sphi + B["C20"] * cphi * cd2
        Az_t = np.where(polar, Az,
                        np.arctan2(sd2, B["C20"] * tphi - B["S20"] * cd2))
        # non-tag branch (Azba pole)
        z_f = B["S45"] * (sphi + cphi * cdlam)
        z = np.where(tag, z_t, z_f)
        bad = np.abs(z) > 1.000000001
        z = np.arccos(np.clip(z, -1.0, 1.0))
        Az = np.where(tag, Az_t, Az)
        Av = np.where(tag, B["Azab"], B["Azba"])
        ybase = np.where(tag, B["rhoc"], -B["rhoc"])
        t = np.tan(0.5 * z) ** B["n"]
        r = B["F"] * t
        al = 0.5 * (B["R104"] - z)
        bad |= al < 0.0
        al = (t + np.clip(al, 0, None) ** B["n"]) / B["T"]
        bad |= np.abs(al) > 1.000000001
        al = np.arccos(np.clip(al, -1.0, 1.0))
        tt = B["n"] * (Av - Az)
        r = np.where(np.abs(tt) < al,
                     r / np.cos(al + np.where(tag, tt, -tt)), r)
        x = r * np.sin(tt)
        y = ybase + np.where(tag, -r, r) * np.cos(tt)
        if noskew:
            x, y = (-x * B["cAzc"] - y * B["sAzc"],
                    -y * B["cAzc"] + x * B["sAzc"])
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def bipc_inv(x, y, noskew: bool, max_iter: int = 10, tol: float = 1e-10):
    """bipc.cpp s_inverse."""
    B = _BIPC
    with np.errstate(invalid="ignore", divide="ignore"):
        if noskew:
            x, y = (-x * B["cAzc"] + y * B["sAzc"],
                    -y * B["cAzc"] - x * B["sAzc"])
        neg = x < 0.0
        yy = np.where(neg, B["rhoc"] - y, y + B["rhoc"])
        s = np.where(neg, B["S20"], B["S45"])
        c = np.where(neg, B["C20"], B["C45"])
        Av = np.where(neg, B["Azab"], B["Azba"])
        r = np.hypot(x, yy)
        rp = r.copy()
        rl = r.copy()
        Az = np.arctan2(x, yy)
        fAz = np.abs(Az)
        z = np.zeros_like(r)
        for _ in range(max_iter):
            z = 2.0 * np.arctan((r / B["F"]) ** (1.0 / B["n"]))
            al = np.arccos(np.clip(
                (np.tan(0.5 * z) ** B["n"]
                 + np.tan(0.5 * (B["R104"] - z)) ** B["n"]) / B["T"],
                -1.0, 1.0))
            r = np.where(fAz < al,
                         rp * np.cos(al + np.where(neg, Az, -Az)), r)
            if np.all(np.abs(rl - r) < tol):
                break
            rl = r
        Az = Av - Az / B["n"]
        phi = np.arcsin(np.clip(s * np.cos(z) + c * np.sin(z) * np.cos(Az),
                                -1.0, 1.0))
        lam = np.arctan2(np.sin(Az), c / np.tan(z) - s * np.cos(Az))
        lam = np.where(neg, lam - B["R110"], B["lamB"] - lam)
    return lam, phi


# -------------------------------------------------------------- imw_p

@dataclass(frozen=True)
class ImwPConsts:
    P: float
    Pp: float
    Q: float
    Qp: float
    R_1: float
    R_2: float
    sphi_1: float
    sphi_2: float
    C2: float
    phi_1: float
    phi_2: float
    lam_1: float
    en: np.ndarray
    es: float
    mode: int  # 0 none-zero, 1 phi_1==0, -1 phi_2==0


def imw_p_setup(params: dict, ell: Ellipsoid) -> ImwPConsts:
    """International Map of the World polyconic (imw_p.cpp:141-200)."""
    if "lat_1" not in params or "lat_2" not in params:
        raise ValueError("imw_p: lat_1 and lat_2 should be specified")
    phi_1 = np.radians(float(params["lat_1"]))
    phi_2 = np.radians(float(params["lat_2"]))
    if abs(phi_1 - phi_2) < EPS10 or abs(phi_1 + phi_2) < EPS10:
        raise ValueError("imw_p: |lat_1 - lat_2| and |lat_1 + lat_2| "
                         "should be > 0")
    if phi_2 < phi_1:
        phi_1, phi_2 = phi_2, phi_1
    en = enfn(ell.n)
    if "lon_1" in params:
        lam_1 = np.radians(float(params["lon_1"]))
    else:
        sig = abs(np.degrees(0.5 * (phi_2 + phi_1)))
        sig = 2.0 if sig <= 60 else (4.0 if sig <= 76 else 8.0)
        lam_1 = np.radians(sig)

    def node(phi):
        sp = np.sin(phi)
        R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - ell.es * sp * sp))
        F = lam_1 * sp
        return R * np.sin(F), R * (1.0 - np.cos(F)), float(sp), float(R)

    mode = 0
    sphi_1 = R_1 = sphi_2 = R_2 = 0.0
    if phi_1 != 0.0:
        x1, y1, sphi_1, R_1 = node(phi_1)
    else:
        mode = 1
        x1, y1 = lam_1, 0.0
    if phi_2 != 0.0:
        x2, T2, sphi_2, R_2 = node(phi_2)
    else:
        mode = -1
        x2, T2 = lam_1, 0.0
    m1 = float(mlfn(np.float64(phi_1), np.float64(np.sin(phi_1)),
                    np.float64(np.cos(phi_1)), en))
    m2 = float(mlfn(np.float64(phi_2), np.float64(np.sin(phi_2)),
                    np.float64(np.cos(phi_2)), en))
    t = m2 - m1
    s = x2 - x1
    y2 = np.sqrt(t * t - s * s) + y1
    C2 = y2 - T2
    t = 1.0 / t
    return ImwPConsts(P=float((m2 * y1 - m1 * y2) * t),
                      Q=float((y2 - y1) * t),
                      Pp=float((m2 * x1 - m1 * x2) * t),
                      Qp=float((x2 - x1) * t),
                      R_1=R_1, R_2=R_2, sphi_1=sphi_1, sphi_2=sphi_2,
                      C2=float(C2), phi_1=float(phi_1), phi_2=float(phi_2),
                      lam_1=float(lam_1), en=en, es=ell.es, mode=mode)


def _imw_loc_for(lam, phi, C: ImwPConsts):
    """imw_p.cpp loc_for (:49-103); returns (x, y, yc)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        sp = np.sin(phi)
        m = mlfn(phi, sp, np.cos(phi), C.en)
        xa = C.Pp + C.Qp * m
        ya = C.P + C.Q * m
        R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - C.es * sp * sp))
        Cc = np.sqrt(np.clip(R * R - xa * xa, 0, None))
        Cc = np.where(phi < 0.0, -Cc, Cc)
        Cc = Cc + ya - R
        if C.mode == -1:
            xb = lam
            yb = np.full_like(lam, C.C2)
        else:
            t = lam * C.sphi_2
            xb = C.R_2 * np.sin(t)
            yb = C.C2 + C.R_2 * (1.0 - np.cos(t))
        if C.mode == 1:
            xc = lam
            yc = np.zeros_like(lam)
        else:
            t = lam * C.sphi_1
            xc = C.R_1 * np.sin(t)
            yc = C.R_1 * (1.0 - np.cos(t))
        D = (xb - xc) / (yb - yc)
        B = xc + D * (Cc + R - yc)
        x = D * np.sqrt(np.clip(R * R * (1.0 + D * D) - B * B, 0, None))
        x = np.where(phi > 0, -x, x)
        x = (B + x) / (1.0 + D * D)
        y = np.sqrt(np.clip(R * R - x * x, 0, None))
        y = np.where(phi > 0, -y, y)
        y = y + Cc + R
    eq = phi == 0.0
    x = np.where(eq, lam, x)
    y = np.where(eq, 0.0, y)
    yc = np.where(eq, 0.0, yc)
    return x, y, yc


def imw_p_fwd(lam, phi, C: ImwPConsts):
    x, y, _ = _imw_loc_for(lam, phi, C)
    return x, y


def imw_p_inv(x, y, C: ImwPConsts, max_iter: int = 1000, tol: float = 1e-10):
    """imw_p.cpp:105-127: alternating secant fixed point."""
    phi = np.full_like(x, C.phi_2)
    lam = x / np.cos(phi)
    for _ in range(max_iter):
        tx, ty, yc = _imw_loc_for(lam, phi, C)
        denom = ty - yc
        upd = (denom != 0) | (np.abs(ty - y) > tol)
        with np.errstate(invalid="ignore", divide="ignore"):
            phi_new = ((phi - C.phi_1) * (y - yc)
                       / np.where(denom == 0, np.nan, denom)) + C.phi_1
            lam_new = lam * x / np.where(tx == 0, np.nan, tx)
        phi = np.where(upd, phi_new, phi)
        lam = np.where((tx != 0) & (np.abs(tx - x) > tol), lam_new, lam)
        if np.all((np.abs(tx - x) <= tol) & (np.abs(ty - y) <= tol)):
            break
    return lam, phi


# -------------------------------------------------- proj_mdist + rouss

def mdist_ini(es: float):
    """proj_mdist_ini (src/proj_mdist.cpp:48-93): E constant + b_n
    coefficient generation."""
    MAX_ITER = 20
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    Es = 1.0
    El = 1.0
    E = [1.0]
    i = 1
    for i in range(1, MAX_ITER):
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E.append(T * ens)
        Es -= E[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        if Es == El:
            break
        El = Es
    else:
        i = MAX_ITER - 1
    nb = i - 1
    b = [0.0] * i
    b[0] = Esum = 1.0 - Es
    numf = denf = 1.0
    numfi = 2.0
    denfi = 3.0
    for j in range(1, i):
        Esum -= E[j]
        numf *= numfi
        denf *= denfi
        b[j] = Esum * numf / denf
        numfi += 2.0
        denfi += 2.0
    return dict(nb=nb, es=es, E=Es, b=np.array(b))


def mdist(phi, sphi, cphi, en: dict):
    """proj_mdist (proj_mdist.cpp:94-106)."""
    b = en["b"]
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * en["E"] - en["es"] * sc / np.sqrt(1.0 - en["es"] * sphi2)
    s = np.full_like(np.asarray(phi, dtype=np.float64), b[en["nb"]])
    for i in range(en["nb"], 0, -1):
        s = b[i - 1] + sphi2 * s
    return D + sc * s


def inv_mdist(dist, en: dict, max_iter: int = 20, tol: float = 1e-14):
    """proj_inv_mdist (proj_mdist.cpp:107-128)."""
    k = 1.0 / (1.0 - en["es"])
    phi = np.asarray(dist, dtype=np.float64).copy()
    for _ in range(max_iter):
        s = np.sin(phi)
        t = 1.0 - en["es"] * s * s
        step = (mdist(phi, s, np.cos(phi), en) - dist) * (t * np.sqrt(t)) * k
        phi = phi - step
        if np.all(np.abs(step) < tol):
            break
    return phi


@dataclass(frozen=True)
class RoussConsts:
    s0: float
    A: tuple
    B: tuple
    Cc: tuple
    D: tuple
    en: dict
    es: float
    k0: float


def rouss_setup(ell: Ellipsoid, k0: float, phi0: float) -> RoussConsts:
    """Roussilhe stereographic (rouss.cpp:63-110)."""
    en = mdist_ini(ell.es)
    es2 = np.sin(phi0)
    s0 = float(mdist(np.float64(phi0), np.float64(es2),
                     np.float64(np.cos(phi0)), en))
    es2 = ell.es * es2 * es2
    t = 1.0 - es2
    N0 = 1.0 / np.sqrt(t)
    R_R0_2 = t * t / ell.one_es
    R_R0_4 = R_R0_2 * R_R0_2
    t = np.tan(phi0)
    t2 = t * t
    A1 = C1 = R_R0_2 / 4.0
    A2 = C2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
    A3 = R_R0_2 * t * (1.0 + 4.0 * t2) / (12.0 * N0)
    A4 = R_R0_4 / 24.0
    A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
    A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
    B1 = t / (2.0 * N0)
    B2 = R_R0_2 / 12.0
    B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
    B4 = R_R0_2 * t * (2.0 - t2) / (24.0 * N0)
    B5 = R_R0_2 * t * (5.0 + 4.0 * t2) / (8.0 * N0)
    B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
    B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
    B8 = R_R0_4 / 120.0
    C3 = R_R0_2 * t * (1.0 + t2) / (3.0 * N0)
    C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
    C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
    C6 = R_R0_4 / 16.0
    C7 = R_R0_4 * t * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
    C8 = R_R0_4 * t * (1.0 + t2 * 4.0) / (36.0 * N0)
    D1 = t / (2.0 * N0)
    D2 = R_R0_2 / 12.0
    D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
    D4 = R_R0_2 * t * (1.0 + t2) / (8.0 * N0)
    D5 = R_R0_2 * t * (1.0 + t2 * 2.0) / (4.0 * N0)
    D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
    D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
    D8 = R_R0_4 / 80.0
    D9 = R_R0_4 * t * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
    D10 = R_R0_4 * t * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
    D11 = R_R0_4 * t * (37.0 + t2 * 44.0) / (96.0 * N0)
    return RoussConsts(s0=s0, A=(A1, A2, A3, A4, A5, A6),
                       B=(B1, B2, B3, B4, B5, B6, B7, B8),
                       Cc=(C1, C2, C3, C4, C5, C6, C7, C8),
                       D=(D1, D2, D3, D4, D5, D6, D7, D8, D9, D10, D11),
                       en=en, es=ell.es, k0=k0)


def rouss_fwd(lam, phi, C: RoussConsts):
    """rouss.cpp:16-35."""
    A1, A2, A3, A4, A5, A6 = C.A
    B1, B2, B3, B4, B5, B6, B7, B8 = C.B
    cp = np.cos(phi)
    sp = np.sin(phi)
    s = mdist(phi, sp, cp, C.en) - C.s0
    s2 = s * s
    al = lam * cp / np.sqrt(1.0 - C.es * sp * sp)
    al2 = al * al
    x = C.k0 * al * (1.0 + s2 * (A1 + s2 * A4)
                     - al2 * (A2 + s * A3 + s2 * A5 + al2 * A6))
    y = C.k0 * (al2 * (B1 + al2 * B4)
                + s * (1.0 + al2 * (B3 - al2 * B6) + s2 * (B2 + s2 * B8)
                       + s * al2 * (B5 + s * B7)))
    return x, y


def rouss_inv(x, y, C: RoussConsts):
    """rouss.cpp:36-54."""
    C1, C2, C3, C4, C5, C6, C7, C8 = C.Cc
    D1, D2, D3, D4, D5, D6, D7, D8, D9, D10, D11 = C.D
    x = x / C.k0
    y = y / C.k0
    x2 = x * x
    y2 = y * y
    al = x * (1.0 - C1 * y2
              + x2 * (C2 + C3 * y - C4 * x2 + C5 * y2 - C7 * x2 * y)
              + y2 * (C6 * y2 - C8 * x2 * y))
    s = C.s0 + y * (1.0 + y2 * (-D2 + D8 * y2)) \
        + x2 * (-D1 + y * (-D3 + y * (-D5 + y * (-D7 + y * D11)))
                + x2 * (D4 + y * (D6 + y * D10) - x2 * D9))
    phi = inv_mdist(s, C.en)
    sp = np.sin(phi)
    lam = al * np.sqrt(1.0 - C.es * sp * sp) / np.cos(phi)
    return lam, phi


# ---------------------------------------------------------------- sch

@dataclass(frozen=True)
class SchConsts:
    rcurv: float
    a: float
    transMat: tuple
    xyzoff: tuple
    cart_ell: object
    cart_sph: object


def sch_setup(params: dict, ell: Ellipsoid) -> SchConsts:
    """SAR Spherical Cross-track Height (sch.cpp:77-150)."""
    from . import cart as k_cart

    for key in ("plat_0", "plon_0", "phdg_0"):
        if key not in params:
            raise ValueError(f"sch: missing parameter {key}")
    plat = np.radians(float(params["plat_0"]))
    plon = np.radians(float(params["plon_0"]))
    phdg = np.radians(float(params["phdg_0"]))
    h0 = float(params.get("h_0", 0.0))
    cart_ell = k_cart.setup({}, ell)
    clt, slt = np.cos(plat), np.sin(plat)
    clo, slo = np.cos(plon), np.sin(plon)
    temp = np.sqrt(1.0 - ell.es * slt * slt)
    reast = ell.a / temp
    rnorth = ell.a * (1.0 - ell.es) / temp ** 3
    chdg, shdg = np.cos(phdg), np.sin(phdg)
    rcurv = h0 + (reast * rnorth) / (reast * chdg * chdg
                                     + rnorth * shdg * shdg)
    cart_sph = k_cart.setup({}, Ellipsoid.from_a_es(float(rcurv), 0.0))
    M = (clt * clo, -shdg * slo - slt * clo * chdg,
         slo * chdg - slt * clo * shdg,
         clt * slo, clo * shdg - slt * slo * chdg,
         -clo * chdg - slt * slo * shdg,
         slt, clt * chdg, clt * shdg)
    X, Y, Z = k_cart.fwd(np.array([plon]), np.array([plat]),
                         np.array([h0]), cart_ell)
    xyzoff = (float(X[0] - rcurv * clt * clo),
              float(Y[0] - rcurv * clt * slo),
              float(Z[0] - rcurv * slt))
    return SchConsts(rcurv=float(rcurv), a=ell.a,
                     transMat=tuple(float(v) for v in M),
                     xyzoff=xyzoff, cart_ell=cart_ell, cart_sph=cart_sph)


def sch_fwd(lam, phi, z, C: SchConsts):
    """sch.cpp sch_forward3d; output (s/a, c/a, h) classic units."""
    from . import cart as k_cart

    M = C.transMat
    X, Y, Z = k_cart.fwd(lam, phi, z, C.cart_ell)
    X = X - C.xyzoff[0]
    Y = Y - C.xyzoff[1]
    Z = Z - C.xyzoff[2]
    Xr = M[0] * X + M[3] * Y + M[6] * Z
    Yr = M[1] * X + M[4] * Y + M[7] * Z
    Zr = M[2] * X + M[5] * Y + M[8] * Z
    la, ph, h = k_cart.inv(Xr, Yr, Zr, C.cart_sph)
    return la * (C.rcurv / C.a), ph * (C.rcurv / C.a), h


def sch_inv(x, y, z, C: SchConsts):
    """sch.cpp sch_inverse3d."""
    from . import cart as k_cart

    M = C.transMat
    la = x * (C.a / C.rcurv)
    ph = y * (C.a / C.rcurv)
    X, Y, Z = k_cart.fwd(la, ph, z, C.cart_sph)
    Xr = M[0] * X + M[1] * Y + M[2] * Z
    Yr = M[3] * X + M[4] * Y + M[5] * Z
    Zr = M[6] * X + M[7] * Y + M[8] * Z
    Xr = Xr + C.xyzoff[0]
    Yr = Yr + C.xyzoff[1]
    Zr = Zr + C.xyzoff[2]
    return k_cart.inv(Xr, Yr, Zr, C.cart_ell)
