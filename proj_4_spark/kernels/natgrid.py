"""National-grid projections: sterea (Dutch RD), krovak/mod_krovak
(Czech/Slovak S-JTSK), somerc (Swiss CH1903), omerc (Hotine oblique
Mercator — Malaysian/Alaskan grids).

Vectorized NumPy re-derivations of:
- Gauss conformal sphere:  /root/reference/src/gauss.cpp:49-121
- sterea:                  /root/reference/src/projections/sterea.cpp:22-117
- krovak / mod_krovak:     /root/reference/src/projections/krovak.cpp:36-342
- somerc:                  /root/reference/src/projections/somerc.cpp:1-140
- omerc:                   /root/reference/src/projections/omerc.cpp:1-302

Coordinates: (lam, phi) radians relative to the central meridian in,
(x, y) in units of the semimajor axis out ("classic" IO units); the
Operation wrapper applies a / x0 / y0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import FORTPI, HALFPI, adjlon, phi2, tsfn

EPS10 = 1e-10


def aasin(v):
    """PROJ aasin (aasincos.cpp): clamp |v|<=1 with 1e-10 grace,
    NaN beyond."""
    v = np.asarray(v, dtype=np.float64)
    out = np.arcsin(np.clip(v, -1.0, 1.0))
    return np.where(np.abs(v) > 1.0 + 1e-10, np.nan, out)


# ------------------------------------------------------------ Gauss sphere

@dataclass(frozen=True)
class GaussConsts:
    C: float
    K: float
    e: float
    ratexp: float
    chi0: float  # phic0
    rc: float


def _srat(esinp, ratexp):
    return ((1.0 - esinp) / (1.0 + esinp)) ** ratexp


def gauss_ini(e: float, phi0: float) -> GaussConsts:
    """pj_gauss_ini (gauss.cpp:56-87)."""
    es = e * e
    sphi = np.sin(phi0)
    cphi2 = np.cos(phi0) ** 2
    rc = np.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
    C = np.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
    chi = np.arcsin(sphi / C)
    ratexp = 0.5 * C * e
    sr = float(_srat(e * sphi, ratexp))
    if 0.5 * phi0 + FORTPI < 1e-10:
        K = 1.0 / sr
    else:
        K = np.tan(0.5 * chi + FORTPI) / (np.tan(0.5 * phi0 + FORTPI) ** C * sr)
    return GaussConsts(C=float(C), K=float(K), e=e, ratexp=float(ratexp),
                       chi0=float(chi), rc=float(rc))


def gauss_fwd(lam, phi, en: GaussConsts):
    """pj_gauss (gauss.cpp:89-99): geodetic -> conformal sphere."""
    sphi = 2.0 * np.arctan(
        en.K * np.tan(0.5 * phi + FORTPI) ** en.C
        * _srat(en.e * np.sin(phi), en.ratexp)) - HALFPI
    return en.C * lam, sphi


def gauss_inv(lam, phi, en: GaussConsts, max_iter: int = 20,
              tol: float = 1e-14):
    """pj_inv_gauss (gauss.cpp:101-121): fixed-point on the latitude."""
    elam = lam / en.C
    num = np.tan(0.5 * phi + FORTPI) ** (1.0 / en.C) / en.K ** (1.0 / en.C)
    sphi = phi.copy()
    ephi = phi.copy()
    for _ in range(max_iter):
        ephi = 2.0 * np.arctan(
            num * _srat(en.e * np.sin(sphi), -0.5 * en.e)) - HALFPI
        if np.all(np.abs(ephi - sphi) < tol):
            break
        sphi = ephi
    return elam, ephi


# ------------------------------------------------------------------ sterea

@dataclass(frozen=True)
class StereaConsts:
    en: GaussConsts
    sinc0: float
    cosc0: float
    R2: float
    k0: float


def sterea_setup(ell, k0: float, phi0: float) -> StereaConsts:
    """sterea.cpp:97-117."""
    en = gauss_ini(ell.e, phi0)
    return StereaConsts(en=en, sinc0=float(np.sin(en.chi0)),
                        cosc0=float(np.cos(en.chi0)), R2=2.0 * en.rc, k0=k0)


def sterea_fwd(lam, phi, C: StereaConsts):
    """sterea.cpp:44-63."""
    slam, sphi = gauss_fwd(lam, phi, C.en)
    sinc = np.sin(sphi)
    cosc = np.cos(sphi)
    cosl = np.cos(slam)
    denom = 1.0 + C.sinc0 * sinc + C.cosc0 * cosc * cosl
    denom = np.where(denom == 0.0, np.nan, denom)
    k = C.k0 * C.R2 / denom
    x = k * cosc * np.sin(slam)
    y = k * (C.cosc0 * sinc - C.sinc0 * cosc * cosl)
    return x, y


def sterea_inv(x, y, C: StereaConsts):
    """sterea.cpp:65-84."""
    x = x / C.k0
    y = y / C.k0
    rho = np.hypot(x, y)
    with np.errstate(invalid="ignore", divide="ignore"):
        c = 2.0 * np.arctan2(rho, C.R2)
        sinc = np.sin(c)
        cosc = np.cos(c)
        sphi = np.arcsin(np.clip(
            cosc * C.sinc0 + y * sinc * C.cosc0 / np.where(rho == 0, 1.0, rho),
            -1.0, 1.0))
        slam = np.arctan2(x * sinc, rho * C.cosc0 * cosc - y * C.sinc0 * sinc)
    sphi = np.where(rho == 0.0, C.en.chi0, sphi)
    slam = np.where(rho == 0.0, 0.0, slam)
    return gauss_inv(slam, sphi, C.en)


# ------------------------------------------------------------------ krovak

KROVAK_A = 6377397.155          # fixed Bessel (krovak.cpp:287-289)
KROVAK_ES = 0.006674372230614
UQ = 1.04216856380474           # krovak.cpp:92
S0 = 1.37008346281555           # pseudo standard parallel 78d30'N

# Modified-Krovak correction polynomial (krovak.cpp:110-142)
_MK_X0, _MK_Y0 = 1089000.0, 654000.0
_MK_C = (2.946529277e-02, 2.515965696e-02, 1.193845912e-07,
         -4.668270147e-07, 9.233980362e-12, 1.523735715e-12,
         1.696780024e-18, 4.408314235e-18, -8.331083518e-24,
         -3.689471323e-24)


@dataclass(frozen=True)
class KrovakConsts:
    alpha: float
    k: float
    n: float
    rho0: float
    ad: float
    e: float
    a: float
    x0: float
    y0: float
    easting_northing: bool
    modified: bool


def krovak_setup(params: dict, phi0: float, k0: float, x0: float, y0: float,
                 modified: bool = False) -> KrovakConsts:
    """krovak.cpp:279-335 (Bessel forced; defaults applied by the
    proj.py registration)."""
    es = KROVAK_ES
    e = np.sqrt(es)
    alpha = np.sqrt(1.0 + (es * np.cos(phi0) ** 4) / (1.0 - es))
    u0 = np.arcsin(np.sin(phi0) / alpha)
    g = ((1.0 + e * np.sin(phi0)) / (1.0 - e * np.sin(phi0))) ** (alpha * e / 2.0)
    k = np.tan(u0 / 2.0 + FORTPI) / np.tan(phi0 / 2.0 + FORTPI) ** alpha * g
    n0 = np.sqrt(1.0 - es) / (1.0 - es * np.sin(phi0) ** 2)
    n = np.sin(S0)
    rho0 = k0 * n0 / np.tan(S0)
    ad = HALFPI - UQ
    return KrovakConsts(alpha=float(alpha), k=float(k), n=float(n),
                        rho0=float(rho0), ad=float(ad), e=float(e),
                        a=KROVAK_A, x0=x0, y0=y0,
                        easting_northing="czech" not in params,
                        modified=modified)


def _mod_krovak_dx_dy(Xr, Yr):
    """krovak.cpp:127-142."""
    C1, C2, C3, C4, C5, C6, C7, C8, C9, C10 = _MK_C
    Xr2 = Xr * Xr
    Yr2 = Yr * Yr
    Xr4 = Xr2 * Xr2
    Yr4 = Yr2 * Yr2
    dX = (C1 + C3 * Xr - C4 * Yr - 2 * C6 * Xr * Yr + C5 * (Xr2 - Yr2)
          + C7 * Xr * (Xr2 - 3 * Yr2) - C8 * Yr * (3 * Xr2 - Yr2)
          + 4 * C9 * Xr * Yr * (Xr2 - Yr2)
          + C10 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    dY = (C2 + C3 * Yr + C4 * Xr + 2 * C5 * Xr * Yr + C6 * (Xr2 - Yr2)
          + C8 * Xr * (Xr2 - 3 * Yr2) + C7 * Yr * (3 * Xr2 - Yr2)
          - 4 * C10 * Xr * Yr * (Xr2 - Yr2)
          + C9 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    return dX, dY


def krovak_fwd(lam, phi, C: KrovakConsts):
    """krovak.cpp:145-206 (x/y in units of a; sign/swap per the
    easting_northing convention; the Operation's finalize adds x0/y0,
    so the 2*x0/a pre-subtraction makes the net offset -x0)."""
    esp = C.e * np.sin(phi)
    gfi = ((1.0 + esp) / (1.0 - esp)) ** (C.alpha * C.e / 2.0)
    u = 2.0 * (np.arctan(C.k * np.tan(phi / 2.0 + FORTPI) ** C.alpha / gfi)
               - FORTPI)
    deltav = -lam * C.alpha
    s = np.arcsin(np.clip(
        np.cos(C.ad) * np.sin(u) + np.sin(C.ad) * np.cos(u) * np.cos(deltav),
        -1.0, 1.0))
    cos_s = np.cos(s)
    d = np.arcsin(np.clip(np.cos(u) * np.sin(deltav) / cos_s, -1.0, 1.0))
    eps = C.n * d
    rho = C.rho0 * np.tan(S0 / 2.0 + FORTPI) ** C.n \
        / np.tan(s / 2.0 + FORTPI) ** C.n
    x = rho * np.cos(eps)
    y = rho * np.sin(eps)
    bad = cos_s < 1e-12
    x = np.where(bad, 0.0, x)
    y = np.where(bad, 0.0, y)
    if C.modified:
        Xr = x * C.a - _MK_X0
        Yr = y * C.a - _MK_Y0
        dX, dY = _mod_krovak_dx_dy(Xr, Yr)
        x = x - dX / C.a
        y = y - dY / C.a
    x, y = y, x
    if C.easting_northing:
        x = -x - 2.0 * C.x0 / C.a
        y = -y - 2.0 * C.y0 / C.a
    return x, y


def krovak_inv(x, y, C: KrovakConsts, max_iter: int = 100, tol: float = 1e-15):
    """krovak.cpp:208-276."""
    if C.easting_northing:
        x, y = (-y - 2.0 * C.x0 / C.a), (-x - 2.0 * C.y0 / C.a)
    else:
        x, y = y, x
    if C.modified:
        Xr = x * C.a - _MK_X0
        Yr = y * C.a - _MK_Y0
        dX, dY = _mod_krovak_dx_dy(Xr, Yr)
        x = x + dX / C.a
        y = y + dY / C.a
    rho = np.sqrt(x * x + y * y)
    eps = np.arctan2(y, x)
    d = eps / np.sin(S0)
    with np.errstate(invalid="ignore", divide="ignore"):
        s = 2.0 * (np.arctan((C.rho0 / rho) ** (1.0 / C.n)
                             * np.tan(S0 / 2.0 + FORTPI)) - FORTPI)
    s = np.where(rho == 0.0, HALFPI, s)
    u = np.arcsin(np.clip(
        np.cos(C.ad) * np.sin(s) - np.sin(C.ad) * np.cos(s) * np.cos(d),
        -1.0, 1.0))
    deltav = np.arcsin(np.clip(np.cos(s) * np.sin(d) / np.cos(u), -1.0, 1.0))
    fi1 = u.copy()
    phi = u.copy()
    for _ in range(max_iter):
        phi = 2.0 * (np.arctan(
            C.k ** (-1.0 / C.alpha)
            * np.tan(u / 2.0 + FORTPI) ** (1.0 / C.alpha)
            * ((1.0 + C.e * np.sin(fi1)) / (1.0 - C.e * np.sin(fi1)))
            ** (C.e / 2.0)) - FORTPI)
        if np.all(np.abs(fi1 - phi) < tol):
            break
        fi1 = phi
    lam = -deltav / C.alpha  # lam0 re-added by the Operation wrapper
    return lam, phi


# ------------------------------------------------------------------ somerc

@dataclass(frozen=True)
class SomercConsts:
    K: float
    c: float
    hlf_e: float
    kR: float
    cosp0: float
    sinp0: float
    e: float
    rone_es: float


def somerc_setup(ell, k0: float, phi0: float) -> SomercConsts:
    """somerc.cpp:105-131."""
    e, es = ell.e, ell.es
    hlf_e = 0.5 * e
    cp = np.cos(phi0) ** 2
    c = np.sqrt(1.0 + es * cp * cp / (1.0 - es))
    sp = np.sin(phi0)
    sinp0 = sp / c
    phip0 = np.arcsin(sinp0)
    cosp0 = np.cos(phip0)
    spe = sp * e
    K = (np.log(np.tan(FORTPI + 0.5 * phip0))
         - c * (np.log(np.tan(FORTPI + 0.5 * phi0))
                - hlf_e * np.log((1.0 + spe) / (1.0 - spe))))
    kR = k0 * np.sqrt(1.0 - es) / (1.0 - spe * spe)
    return SomercConsts(K=float(K), c=float(c), hlf_e=float(hlf_e),
                        kR=float(kR), cosp0=float(cosp0), sinp0=float(sinp0),
                        e=e, rone_es=1.0 / (1.0 - es))


def somerc_fwd(lam, phi, C: SomercConsts):
    """somerc.cpp:35-52."""
    sp = C.e * np.sin(phi)
    phip = 2.0 * np.arctan(np.exp(
        C.c * (np.log(np.tan(FORTPI + 0.5 * phi))
               - C.hlf_e * np.log((1.0 + sp) / (1.0 - sp))) + C.K)) - HALFPI
    lamp = C.c * lam
    cp = np.cos(phip)
    phipp = aasin(C.cosp0 * np.sin(phip) - C.sinp0 * cp * np.cos(lamp))
    lampp = aasin(cp * np.sin(lamp) / np.cos(phipp))
    x = C.kR * lampp
    y = C.kR * np.log(np.tan(FORTPI + 0.5 * phipp))
    return x, y


def somerc_inv(x, y, C: SomercConsts, max_iter: int = 6, tol: float = 1e-10):
    """somerc.cpp:54-84."""
    phipp = 2.0 * (np.arctan(np.exp(y / C.kR)) - FORTPI)
    lampp = x / C.kR
    cp = np.cos(phipp)
    phip = aasin(C.cosp0 * np.sin(phipp) + C.sinp0 * cp * np.cos(lampp))
    lamp = aasin(cp * np.sin(lampp) / np.cos(phip))
    con = (C.K - np.log(np.tan(FORTPI + 0.5 * phip))) / C.c
    for _ in range(max_iter):
        esp = C.e * np.sin(phip)
        delp = ((con + np.log(np.tan(FORTPI + 0.5 * phip))
                 - C.hlf_e * np.log((1.0 + esp) / (1.0 - esp)))
                * (1.0 - esp * esp) * np.cos(phip) * C.rone_es)
        phip = phip - delp
        if np.all(np.abs(delp) < tol):
            break
    return lamp / C.c, phip


# ------------------------------------------------------------------- omerc

@dataclass(frozen=True)
class OmercConsts:
    A: float
    B: float
    E: float
    ArB: float
    BrA: float
    rB: float
    singam: float
    cosgam: float
    sinrot: float
    cosrot: float
    v_pole_n: float
    v_pole_s: float
    u_0: float
    no_rot: bool
    e: float
    lam0: float  # computed by setup; proj.py adopts it


def omerc_setup(params: dict, ell, k0: float, phi0: float) -> OmercConsts:
    """omerc.cpp:120-302: alpha/gamma (+lonc, no_off) or two-point
    (lon_1/lat_1/lon_2/lat_2) variants."""
    TOL = 1e-7
    EPS = 1e-10
    e, es = ell.e, ell.es
    one_es = 1.0 - es
    no_rot = "no_rot" in params
    alp = "alpha" in params
    gam = "gamma" in params
    alpha_c = float(params.get("alpha", 0.0)) * np.pi / 180.0
    gamma = float(params.get("gamma", 0.0)) * np.pi / 180.0
    no_off = False
    lamc = lam1 = lam2 = phi1 = phi2 = 0.0
    if alp or gam:
        lamc = float(params.get("lonc", 0.0)) * np.pi / 180.0
        no_off = "no_off" in params or "no_uoff" in params
    else:
        lam1 = float(params.get("lon_1", 0.0)) * np.pi / 180.0
        phi1 = float(params.get("lat_1", 0.0)) * np.pi / 180.0
        lam2 = float(params.get("lon_2", 0.0)) * np.pi / 180.0
        phi2 = float(params.get("lat_2", 0.0)) * np.pi / 180.0
        if (abs(phi1) > HALFPI - TOL or abs(phi2) > HALFPI - TOL
                or abs(phi1 - phi2) <= TOL or abs(phi1) <= TOL
                or abs(abs(phi0) - HALFPI) <= TOL):
            raise ValueError("invalid omerc lat_1/lat_2/lat_0")

    com = np.sqrt(one_es)
    if abs(phi0) > EPS:
        sinph0 = np.sin(phi0)
        cosph0 = np.cos(phi0)
        con = 1.0 - es * sinph0 * sinph0
        B = cosph0 * cosph0
        B = np.sqrt(1.0 + es * B * B / one_es)
        A = B * k0 * com / con
        D = B * com / (cosph0 * np.sqrt(con))
        F = D * D - 1.0
        if F <= 0.0:
            F = 0.0
        else:
            F = np.sqrt(F)
            if phi0 < 0.0:
                F = -F
        E = F = F + D
        E *= tsfn(np.float64(phi0), np.float64(sinph0), e) ** B
        E = float(E)
    else:
        B = 1.0 / com
        A = k0
        E = D = F = 1.0

    if alp or gam:
        if alp:
            gamma0 = np.arcsin(np.sin(alpha_c) / D)
            if not gam:
                gamma = alpha_c
        else:
            gamma0 = gamma
            alpha_c = np.arcsin(D * np.sin(gamma0))
        if abs(abs(phi0) - HALFPI) <= TOL:
            raise ValueError("invalid omerc lat_0")
        lam0 = lamc - np.arcsin(0.5 * (F - 1.0 / F) * np.tan(gamma0)) / B
    else:
        H = tsfn(np.float64(phi1), np.float64(np.sin(phi1)), e) ** B
        L = tsfn(np.float64(phi2), np.float64(np.sin(phi2)), e) ** B
        F = E / H
        p = (L - H) / (L + H)
        J = E * E
        J = (J - L * H) / (J + L * H)
        con = lam1 - lam2
        if con < -np.pi:
            lam2 -= 2.0 * np.pi
        elif con > np.pi:
            lam2 += 2.0 * np.pi
        lam0 = float(adjlon(np.array(
            [0.5 * (lam1 + lam2)
             - np.arctan(J * np.tan(0.5 * B * (lam1 - lam2)) / p) / B]))[0])
        gamma0 = np.arctan(2.0 * np.sin(B * float(adjlon(np.array([lam1 - lam0]))[0]))
                           / (F - 1.0 / F))
        gamma = alpha_c = np.arcsin(D * np.sin(gamma0))

    ArB = A / B
    if no_off:
        u_0 = 0.0
    else:
        u_0 = abs(ArB * np.arctan(np.sqrt(D * D - 1.0) / np.cos(alpha_c)))
        if phi0 < 0.0:
            u_0 = -u_0
    Fh = 0.5 * gamma0
    v_pole_n = ArB * np.log(np.tan(FORTPI - Fh))
    v_pole_s = ArB * np.log(np.tan(FORTPI + Fh))
    return OmercConsts(A=float(A), B=float(B), E=float(E), ArB=float(ArB),
                       BrA=float(1.0 / ArB), rB=float(1.0 / B),
                       singam=float(np.sin(gamma0)),
                       cosgam=float(np.cos(gamma0)),
                       sinrot=float(np.sin(gamma)),
                       cosrot=float(np.cos(gamma)),
                       v_pole_n=float(v_pole_n), v_pole_s=float(v_pole_s),
                       u_0=float(u_0), no_rot=no_rot, e=e, lam0=float(lam0))


def omerc_fwd(lam, phi, C: OmercConsts):
    """omerc.cpp:45-80."""
    EPS = 1e-10
    TOL = 1e-7
    polar = np.abs(np.abs(phi) - HALFPI) <= EPS
    with np.errstate(invalid="ignore", divide="ignore"):
        W = C.E / tsfn(phi, np.sin(phi), C.e) ** C.B
        S = 0.5 * (W - 1.0 / W)
        T = 0.5 * (W + 1.0 / W)
        V = np.sin(C.B * lam)
        U = (S * C.singam - V * C.cosgam) / T
        U_bad = np.abs(np.abs(U) - 1.0) < EPS
        v = 0.5 * C.ArB * np.log((1.0 - U) / (1.0 + U))
        temp = np.cos(C.B * lam)
        u = np.where(np.abs(temp) < TOL, C.A * lam,
                     C.ArB * np.arctan2(S * C.cosgam + V * C.singam, temp))
    v = np.where(polar, np.where(phi > 0, C.v_pole_n, C.v_pole_s), v)
    u = np.where(polar, C.ArB * phi, u)
    v = np.where(U_bad & ~polar, np.nan, v)
    u = np.where(U_bad & ~polar, np.nan, u)
    if C.no_rot:
        return u, v
    u = u - C.u_0
    x = v * C.cosrot + u * C.sinrot
    y = u * C.cosrot - v * C.sinrot
    return x, y


def omerc_inv(x, y, C: OmercConsts):
    """omerc.cpp:82-117."""
    EPS = 1e-10
    if C.no_rot:
        v, u = y, x
    else:
        v = x * C.cosrot - y * C.sinrot
        u = y * C.cosrot + x * C.sinrot + C.u_0
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        Qp = np.exp(-C.BrA * v)
        Sp = 0.5 * (Qp - 1.0 / Qp)
        Tp = 0.5 * (Qp + 1.0 / Qp)
        Vp = np.sin(C.BrA * u)
        Up = (Vp * C.cosgam + Sp * C.singam) / Tp
        pole = np.abs(np.abs(Up) - 1.0) < EPS
        r = C.E / np.sqrt((1.0 + Up) / (1.0 - Up))
        phi = phi2(r ** (1.0 / C.B), C.e)
        lam = -C.rB * np.arctan2(Sp * C.cosgam - Vp * C.singam,
                                 np.cos(C.BrA * u))
    phi = np.where(pole, np.where(Up < 0.0, -HALFPI, HALFPI), phi)
    lam = np.where(pole, 0.0, lam)
    return lam, phi
