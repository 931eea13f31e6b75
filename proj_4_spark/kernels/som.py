"""Space Oblique Mercator (som / lsat / misrsom).

Vectorized NumPy re-derivation of /root/reference/src/projections/som.cpp:
- Fourier constants via 104-point Simpson weights (seraz0, :24-44 +
  setup :162-195)
- forward: satellite-track latitude iteration with the three-branch
  lampp retry (:46-106), masked per point
- inverse: 50-iteration fixed point on lamdp (:108-160)

(lam, phi) radians in, (x, y) in units of a out.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import FORTPI, HALFPI

TOL = 1e-7
TWOPI = 2.0 * np.pi
PI_HALFPI = np.pi + HALFPI
TWOPI_HALFPI = TWOPI + HALFPI


@dataclass(frozen=True)
class SomConsts:
    a2: float
    a4: float
    b: float
    c1: float
    c3: float
    q: float
    t: float
    u: float
    w: float
    p22: float
    sa: float
    ca: float
    xj: float
    rlm: float
    rlm2: float
    es: float
    one_es: float
    rone_es: float


def setup(alf: float, p22: float, rlm: float, ell) -> SomConsts:
    """som.cpp som_setup (:162-195) incl. the seraz0 Simpson sweep."""
    es, one_es = ell.es, ell.one_es
    rone_es = 1.0 / one_es
    sa = np.sin(alf)
    ca = np.cos(alf)
    if abs(ca) < 1e-9:
        ca = 1e-9
    esc = es * ca * ca
    ess = es * sa * sa
    w = (1.0 - esc) * rone_es
    w = w * w - 1.0
    q = ess * rone_es
    t = ess * (2.0 - es) * rone_es * rone_es
    u = esc * rone_es
    xj = one_es * one_es * one_es
    rlm2 = rlm + TWOPI

    a2 = a4 = b = c1 = c3 = 0.0

    def seraz0(lam_deg, mult):
        nonlocal a2, a4, b, c1, c3
        lam = np.radians(lam_deg)
        sd = np.sin(lam)
        sdsq = sd * sd
        s = p22 * sa * np.cos(lam) * np.sqrt(
            (1.0 + t * sdsq) / ((1.0 + w * sdsq) * (1.0 + q * sdsq)))
        d1 = 1.0 + q * sdsq
        h = np.sqrt((1.0 + q * sdsq) / (1.0 + w * sdsq)) * (
            (1.0 + w * sdsq) / (d1 * d1) - p22 * ca)
        sq = np.sqrt(xj * xj + s * s)
        fc = mult * (h * xj - s * s) / sq
        b += fc
        a2 += fc * np.cos(lam + lam)
        a4 += fc * np.cos(lam * 4.0)
        fc = mult * s * (h + xj) / sq
        c1 += fc * np.cos(lam)
        c3 += fc * np.cos(lam * 3.0)

    seraz0(0.0, 1.0)
    lam = 9.0
    while lam <= 81.0001:
        seraz0(lam, 4.0)
        lam += 18.0
    lam = 18.0
    while lam <= 72.0001:
        seraz0(lam, 2.0)
        lam += 18.0
    seraz0(90.0, 1.0)
    a2 /= 30.0
    a4 /= 60.0
    b /= 30.0
    c1 /= 15.0
    c3 /= 45.0
    return SomConsts(a2=a2, a4=a4, b=b, c1=c1, c3=c3, q=q, t=t, u=u, w=w,
                     p22=p22, sa=float(sa), ca=float(ca), xj=xj, rlm=rlm,
                     rlm2=rlm2, es=es, one_es=one_es, rone_es=rone_es)


def fwd(lam, phi, C: SomConsts):
    """som.cpp:46-106 with the lampp retry masked per point."""
    phi = np.clip(phi, -HALFPI, HALFPI)
    lampp = np.where(phi >= 0.0, HALFPI, PI_HALFPI)
    tanphi = np.tan(phi)
    lamt = np.zeros_like(lam)
    lamdp = np.zeros_like(lam)
    converged = np.zeros(lam.shape, dtype=bool)
    active = np.ones(lam.shape, dtype=bool)
    with np.errstate(invalid="ignore", divide="ignore"):
        for _nn in range(3):
            if not active.any():
                break
            sav = lampp.copy()
            lamtp = lam + C.p22 * lampp
            cl = np.cos(lamtp)
            fac = np.where(cl < 0,
                           lampp + np.sin(lampp) * HALFPI,
                           lampp - np.sin(lampp) * HALFPI)
            inner_ok = np.zeros(lam.shape, dtype=bool)
            for _l in range(51):
                lamt_new = lam + C.p22 * sav
                c = np.cos(lamt_new)
                lamt_new = np.where(np.abs(c) < TOL, lamt_new - TOL, lamt_new)
                c = np.cos(lamt_new)
                xlam = (C.one_es * tanphi * C.sa
                        + np.sin(lamt_new) * C.ca) / c
                lamdp_new = np.arctan(xlam) + fac
                upd = active & ~inner_ok
                lamt = np.where(upd, lamt_new, lamt)
                lamdp = np.where(upd, lamdp_new, lamdp)
                inner_ok = inner_ok | (upd & (np.abs(np.abs(sav)
                                                    - np.abs(lamdp_new))
                                              < TOL))
                sav = np.where(upd, lamdp_new, sav)
            in_branch = (lamdp > C.rlm) & (lamdp < C.rlm2)
            done_now = active & (inner_ok & in_branch | ~inner_ok)
            converged |= active & inner_ok & in_branch
            # retry with shifted lampp for points outside the branch
            retry = active & inner_ok & ~in_branch
            lampp = np.where(retry & (lamdp <= C.rlm), TWOPI_HALFPI, lampp)
            lampp = np.where(retry & (lamdp >= C.rlm2), HALFPI, lampp)
            active = retry
        converged |= ~active & converged
        # final evaluation (som.cpp:88-104)
        sp = np.sin(phi)
        phidp = np.arcsin(np.clip(
            (C.one_es * C.ca * sp - C.sa * np.cos(phi) * np.sin(lamt))
            / np.sqrt(1.0 - C.es * sp * sp), -1.0, 1.0))
        tanph = np.log(np.tan(FORTPI + 0.5 * phidp))
        sd = np.sin(lamdp)
        sdsq = sd * sd
        s = C.p22 * C.sa * np.cos(lamdp) * np.sqrt(
            (1.0 + C.t * sdsq) / ((1.0 + C.w * sdsq) * (1.0 + C.q * sdsq)))
        d = np.sqrt(C.xj * C.xj + s * s)
        x = (C.b * lamdp + C.a2 * np.sin(2.0 * lamdp)
             + C.a4 * np.sin(lamdp * 4.0) - tanph * s / d)
        y = (C.c1 * sd + C.c3 * np.sin(lamdp * 3.0) + tanph * C.xj / d)
    bad = ~converged
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y


def inv(x, y, C: SomConsts, max_iter: int = 50):
    """som.cpp:108-160."""
    with np.errstate(invalid="ignore", divide="ignore"):
        lamdp = x / C.b
        s = np.zeros_like(x)
        for _ in range(max_iter):
            sav = lamdp
            sd = np.sin(lamdp)
            sdsq = sd * sd
            s = C.p22 * C.sa * np.cos(lamdp) * np.sqrt(
                (1.0 + C.t * sdsq)
                / ((1.0 + C.w * sdsq) * (1.0 + C.q * sdsq)))
            lamdp = (x + y * s / C.xj - C.a2 * np.sin(2.0 * lamdp)
                     - C.a4 * np.sin(lamdp * 4.0)
                     - s / C.xj * (C.c1 * np.sin(lamdp)
                                   + C.c3 * np.sin(lamdp * 3.0)))
            lamdp = lamdp / C.b
            if np.all(np.abs(lamdp - sav) < TOL):
                break
        sl = np.sin(lamdp)
        fac = np.exp(np.sqrt(1.0 + s * s / (C.xj * C.xj))
                     * (y - C.c1 * sl - C.c3 * np.sin(lamdp * 3.0)))
        phidp = 2.0 * (np.arctan(fac) - FORTPI)
        dd = sl * sl
        lamdp = np.where(np.abs(np.cos(lamdp)) < TOL, lamdp - TOL, lamdp)
        spp = np.sin(phidp)
        sppsq = spp * spp
        denom = 1.0 - sppsq * (1.0 + C.u)
        lamt = np.arctan(
            ((1.0 - sppsq * C.rone_es) * np.tan(lamdp) * C.ca
             - spp * C.sa * np.sqrt(np.clip(
                 (1.0 + C.q * dd) * (1.0 - sppsq) - sppsq * C.u, 0.0, None))
             / np.cos(lamdp)) / denom)
        sl_sign = np.where(lamt >= 0.0, 1.0, -1.0)
        scl = np.where(np.cos(lamdp) >= 0.0, 1.0, -1.0)
        lamt = lamt - HALFPI * (1.0 - scl) * sl_sign
        lam = lamt - C.p22 * lamdp
        if abs(C.sa) < TOL:
            phi = np.arcsin(np.clip(
                spp / np.sqrt(C.one_es * C.one_es + C.es * sppsq), -1, 1))
        else:
            phi = np.arctan((np.tan(lamdp) * np.cos(lamt)
                             - C.ca * np.sin(lamt)) / (C.one_es * C.sa))
        phi = np.where(denom == 0.0, np.nan, phi)
        lam = np.where(denom == 0.0, np.nan, lam)
    return lam, phi
