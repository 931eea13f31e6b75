"""Pseudocylindrical long-tail family, vectorized.

Re-derivations (constants and formulas per the cited reference files;
all spherical, (lam, phi) radians -> (x, y) in units of R):

- eck1 (eck1.cpp), eck2 (eck2.cpp), eck5 (eck5.cpp)
- eck3 family: eck3 / kav7 / wag6 / putp1 — shared
  x = C_x·λ·(A + sqrt(1 − B·φ²)), y = C_y·φ (eck3.cpp:30-98)
- sts family: kav5 / qua_aut / fouc / mbt_s — shared sine-tangent
  series x = (q/p)·λ·cosφ/cos(φ/q)…, (sts.cpp:21-100)
- urmfps family: urmfps(+n) / wag1 (urmfps.cpp:18-80)
- gn_sinu family: gn_sinu(+m+n) / eck6 / mbtfps — generalized
  sinusoidal with Newton latitude solve (gn_sinu.cpp:55-170)
- wag2 (wag2.cpp), wag3 (wag3.cpp), wag5 (moll.cpp:94-110 —
  Mollweide machinery with fixed C_x/C_y/C_p)
"""

from __future__ import annotations

import numpy as np

MAX_ITER = 8
LOOP_TOL = 1e-7


# --- eck1 ---------------------------------------------------------------
_E1_FC = 0.92131773192356127802
_E1_RP = 0.31830988618379067154


def eck1_fwd(lam, phi):
    return _E1_FC * lam * (1.0 - _E1_RP * np.abs(phi)), _E1_FC * phi


def eck1_inv(x, y):
    phi = y / _E1_FC
    return x / (_E1_FC * (1.0 - _E1_RP * np.abs(phi))), phi


# --- eck2 ---------------------------------------------------------------
_E2_FXC = 0.46065886596178063902
_E2_FYC = 1.44720250911653531871


def eck2_fwd(lam, phi):
    s = np.sqrt(4.0 - 3.0 * np.sin(np.abs(phi)))
    x = _E2_FXC * lam * s
    y = _E2_FYC * (2.0 - s)
    return x, np.where(phi < 0, -y, y)


def eck2_inv(x, y):
    s = 2.0 - np.abs(y) / _E2_FYC
    lam = x / (_E2_FXC * s)
    phi = np.arcsin(np.clip((4.0 - s * s) / 3.0, -1.0, 1.0))
    return lam, np.where(y < 0, -phi, phi)


# --- eck5 ---------------------------------------------------------------
_E5_XF = 0.44101277172455148219
_E5_YF = 0.88202554344910296438


def eck5_fwd(lam, phi):
    return _E5_XF * (1.0 + np.cos(phi)) * lam, _E5_YF * phi


def eck5_inv(x, y):
    phi = y / _E5_YF
    return x / (_E5_XF * (1.0 + np.cos(phi))), phi


# --- eck3 family (eck3/kav7/wag6/putp1) ---------------------------------
ECK3_PARAMS = {
    # name: (C_x, C_y, A, B)      eck3.cpp:50-110
    "eck3": (0.42223820031577120149, 0.84447640063154240298, 1.0,
             0.4052847345693510857755),
    "kav7": (0.8660254037844, 1.0, 0.0, 0.30396355092701331433),
    "wag6": (0.94745, 0.94745, 0.0, 0.30396355092701331433),
    "putp1": (1.89490, 0.94745, -0.5, 0.30396355092701331433),
}


def eck3_fwd(lam, phi, C):
    C_x, C_y, A, B = C
    return C_x * lam * (A + np.sqrt(np.clip(1.0 - B * phi * phi, 0.0, None))), C_y * phi


def eck3_inv(x, y, C):
    C_x, C_y, A, B = C
    phi = y / C_y
    den = A + np.sqrt(np.clip(1.0 - B * phi * phi, 0.0, None))
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = np.where(den != 0, x / (C_x * den), 0.0)
    return lam, phi


# --- sts family (kav5/qua_aut/fouc/mbt_s) -------------------------------
STS_PARAMS = {
    # name: (p, q, tan_mode)      sts.cpp:75-110
    "kav5": (1.50488, 1.35439, False),
    "qua_aut": (2.0, 2.0, False),
    "fouc": (2.0, 2.0, True),
    "mbt_s": (1.48875, 1.36509, False),
}


def sts_fwd(lam, phi, p, q, tan_mode):
    C_x, C_y, C_p = q / p, p, 1.0 / q
    x = C_x * lam * np.cos(phi)
    pp = phi * C_p
    c = np.cos(pp)
    if tan_mode:
        return x * c * c, C_y * np.tan(pp)
    with np.errstate(invalid="ignore", divide="ignore"):
        return x / c, C_y * np.sin(pp)


def sts_inv(x, y, p, q, tan_mode):
    C_x, C_y, C_p = q / p, p, 1.0 / q
    yy = y / C_y
    pp = np.arctan(yy) if tan_mode else np.arcsin(np.clip(yy, -1.0, 1.0))
    c = np.cos(pp)
    phi = pp / C_p
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = x / (C_x * np.cos(phi))
    if tan_mode:
        lam = lam / (c * c)
    else:
        lam = lam * c
    return lam, phi


# --- urmfps family (urmfps/wag1) ----------------------------------------
_U_CX = 0.8773826753
_U_CY = 1.139753528477


def urmfps_fwd(lam, phi, n):
    pp = np.arcsin(np.clip(n * np.sin(phi), -1.0, 1.0))
    return _U_CX * lam * np.cos(pp), (_U_CY / n) * pp


def urmfps_inv(x, y, n):
    yy = y / (_U_CY / n)
    phi = np.arcsin(np.clip(np.sin(yy) / n, -1.0, 1.0))
    lam = x / (_U_CX * np.cos(yy))
    return lam, phi


WAG1_N = 0.8660254037844386467637231707


# --- gn_sinu family (gn_sinu/eck6/mbtfps) -------------------------------
GN_SINU_PARAMS = {
    "eck6": (1.0, 2.570796326794896619231321691),
    "mbtfps": (0.5, 1.785398163397448309615660845),
}


def gn_sinu_fwd(lam, phi, m, n):
    C_y = np.sqrt((m + 1.0) / n)
    C_x = C_y / (m + 1.0)
    if m == 0.0:
        pp = np.arcsin(np.clip(n * np.sin(phi), -1, 1)) if n != 1.0 else phi
    else:
        k = n * np.sin(phi)
        pp = phi.copy()
        for _ in range(MAX_ITER):
            V = (m * pp + np.sin(pp) - k) / (m + np.cos(pp))
            pp = pp - V
            if np.all(np.abs(V) < LOOP_TOL):
                break
    return C_x * lam * (m + np.cos(pp)), C_y * pp


def gn_sinu_inv(x, y, m, n):
    C_y = np.sqrt((m + 1.0) / n)
    C_x = C_y / (m + 1.0)
    pp = y / C_y
    if m == 0.0:
        phi = np.arcsin(np.clip(np.sin(pp) / n, -1, 1)) if n != 1.0 else pp
    else:
        phi = np.arcsin(np.clip((m * pp + np.sin(pp)) / n, -1.0, 1.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = x / (C_x * (m + np.cos(pp)))
    return lam, phi


# --- wag2 / wag3 / wag5 -------------------------------------------------

def wag2_fwd(lam, phi):
    pp = np.arcsin(np.clip(0.88022 * np.sin(0.88550 * phi), -1, 1))
    return 0.92483 * lam * np.cos(pp), 1.38725 * pp


def wag2_inv(x, y):
    pp = y / 1.38725
    phi = np.arcsin(np.clip(np.sin(pp) / 0.88022, -1, 1)) / 0.88550
    return x / (0.92483 * np.cos(pp)), phi


def wag3_fwd(lam, phi, lat_ts: float = 0.0):
    C_x = np.cos(lat_ts) / np.cos(2.0 * lat_ts / 3.0)
    return C_x * lam * np.cos(2.0 / 3.0 * phi), phi


def wag3_inv(x, y, lat_ts: float = 0.0):
    C_x = np.cos(lat_ts) / np.cos(2.0 * lat_ts / 3.0)
    return x / (C_x * np.cos(2.0 / 3.0 * y)), y


def wag5_fwd(lam, phi, max_iter: int = 10, tol: float = 1e-7):
    """Mollweide machinery with C_x=0.90977 C_y=1.65014 C_p=3.00896
    (moll.cpp:94-110)."""
    C_x, C_y, C_p = 0.90977, 1.65014, 3.00896
    k = C_p * np.sin(phi)
    theta = phi.copy()
    for _ in range(max_iter):
        c = 1.0 + np.cos(theta)
        V = (theta + np.sin(theta) - k) / c
        theta = theta - V
        if np.all(np.abs(V) < tol):
            break
    theta = theta * 0.5
    return C_x * lam * np.cos(theta), C_y * np.sin(theta)


# --- vandg (van der Grinten I) ------------------------------------------

def vandg_fwd(lam, phi, over: bool = False):
    """van der Grinten I (vandg.cpp:16-80; Snyder 1987 29-1..29-6),
    vectorized with the same branch structure.  With +over, |lam| > pi
    flips the sign of A so x keeps growing past the antimeridian
    (vandg.cpp:26-28)."""
    TOL = 1e-10
    p2 = np.abs(phi / (np.pi / 2.0))
    p2 = np.minimum(p2, 1.0)
    sign = np.where(over & (np.abs(lam) > np.pi), -1.0, 1.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        al = 0.5 * sign * np.abs(np.pi / lam - lam / np.pi)
        al2 = al * al
        g = np.sqrt(np.clip(1.0 - p2 * p2, 0.0, None))
        g = g / (p2 + g - 1.0)
        g2 = g * g
        P = g * (2.0 / p2 - 1.0)
        P2 = P * P
        xg = g - P2
        gg = P2 + al2
        x = (np.pi * np.abs(al * xg + np.sqrt(np.clip(
            al2 * xg * xg - gg * (g2 - P2), 0.0, None))) / gg)
        x = np.where(lam < 0, -x, x)
        yy = np.abs(x / np.pi)
        yy = 1.0 - yy * (yy + 2.0 * al)
        y = np.sqrt(np.clip(yy, 0.0, None)) * np.where(phi < 0, -np.pi, np.pi)
    # special branches (vandg.cpp:30-38)
    eq = np.abs(phi) <= TOL
    meridian = (np.abs(lam) <= TOL) | (np.abs(p2 - 1.0) < TOL)
    y_pole = np.pi * np.tan(0.5 * np.arcsin(p2))
    y_pole = np.where(phi < 0, -y_pole, y_pole)
    x = np.where(eq, lam, np.where(meridian, 0.0, x))
    y = np.where(eq, 0.0, np.where(meridian, y_pole, y))
    return x, y


def vandg_inv(x, y):
    """van der Grinten I closed-form inverse (vandg.cpp:79-130;
    Snyder 1987 29-11..29-18 cubic solution), vectorized."""
    TOL = 1e-10
    THIRD = 0.33333333333333333333
    C2_27 = 0.07407407407407407407
    PI4_3 = 4.18879020478639098458
    PISQ = 9.86960440108935861869
    TPISQ = 19.73920880217871723738
    HPISQ = 4.93480220054467930934
    with np.errstate(invalid="ignore", divide="ignore"):
        x2 = x * x
        ay = np.abs(y)
        y2 = y * y
        r = x2 + y2
        r2 = r * r
        c1 = -np.pi * ay * (r + PISQ)
        c3 = r2 + 2.0 * np.pi * (ay * r + np.pi * (y2 + np.pi
                                                   * (ay + 0.5 * np.pi)))
        c2 = c1 + PISQ * (r - 3.0 * y2)
        c0 = np.pi * ay
        c2 = c2 / c3
        al = c1 / c3 - THIRD * c2 * c2
        m = 2.0 * np.sqrt(np.clip(-THIRD * al, 0.0, None))
        d = C2_27 * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
        al_mul_m = al * m
        degenerate = np.abs(al_mul_m) < 1e-16
        d = 3.0 * d / np.where(degenerate, np.nan, al_mul_m)
        t = np.abs(d)
        in_dom = (t - TOL) <= 1.0
        dd = np.where(t > 1.0, np.where(d > 0.0, 0.0, np.pi),
                      np.arccos(np.clip(d, -1.0, 1.0)))
        dd = np.where(r > PISQ, 2.0 * np.pi - dd, dd)
        phi = np.pi * (m * np.cos(dd * THIRD + PI4_3) - THIRD * c2)
        phi = np.where(y < 0.0, -phi, phi)
        tt = r2 + TPISQ * (x2 - y2 + HPISQ)
        lam = np.where(np.abs(x) <= TOL, 0.0,
                       0.5 * (r - PISQ + np.sqrt(np.clip(tt, 0.0, None)))
                       / np.where(x == 0, 1.0, x))
        # equator branch (vandg.cpp:84-88)
        teq = x2 * x2 + TPISQ * (x2 + HPISQ)
        lam_eq = np.where(np.abs(x) <= TOL, 0.0,
                          0.5 * (x2 - PISQ + np.sqrt(teq))
                          / np.where(x == 0, 1.0, x))
        eq = ay < TOL
        phi = np.where(eq, 0.0, np.where(in_dom & ~degenerate, phi, np.nan))
        lam = np.where(eq, lam_eq,
                       np.where(in_dom & ~degenerate, lam, np.nan))
    return lam, phi
