"""Long-tail spherical projections + the simple-conics family.

Vectorized NumPy re-derivations, one reference file each (all under
/root/reference/src/projections/): cc, tcc, times, patterson,
natearth2, comill, collg, crast, fahey, denoy, loxim, nell, nell_h,
wink1, wink2, urm5, wag7, lask, gins8, august, nicol, larr, fouc_s,
boggs, hatano, bacon/apian/ortel (bacon.cpp), and sconics.cpp
(euler, murd1-3, pconic, tissot, vitk1).

All operate (lam, phi) radians -> (x, y) units of a; es forced 0 by
the registration (matching each reference setup).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import FORTPI, HALFPI

EPS10 = 1e-10


def _newton_theta(phi, k, max_iter=10, tol=1e-7):
    """theta + sin(theta) = k solve (shared by nell/wink2/boggs...).
    Points not meeting LOOP_TOL within MAX_ITER (poles, where the
    derivative 1+cos vanishes) snap to ±pi so the caller's halving
    yields ±pi/2 — the reference's loop-exhaustion fallback
    (e.g. wink2.cpp:28-36, moll.cpp:28-40)."""
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
    return np.where(conv, theta, np.where(phi < 0, -np.pi, np.pi))


# --- cylindricals / pseudocylindricals ---------------------------------

def cc_fwd(lam, phi):
    """cc.cpp: central cylindrical."""
    bad = np.abs(np.abs(phi) - HALFPI) <= EPS10
    with np.errstate(invalid="ignore"):
        y = np.tan(phi)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, y)


def cc_inv(x, y):
    return x, np.arctan(y)


def tcc_fwd(lam, phi):
    """tcc.cpp: transverse central cylindrical (no inverse in ref)."""
    b = np.cos(phi) * np.sin(lam)
    bt = 1.0 - b * b
    with np.errstate(invalid="ignore", divide="ignore"):
        x = b / np.sqrt(bt)
        y = np.arctan2(np.tan(phi), np.cos(lam))
    bad = bt < EPS10
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def times_fwd(lam, phi):
    """times.cpp (Times Atlas)."""
    T = np.tan(phi / 2.0)
    S = np.sin(FORTPI * T)
    return lam * (0.74482 - 0.34588 * S * S), 1.70711 * T


def times_inv(x, y):
    T = y / 1.70711
    S = np.sin(FORTPI * T)
    return x / (0.74482 - 0.34588 * S * S), 2.0 * np.arctan(T)


_PATT_K = (1.0148, 0.23185, -0.14499, 0.02406)


def patterson_fwd(lam, phi):
    """patterson.cpp polynomial."""
    K1, K2, K3, K4 = _PATT_K
    p2 = phi * phi
    return lam, phi * (K1 + p2 * p2 * (K2 + p2 * (K3 + K4 * p2)))


def patterson_inv(x, y, max_iter=100, tol=1e-11):
    K1, K2, K3, K4 = _PATT_K
    y = np.clip(y, -1.790857183, 1.790857183)
    yc = y.copy()
    for _ in range(max_iter):
        y2 = yc * yc
        f = yc * (K1 + y2 * y2 * (K2 + y2 * (K3 + K4 * y2))) - y
        fder = K1 + y2 * y2 * (5.0 * K2 + y2 * (7.0 * K3 + 9.0 * K4 * y2))
        yc = yc - f / fder
        if np.all(np.abs(f / fder) < tol):
            break
    return x, yc


_NE2_A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
_NE2_B = (1.01183, -0.02625, 0.01926, -0.00396)


def natearth2_fwd(lam, phi):
    """natearth2.cpp polynomial."""
    A0, A1, A2, A3, A4, A5 = _NE2_A
    B0, B1, B2, B3 = _NE2_B
    p2 = phi * phi
    p4 = p2 * p2
    p6 = p2 * p4
    x = lam * (A0 + A1 * p2 + p6 * p6 * (A2 + A3 * p2 + A4 * p4 + A5 * p6))
    y = phi * (B0 + p4 * p4 * (B1 + B2 * p2 + B3 * p4))
    return x, y


def natearth2_inv(x, y, max_iter=100, tol=1e-11):
    A0, A1, A2, A3, A4, A5 = _NE2_A
    B0, B1, B2, B3 = _NE2_B
    y = np.clip(y, -0.84719 * 0.535117535153096 * np.pi,
                0.84719 * 0.535117535153096 * np.pi)
    yc = y.copy()
    for _ in range(max_iter):
        y2 = yc * yc
        y4 = y2 * y2
        f = yc * (B0 + y4 * y4 * (B1 + B2 * y2 + B3 * y4)) - y
        fder = B0 + y4 * y4 * (9.0 * B1 + 11.0 * B2 * y2 + 13.0 * B3 * y4)
        yc = yc - f / fder
        if np.all(np.abs(f / fder) < tol):
            break
    y2 = yc * yc
    y4 = y2 * y2
    y6 = y2 * y4
    lam = x / (A0 + A1 * y2 + y6 * y6 * (A2 + A3 * y2 + A4 * y4 + A5 * y6))
    return lam, yc


_COMILL_K = (0.9902, 0.1604, -0.03054)


def comill_fwd(lam, phi):
    """comill.cpp (Compact Miller)."""
    K1, K2, K3 = _COMILL_K
    p2 = phi * phi
    return lam, phi * (K1 + p2 * (K2 + K3 * p2))


def comill_inv(x, y, max_iter=100, tol=1e-11):
    K1, K2, K3 = _COMILL_K
    y = np.clip(y, -0.6000207669862655 * np.pi, 0.6000207669862655 * np.pi)
    yc = y.copy()
    for _ in range(max_iter):
        y2 = yc * yc
        f = yc * (K1 + y2 * (K2 + K3 * y2)) - y
        fder = K1 + y2 * (3.0 * K2 + 5.0 * K3 * y2)
        yc = yc - f / fder
        if np.all(np.abs(f / fder) < tol):
            break
    return x, yc


def collg_fwd(lam, phi):
    """collg.cpp (Collignon): FXC λ√(1−sinφ), FYC(1−√(1−sinφ))."""
    FXC = 1.12837916709551257390
    FYC = 1.77245385090551602729
    s = np.sqrt(np.clip(1.0 - np.sin(phi), 0.0, None))
    return FXC * lam * s, FYC * (1.0 - s)


def collg_inv(x, y):
    FXC = 1.12837916709551257390
    FYC = 1.77245385090551602729
    s = y / FYC - 1.0
    p = 1.0 - s * s
    phi = np.arcsin(np.clip(p, -1.0, 1.0))
    with np.errstate(invalid="ignore", divide="ignore"):
        ss = np.sqrt(np.clip(1.0 - np.sin(phi), 0.0, None))
        lam = np.where(ss == 0.0, 0.0, x / (FXC * ss))
    return lam, phi


def crast_fwd(lam, phi):
    """crast.cpp (Craster parabolic)."""
    XM = 0.97720502380583984317
    YM = 3.06998012383946546542
    p3 = phi / 3.0
    return XM * lam * (2.0 * np.cos(p3 + p3) - 1.0), YM * np.sin(p3)


def crast_inv(x, y):
    RXM = 1.02332670794648848847
    RYM = 0.32573500793527994772
    phi = 3.0 * np.arcsin(np.clip(y * RYM, -1.0, 1.0))
    lam = x * RXM / (2.0 * np.cos((phi + phi) / 3.0) - 1.0)
    return lam, phi


def fahey_fwd(lam, phi):
    """fahey.cpp."""
    t = np.tan(0.5 * phi)
    y = 1.819152 * t
    x = 0.819152 * lam * np.sqrt(np.clip(1.0 - t * t, 0.0, None))
    return x, y


def fahey_inv(x, y):
    t = y / 1.819152
    phi = 2.0 * np.arctan(t)
    d = 1.0 - t * t
    with np.errstate(invalid="ignore", divide="ignore"):
        lam = np.where(np.abs(d) < 1e-6, 0.0,
                       x / (0.819152 * np.sqrt(np.clip(d, 0, None))))
    return lam, phi


def denoy_fwd(lam, phi):
    """denoy.cpp (fwd only in the reference)."""
    C0, C1, C3 = 0.95, -0.08333333333333333333, 0.00166666666666666666
    D1, D5 = 0.9, 0.03
    al = np.abs(lam)
    x = lam * np.cos((C0 + al * (C1 + al * al * C3))
                     * (phi * (D1 + D5 * phi * phi * phi * phi)))
    return x, phi


def loxim_setup(params: dict) -> tuple:
    """loxim.cpp: (phi1, cosphi1, tanphi1)."""
    phi1 = float(params.get("lat_1", 0.0)) * np.pi / 180.0
    cosphi1 = np.cos(phi1)
    if cosphi1 < EPS10:
        raise ValueError("loxim: |lat_1| should be < 90")
    return phi1, float(cosphi1), float(np.tan(FORTPI + 0.5 * phi1))


def loxim_fwd(lam, phi, phi1, cosphi1, tanphi1):
    """loxim.cpp (loximuthal)."""
    dy = phi - phi1
    with np.errstate(invalid="ignore", divide="ignore"):
        a = FORTPI + 0.5 * phi
        deg = (np.abs(a) < EPS10) | (np.abs(np.abs(a) - HALFPI) < EPS10)
        x = np.where(deg, 0.0,
                     lam * dy / np.log(np.tan(a) / tanphi1))
    x = np.where(np.abs(dy) < EPS10, lam * cosphi1, x)
    return x, dy


def loxim_inv(x, y, phi1, cosphi1, tanphi1):
    phi = y + phi1
    with np.errstate(invalid="ignore", divide="ignore"):
        a = FORTPI + 0.5 * phi
        deg = (np.abs(a) < EPS10) | (np.abs(np.abs(a) - HALFPI) < EPS10)
        lam = np.where(deg, 0.0, x * np.log(np.tan(a) / tanphi1) / y)
    lam = np.where(np.abs(y) < EPS10, x / cosphi1, lam)
    return lam, phi


def nell_fwd(lam, phi):
    """nell.cpp: seeded Newton for theta + sin theta = 2 sin phi."""
    k = 2.0 * np.sin(phi)
    p2 = phi * phi
    seed = phi * (1.00371 + p2 * (-0.0935382 + p2 * -0.011412))
    theta = _newton_theta(seed, k)
    return 0.5 * lam * (1.0 + np.cos(theta)), theta


def nell_inv(x, y):
    lam = 2.0 * x / (1.0 + np.cos(y))
    phi = np.arcsin(np.clip(0.5 * (y + np.sin(y)), -1.0, 1.0))
    return lam, phi


def nell_h_fwd(lam, phi):
    """nell_h.cpp."""
    return 0.5 * lam * (1.0 + np.cos(phi)), 2.0 * (phi - np.tan(0.5 * phi))


def nell_h_inv(x, y, max_iter=9, tol=1e-7):
    p = 0.5 * y
    phi = np.zeros_like(y)
    for _ in range(max_iter):
        c = np.cos(0.5 * phi)
        V = (phi - np.tan(phi / 2.0) - p) / (1.0 - 0.5 / (c * c))
        phi = phi - V
        if np.all(np.abs(V) < tol):
            break
    pole = np.abs(p) >= HALFPI - 1e-9
    phi = np.where(pole, np.sign(y) * HALFPI, phi)
    lam = np.where(pole, 0.0, 2.0 * x / (1.0 + np.cos(phi)))
    return lam, phi


def wink1_fwd(lam, phi, cosphi1):
    """wink1.cpp (+lat_ts)."""
    return 0.5 * lam * (cosphi1 + np.cos(phi)), phi


def wink1_inv(x, y, cosphi1):
    return 2.0 * x / (cosphi1 + np.cos(y)), y


def wink2_fwd(lam, phi, cosphi1):
    """wink2.cpp (+lat_1, fwd only in the reference)."""
    ybase = phi * 2.0 / np.pi
    k = np.pi * np.sin(phi)
    theta = _newton_theta(phi * 1.8, k)
    theta = theta * 0.5
    x = 0.5 * lam * (np.cos(theta) + cosphi1)
    y = FORTPI * (np.sin(theta) + ybase)
    return x, y


def urm5_setup(params: dict) -> tuple:
    """urm5.cpp: (n, m, rmn, q3)."""
    if "n" not in params:
        raise ValueError("urm5: missing parameter n")
    n = float(params["n"])
    if not (0.0 < n <= 1.0):
        raise ValueError("urm5: n should be in ]0,1]")
    q3 = float(params.get("q", 0.0)) / 3.0
    alpha = np.radians(float(params.get("alpha", 0.0)))
    t = n * np.sin(alpha)
    m = np.cos(alpha) / np.sqrt(1.0 - t * t)
    return n, float(m), float(1.0 / (m * n)), q3


def urm5_fwd(lam, phi, n, m, rmn, q3):
    p = np.arcsin(np.clip(n * np.sin(phi), -1.0, 1.0))
    t = p * p
    return m * lam * np.cos(p), p * (1.0 + t * q3) * rmn


def wag7_fwd(lam, phi):
    """wag7.cpp (fwd only)."""
    s = 0.90630778703664996 * np.sin(phi)
    theta = np.arcsin(np.clip(s, -1, 1))
    ct = np.cos(theta)
    lam3 = lam / 3.0
    D = 1.0 / np.sqrt(0.5 * (1.0 + ct * np.cos(lam3)))
    return 2.66723 * ct * np.sin(lam3) * D, 1.24104 * s * D


def lask_fwd(lam, phi):
    """lask.cpp polynomial (fwd only)."""
    a10, a12, a32, a14 = 0.975534, -0.119161, -0.0143059, -0.0547009
    b01, b21, b03 = 1.00384, 0.0802894, 0.0998909
    b41, b23, b05 = 0.000199025, -0.0285500, -0.0491032
    l2 = lam * lam
    p2 = phi * phi
    x = lam * (a10 + p2 * (a12 + l2 * a32 + p2 * a14))
    y = phi * (b01 + l2 * (b21 + p2 * b23 + l2 * b41) + p2 * (b03 + p2 * b05))
    return x, y


def gins8_fwd(lam, phi):
    """gins8.cpp (fwd only)."""
    Cl, Cp, C12 = 0.000952426, 0.162388, 0.08333333333333333
    t = phi * phi
    y = phi * (1.0 + t * C12)
    x = lam * (1.0 - Cp * t)
    t = lam * lam
    x = x * (0.87 - Cl * t * t)
    return x, y


def august_fwd(lam, phi):
    """august.cpp (fwd only)."""
    M = 1.333333333333333
    t = np.tan(0.5 * phi)
    c1 = np.sqrt(np.clip(1.0 - t * t, 0.0, None))
    hl = lam * 0.5
    c = 1.0 + c1 * np.cos(hl)
    x1 = np.sin(hl) * c1 / c
    y1 = t / c
    x12 = x1 * x1
    y12 = y1 * y1
    return M * x1 * (3.0 + x12 - 3.0 * y12), M * y1 * (3.0 + 3.0 * x12 - y12)


def nicol_fwd(lam, phi):
    """nicol.cpp (Nicolosi globular, fwd only)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        tb = HALFPI / lam - lam / HALFPI
        c = phi / HALFPI
        sp = np.sin(phi)
        d = (1.0 - c * c) / (sp - c)
        r2 = (tb / d) ** 2
        m = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
        n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
        xg = np.sqrt(m * m + np.cos(phi) ** 2 / (1.0 + r2))
        x = HALFPI * (m + np.where(lam < 0.0, -xg, xg))
        yg = np.sqrt(np.clip(
            n * n - (sp * sp / r2 + d * sp - 1.0) / (1.0 + 1.0 / r2),
            0.0, None))
        y = HALFPI * (n + np.where(phi < 0.0, yg, -yg))
    x = np.where(np.abs(lam) < EPS10, 0.0, x)
    y = np.where(np.abs(lam) < EPS10, phi, y)
    mer = np.abs(phi) < EPS10
    x = np.where(mer, lam, x)
    y = np.where(mer, 0.0, y)
    edge = np.abs(np.abs(lam) - HALFPI) < EPS10
    x = np.where(edge, lam * np.cos(phi), x)
    y = np.where(edge, HALFPI * np.sin(phi), y)
    pole = np.abs(np.abs(phi) - HALFPI) < EPS10
    x = np.where(pole, 0.0, x)
    y = np.where(pole, phi, y)
    return x, y


def larr_fwd(lam, phi):
    """larr.cpp (Larrivee, fwd only)."""
    SIXTH = 0.16666666666666666
    x = 0.5 * lam * (1.0 + np.sqrt(np.cos(phi)))
    y = phi / (np.cos(0.5 * phi) * np.cos(SIXTH * lam))
    return x, y


def fouc_s_setup(params: dict) -> tuple:
    n = float(params.get("n", 0.0))
    if not (0.0 <= n <= 1.0):
        raise ValueError("fouc_s: n should be in [0,1]")
    return n, 1.0 - n


def fouc_s_fwd(lam, phi, n, n1):
    """fouc_s.cpp (Foucaut sinusoidal)."""
    t = np.cos(phi)
    return lam * t / (n + n1 * t), n * phi + n1 * np.sin(phi)


def fouc_s_inv(x, y, n, n1, max_iter=10, tol=1e-7):
    if n != 0.0:
        phi = y.copy()
        for _ in range(max_iter):
            V = (n * phi + n1 * np.sin(phi) - y) / (n + n1 * np.cos(phi))
            phi = phi - V
            if np.all(np.abs(V) < tol):
                break
    else:
        phi = np.arcsin(np.clip(y, -1.0, 1.0))
    t = np.cos(phi)
    return x * (n + n1 * t) / t, phi


def boggs_fwd(lam, phi):
    """boggs.cpp (eumorphic, fwd only)."""
    FXC, FXC2, FYC = 2.00276, 1.11072, 0.49931
    theta = _newton_theta(phi, np.sin(phi) * np.pi, max_iter=20, tol=1e-7)
    th = theta * 0.5
    with np.errstate(invalid="ignore", divide="ignore"):
        x = FXC * lam / (1.0 / np.cos(phi) + FXC2 / np.cos(th))
    x = np.where(np.abs(np.abs(phi) - HALFPI) < 1e-7, 0.0, x)
    y = FYC * (phi + np.sqrt(2.0) * np.sin(th))
    return x, y


def hatano_fwd(lam, phi):
    """hatano.cpp (asymmetrical equal area)."""
    CN, CS = 2.67595, 2.43763
    FYCN, FYCS, FXC = 1.75859, 1.93052, 0.85
    c = np.sin(phi) * np.where(phi < 0.0, CS, CN)
    theta = _newton_theta(phi, c, max_iter=20, tol=1e-7)
    th = theta * 0.5
    x = FXC * lam * np.cos(th)
    y = np.sin(th) * np.where(th < 0.0, FYCS, FYCN)
    return x, y


def hatano_inv(x, y):
    RYCN, RYCS = 0.56863737426006061674, 0.51799515156538134803
    RCN, RCS = 0.37369906014686373063, 0.41023453108141924738
    RXC = 1.17647058823529411764
    th = y * np.where(y < 0.0, RYCS, RYCN)
    th = np.arcsin(np.clip(th, -1.0, 1.0))
    lam = RXC * x / np.cos(th)
    th = th + th
    phi = (th + np.sin(th)) * np.where(y < 0.0, RCS, RCN)
    phi = np.arcsin(np.clip(phi, -1.0, 1.0))
    return lam, phi


def bacon_fwd(lam, phi, bacn: bool, ortl: bool):
    """bacon.cpp (bacon/apian/ortel globulars, fwd only)."""
    HLFPI2 = 2.46740110027233965467
    y = np.where(bacn, HALFPI * np.sin(phi), phi)
    ax = np.abs(lam)
    with np.errstate(invalid="ignore", divide="ignore"):
        f = 0.5 * (HLFPI2 / ax + ax)
        xg = ax - f + np.sqrt(np.clip(f * f - y * y, 0.0, None))
        if ortl:
            xo = np.sqrt(np.clip(HLFPI2 - phi * phi + EPS10, 0, None)) \
                + ax - HALFPI
            xg = np.where(ax >= HALFPI, xo, xg)
    x = np.where(ax >= EPS10, np.where(lam < 0.0, -xg, xg), 0.0)
    return x, y


# --- simple conics (sconics.cpp) ---------------------------------------

@dataclass(frozen=True)
class SconicsConsts:
    type: str
    n: float
    rho_c: float
    rho_0: float
    c1: float
    c2: float
    sig: float


def sconics_setup(params: dict, phi0: float, typ: str) -> SconicsConsts:
    """sconics.cpp:157-221."""
    if "lat_1" not in params or "lat_2" not in params:
        raise ValueError(f"{typ}: lat_1 and lat_2 should be specified")
    p1 = np.radians(float(params["lat_1"]))
    p2 = np.radians(float(params["lat_2"]))
    sig = 0.5 * (p2 + p1)
    del_ = 0.5 * (p2 - p1)
    if abs(del_) < EPS10 or abs(sig) < EPS10:
        raise ValueError(f"{typ}: |lat_1 - lat_2| and |lat_1 + lat_2| "
                         "should be > 0")
    c1 = c2 = 0.0
    if typ == "tissot":
        n = np.sin(sig)
        cs = np.cos(del_)
        rho_c = n / cs + cs / n
        rho_0 = np.sqrt((rho_c - 2.0 * np.sin(phi0)) / n)
    elif typ == "murd1":
        rho_c = np.sin(del_) / (del_ * np.tan(sig)) + sig
        rho_0 = rho_c - phi0
        n = np.sin(sig)
    elif typ == "murd2":
        cs = np.sqrt(np.cos(del_))
        rho_c = cs / np.tan(sig)
        rho_0 = rho_c + np.tan(sig - phi0)
        n = np.sin(sig) * cs
    elif typ == "murd3":
        rho_c = del_ / (np.tan(sig) * np.tan(del_)) + sig
        rho_0 = rho_c - phi0
        n = np.sin(sig) * np.sin(del_) * np.tan(del_) / (del_ * del_)
    elif typ == "euler":
        n = np.sin(sig) * np.sin(del_) / del_
        hd = del_ * 0.5
        rho_c = hd / (np.tan(hd) * np.tan(sig)) + sig
        rho_0 = rho_c - phi0
    elif typ == "pconic":
        n = np.sin(sig)
        c2 = np.cos(del_)
        c1 = 1.0 / np.tan(sig)
        d0 = phi0 - sig
        if abs(d0) - EPS10 >= HALFPI:
            raise ValueError("pconic: |lat_0 - 0.5*(lat_1+lat_2)| "
                             "should be < 90")
        rho_c = 0.0
        rho_0 = c2 * (c1 - np.tan(d0))
    else:  # vitk1
        cs = np.tan(del_)
        n = cs * np.sin(sig) / del_
        rho_c = del_ / (cs * np.tan(sig)) + sig
        rho_0 = rho_c - phi0
    return SconicsConsts(type=typ, n=float(n), rho_c=float(rho_c),
                         rho_0=float(rho_0), c1=float(c1), c2=float(c2),
                         sig=float(sig))


def sconics_fwd(lam, phi, C: SconicsConsts):
    """sconics.cpp:69-87."""
    if C.type == "murd2":
        rho = C.rho_c + np.tan(C.sig - phi)
    elif C.type == "pconic":
        rho = C.c2 * (C.c1 - np.tan(phi - C.sig))
    else:
        rho = C.rho_c - phi
    ln = lam * C.n
    return rho * np.sin(ln), C.rho_0 - rho * np.cos(ln)


def sconics_inv(x, y, C: SconicsConsts):
    """sconics.cpp:89-118."""
    yy = C.rho_0 - y
    rho = np.hypot(x, yy)
    if C.n < 0.0:
        rho = -rho
        x = -x
        yy = -yy
    lam = np.arctan2(x, yy) / C.n
    if C.type == "pconic":
        phi = np.arctan(C.c1 - rho / C.c2) + C.sig
    elif C.type == "murd2":
        phi = C.sig - np.arctan(rho - C.rho_c)
    else:
        phi = C.rho_c - rho
    return lam, phi


# --- batch 2: geos, goode, tcea/ocea, tobmerc, lagrng, vandg2-4,
#     tpeqd, airy ------------------------------------------------------

@dataclass(frozen=True)
class GeosConsts:
    radius_g: float
    radius_g_1: float
    C: float
    radius_p: float
    radius_p2: float
    radius_p_inv2: float
    flip_axis: bool
    spherical: bool


def geos_setup(params: dict, ell) -> GeosConsts:
    """geos.cpp setup: h (satellite height), sweep axis."""
    h = float(params.get("h", 0.0))
    sweep = str(params.get("sweep", "y"))
    if sweep not in ("x", "y"):
        raise ValueError("geos: sweep should be x or y")
    rg1 = h / ell.a
    if rg1 <= 0 or rg1 > 1e10:
        raise ValueError("geos: invalid value for h")
    rg = 1.0 + rg1
    C = rg * rg - 1.0
    if ell.es != 0.0:
        rp = np.sqrt(1.0 - ell.es)
        return GeosConsts(radius_g=rg, radius_g_1=rg1, C=C,
                          radius_p=float(rp), radius_p2=1.0 - ell.es,
                          radius_p_inv2=1.0 / (1.0 - ell.es),
                          flip_axis=sweep == "x", spherical=False)
    return GeosConsts(radius_g=rg, radius_g_1=rg1, C=C, radius_p=1.0,
                      radius_p2=1.0, radius_p_inv2=1.0,
                      flip_axis=sweep == "x", spherical=True)


def geos_fwd(lam, phi, C: GeosConsts):
    """geos.cpp s_forward/e_forward with the visibility check."""
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.spherical:
            cp = np.cos(phi)
            Vx = np.cos(lam) * cp
            Vy = np.sin(lam) * cp
            Vz = np.sin(phi)
            vis = (C.radius_g - Vx) * Vx - Vy * Vy - Vz * Vz >= 0.0
        else:
            phi_c = np.arctan(C.radius_p2 * np.tan(phi))
            r = C.radius_p / np.hypot(C.radius_p * np.cos(phi_c),
                                      np.sin(phi_c))
            Vx = r * np.cos(lam) * np.cos(phi_c)
            Vy = r * np.sin(lam) * np.cos(phi_c)
            Vz = r * np.sin(phi_c)
            vis = ((C.radius_g - Vx) * Vx - Vy * Vy
                   - Vz * Vz * C.radius_p_inv2) >= 0.0
        tmp = C.radius_g - Vx
        if C.flip_axis:
            x = C.radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
            y = C.radius_g_1 * np.arctan(Vz / tmp)
        else:
            x = C.radius_g_1 * np.arctan(Vy / tmp)
            y = C.radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
    return np.where(vis, x, np.nan), np.where(vis, y, np.nan)


def geos_inv(x, y, C: GeosConsts):
    """geos.cpp s_inverse/e_inverse (quadratic ray-ellipsoid hit)."""
    with np.errstate(invalid="ignore", divide="ignore"):
        Vx = -1.0
        if C.flip_axis:
            Vz = np.tan(y / C.radius_g_1)
            Vy = np.tan(x / C.radius_g_1) * np.hypot(1.0, Vz)
        else:
            Vy = np.tan(x / C.radius_g_1)
            Vz = np.tan(y / C.radius_g_1) * np.hypot(1.0, Vy)
        az = Vz / C.radius_p
        a = Vy * Vy + az * az + Vx * Vx
        b = 2.0 * C.radius_g * Vx
        det = b * b - 4.0 * a * C.C
        ok = det >= 0.0
        k = (-b - np.sqrt(np.clip(det, 0, None))) / (2.0 * a)
        Vx2 = C.radius_g + k * Vx
        Vy2 = Vy * k
        Vz2 = Vz * k
        lam = np.arctan2(Vy2, Vx2)
        phi = np.arctan(Vz2 * np.cos(lam) / Vx2)
        if not C.spherical:
            phi = np.arctan(C.radius_p_inv2 * np.tan(phi))
    return np.where(ok, lam, np.nan), np.where(ok, phi, np.nan)


_GOODE_Y_COR = 0.05280
_GOODE_PHI_LIM = 0.71093078197902358062


def goode_fwd(lam, phi, moll_C):
    """goode.cpp: sinusoidal below 40d44', Mollweide above (shifted)."""
    from .misc_proj import moll_fwd

    xs = lam * np.cos(phi)
    ys = phi
    xm, ym = moll_fwd(lam, phi, moll_C)
    ym = ym - np.where(phi >= 0.0, _GOODE_Y_COR, -_GOODE_Y_COR)
    use_sinu = np.abs(phi) <= _GOODE_PHI_LIM
    return np.where(use_sinu, xs, xm), np.where(use_sinu, ys, ym)


def goode_inv(x, y, moll_C):
    from .misc_proj import moll_inv

    with np.errstate(invalid="ignore", divide="ignore"):
        ls = x / np.cos(y)
        ps = y
        ym = y + np.where(y >= 0.0, _GOODE_Y_COR, -_GOODE_Y_COR)
        lm, pm = moll_inv(x, ym, moll_C)
    use_sinu = np.abs(y) <= _GOODE_PHI_LIM
    return np.where(use_sinu, ls, lm), np.where(use_sinu, ps, pm)


def tcea_fwd(lam, phi, k0: float, phi0: float):
    """tcea.cpp."""
    return (np.cos(phi) * np.sin(lam) / k0,
            k0 * (np.arctan2(np.tan(phi), np.cos(lam)) - phi0))


def tcea_inv(x, y, k0: float, phi0: float):
    yy = y / k0 + phi0
    xx = x * k0
    t = np.sqrt(np.clip(1.0 - xx * xx, 0.0, None))
    phi = np.arcsin(np.clip(t * np.sin(yy), -1.0, 1.0))
    lam = np.arctan2(xx, t * np.cos(yy))
    return lam, phi


@dataclass(frozen=True)
class OceaConsts:
    rok: float
    rtk: float
    sinphi: float
    cosphi: float
    lam0: float  # derived pole longitude + pi/2; adopted by proj.py


def ocea_setup(params: dict, k0: float, phi0: float) -> OceaConsts:
    """ocea.cpp: oblique pole from 1 point + azimuth or 2 points."""
    if "alpha" in params:
        alpha = np.pi + np.radians(float(params["alpha"]))
        lonz = np.radians(float(params.get("lonc", 0.0)))
        lam_p = np.arctan2(-np.cos(alpha),
                           -np.sin(phi0) * np.sin(alpha)) + lonz
        phi_p = np.arcsin(np.clip(np.cos(phi0) * np.sin(alpha), -1, 1))
    else:
        p1 = np.radians(float(params.get("lat_1", 0.0)))
        p2 = np.radians(float(params.get("lat_2", 0.0)))
        l1 = np.radians(float(params.get("lon_1", 0.0)))
        l2 = np.radians(float(params.get("lon_2", 0.0)))
        lam_p = np.arctan2(
            np.cos(p1) * np.sin(p2) * np.cos(l1)
            - np.sin(p1) * np.cos(p2) * np.cos(l2),
            np.sin(p1) * np.cos(p2) * np.sin(l2)
            - np.cos(p1) * np.sin(p2) * np.sin(l1))
        if l1 == -HALFPI:
            lam_p = -lam_p
        tan_p1 = np.tan(p1)
        cosd = np.cos(lam_p - l1)
        if abs(tan_p1) < EPS10:
            phi_p = -HALFPI if cosd >= 0.0 else HALFPI
        else:
            phi_p = np.arctan(-cosd / tan_p1)
    return OceaConsts(rok=1.0 / k0, rtk=k0, sinphi=float(np.sin(phi_p)),
                      cosphi=float(np.cos(phi_p)),
                      lam0=float(lam_p + HALFPI))


def ocea_fwd(lam, phi, C: OceaConsts):
    """ocea.cpp s_forward."""
    with np.errstate(invalid="ignore", divide="ignore"):
        s = np.sin(lam)
        t = np.cos(lam)
        x = np.arctan((np.tan(phi) * C.cosphi + C.sinphi * s) / t)
        x = np.where(t < 0.0, x + np.pi, x) * C.rtk
        y = C.rok * (C.sinphi * np.sin(phi)
                     - C.cosphi * np.cos(phi) * s)
    return x, y


def ocea_inv(x, y, C: OceaConsts):
    yy = y / C.rok
    xx = x / C.rtk
    t = np.sqrt(np.clip(1.0 - yy * yy, 0.0, None))
    s = np.sin(xx)
    phi = np.arcsin(np.clip(yy * C.sinphi + t * C.cosphi * s, -1, 1))
    lam = np.arctan2(t * C.sinphi * s - yy * C.cosphi, t * np.cos(xx))
    return lam, phi


def tobmerc_fwd(lam, phi, k0: float):
    """tobmerc.cpp."""
    bad = np.abs(phi) >= HALFPI
    cp = np.cos(phi)
    with np.errstate(invalid="ignore", divide="ignore"):
        x = k0 * lam * cp * cp
        y = k0 * np.arcsinh(np.tan(phi))
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def tobmerc_inv(x, y, k0: float):
    phi = np.arctan(np.sinh(y / k0))
    cp = np.cos(phi)
    return x / k0 / (cp * cp), phi


def lagrng_setup(params: dict) -> tuple:
    """lagrng.cpp: (a1, rw, hrw, w)."""
    w = float(params.get("W", 2.0))
    if w <= 0:
        raise ValueError("lagrng: W should be > 0")
    phi1 = np.radians(float(params.get("lat_1", 0.0)))
    s1 = np.sin(phi1)
    if abs(abs(s1) - 1.0) < EPS10:
        raise ValueError("lagrng: |lat_1| should be < 90")
    hrw = 0.5 / w
    a1 = ((1.0 - s1) / (1.0 + s1)) ** hrw
    return float(a1), 1.0 / w, hrw, w


def lagrng_fwd(lam, phi, a1, rw, hrw):
    """lagrng.cpp s_forward."""
    sp = np.sin(phi)
    pole = np.abs(np.abs(sp) - 1.0) < EPS10
    with np.errstate(invalid="ignore", divide="ignore"):
        v = a1 * ((1.0 + sp) / (1.0 - sp)) ** hrw
        lw = lam * rw
        c = 0.5 * (v + 1.0 / v) + np.cos(lw)
        x = 2.0 * np.sin(lw) / c
        y = (v - 1.0 / v) / c
    bad = c < EPS10
    x = np.where(pole, 0.0, np.where(bad, np.nan, x))
    y = np.where(pole, np.where(phi < 0, -2.0, 2.0),
                 np.where(bad, np.nan, y))
    return x, y


def lagrng_inv(x, y, a1, rw, hrw, w):
    """lagrng.cpp s_inverse (:46-69): closed form with the pole rows
    (|y| = 2) and the bounding-circle domain error (|c| < TOL)."""
    a2 = a1 * a1
    hw = 0.5 * w
    at_pole = np.abs(np.abs(y) - 2.0) < EPS10
    x2 = x * x
    y2p = 2.0 + y
    y2m = 2.0 - y
    c = y2p * y2m - x2
    bad = (np.abs(c) < EPS10) & ~at_pole
    with np.errstate(invalid="ignore", divide="ignore"):
        phi = 2.0 * np.arctan(((y2p * y2p + x2)
                               / (a2 * (y2m * y2m + x2))) ** hw) - HALFPI
        lam = w * np.arctan2(4.0 * x, c)
    phi = np.where(at_pole, np.where(y < 0, -HALFPI, HALFPI), phi)
    lam = np.where(at_pole, 0.0, lam)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


def vandg2_fwd(lam, phi, vdg3: bool):
    """vandg2.cpp (van der Grinten II/III, fwd only)."""
    TOL = 1e-10
    with np.errstate(invalid="ignore", divide="ignore"):
        bt = np.abs(2.0 / np.pi * phi)
        ct = np.sqrt(np.clip(1.0 - bt * bt, 0.0, None))
        at = 0.5 * np.abs(np.pi / lam - lam / np.pi)
        if vdg3:
            x1 = bt / (1.0 + ct)
            x = np.pi * (np.sqrt(at * at + 1.0 - x1 * x1) - at)
            y = np.pi * x1
        else:
            x1 = (ct * np.sqrt(1.0 + at * at) - at * ct * ct) \
                / (1.0 + at * at * bt * bt)
            x = np.pi * x1
            y = np.pi * np.sqrt(np.clip(1.0 - x1 * (x1 + 2.0 * at) + TOL,
                                        0.0, None))
        x = np.where(lam < 0.0, -x, x)
        y = np.where(phi < 0.0, -y, y)
        mer = np.abs(lam) < TOL
        x = np.where(mer, 0.0, x)
        y = np.where(mer, np.pi * np.where(phi < 0, -bt, bt) / (1.0 + ct), y)
    return x, y


def vandg4_fwd(lam, phi):
    """vandg4.cpp (fwd only)."""
    TOL = 1e-10
    with np.errstate(invalid="ignore", divide="ignore"):
        bt = np.abs(2.0 / np.pi * phi)
        bt2 = bt * bt
        ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / (bt2 * (bt - 1.0))
        ct2 = ct * ct
        dt = 2.0 / np.pi * lam
        dt = dt + 1.0 / dt
        dt = np.sqrt(np.clip(dt * dt - 4.0, 0.0, None))
        dt = np.where((np.abs(lam) - HALFPI) < 0.0, -dt, dt)
        dt2 = dt * dt
        x1 = (bt + ct) ** 2
        t = bt + 3.0 * ct
        ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
            bt2 * (t * t + 4.0 * ct2) + ct2 * (12.0 * bt * ct + 4.0 * ct2))
        x1 = (dt * (x1 + ct2 - 1.0)
              + 2.0 * np.sqrt(np.clip(ft, 0.0, None))) / (4.0 * x1 + dt2)
        x = HALFPI * x1
        y = HALFPI * np.sqrt(np.clip(
            1.0 + dt * np.abs(x1) - x1 * x1, 0.0, None))
        x = np.where(lam < 0.0, -x, x)
        y = np.where(phi < 0.0, -y, y)
    eq = np.abs(phi) < TOL
    mer = (np.abs(lam) < TOL) | (np.abs(np.abs(phi) - HALFPI) < TOL)
    x = np.where(eq, lam, np.where(mer, 0.0, x))
    y = np.where(eq, 0.0, np.where(mer, phi, y))
    return x, y


@dataclass(frozen=True)
class TpeqdConsts:
    cp1: float
    sp1: float
    cp2: float
    sp2: float
    dlam2: float
    cs: float
    sc: float
    ccs: float
    z02: float
    hz0: float
    thz0: float
    rhshz0: float
    r2z0: float
    ca: float
    sa: float
    lp: float
    lamc: float
    lam0: float  # adopted by proj.py


def tpeqd_setup(params: dict) -> TpeqdConsts:
    """tpeqd.cpp setup (two-point equidistant)."""
    from .common import adjlon

    p1 = np.radians(float(params.get("lat_1", 0.0)))
    l1 = np.radians(float(params.get("lon_1", 0.0)))
    p2 = np.radians(float(params.get("lat_2", 0.0)))
    l2 = np.radians(float(params.get("lon_2", 0.0)))
    if p1 == p2 and l1 == l2:
        raise ValueError("tpeqd: the 2 points should be distinct")
    lam0 = float(adjlon(np.array([0.5 * (l1 + l2)]))[0])
    dlam2 = float(adjlon(np.array([l2 - l1]))[0])
    cp1, cp2 = np.cos(p1), np.cos(p2)
    sp1, sp2 = np.sin(p1), np.sin(p2)
    cs = cp1 * sp2
    sc = sp1 * cp2
    ccs = cp1 * cp2 * np.sin(dlam2)
    csm = cs - sc * np.cos(dlam2)
    z02 = np.arctan2(np.hypot(cp2 * np.sin(dlam2), csm),
                     sp1 * sp2 + cp1 * cp2 * np.cos(dlam2))
    if z02 == 0.0:
        raise ValueError("tpeqd: |lat_1|, |lat_2| should be < 90")
    hz0 = 0.5 * z02
    A12 = np.arctan2(cp2 * np.sin(dlam2), csm)
    pp = np.arcsin(np.clip(cp1 * np.sin(A12), -1, 1))
    lp = float(adjlon(np.array(
        [np.arctan2(cp1 * np.cos(A12), sp1) - hz0]))[0])
    lamc = HALFPI - np.arctan2(np.sin(A12) * sp1, np.cos(A12)) - dlam2 * 0.5
    return TpeqdConsts(cp1=float(cp1), sp1=float(sp1), cp2=float(cp2),
                       sp2=float(sp2), dlam2=float(dlam2 * 0.5),
                       cs=float(cs), sc=float(sc), ccs=float(ccs),
                       z02=float(z02 * z02), hz0=float(hz0),
                       thz0=float(np.tan(hz0)),
                       rhshz0=float(0.5 / np.sin(hz0)),
                       r2z0=float(0.5 / z02), ca=float(np.cos(pp)),
                       sa=float(np.sin(pp)), lp=lp, lamc=float(lamc),
                       lam0=lam0)


def tpeqd_fwd(lam, phi, C: TpeqdConsts):
    """tpeqd.cpp s_forward."""
    sp = np.sin(phi)
    cp = np.cos(phi)
    dl1 = lam + C.dlam2
    dl2 = lam - C.dlam2
    z1 = np.arccos(np.clip(C.sp1 * sp + C.cp1 * cp * np.cos(dl1), -1, 1))
    z2 = np.arccos(np.clip(C.sp2 * sp + C.cp2 * cp * np.cos(dl2), -1, 1))
    z1 = z1 * z1
    z2 = z2 * z2
    t = z1 - z2
    x = C.r2z0 * t
    t = C.z02 - t
    y = C.r2z0 * np.sqrt(np.clip(4.0 * C.z02 * z2 - t * t, 0.0, None))
    neg = (C.ccs * sp - cp * (C.cs * np.sin(dl1)
                              - C.sc * np.sin(dl2))) < 0.0
    return x, np.where(neg, -y, y)


def tpeqd_inv(x, y, C: TpeqdConsts):
    """tpeqd.cpp s_inverse."""
    cz1 = np.cos(np.hypot(y, x + C.hz0))
    cz2 = np.cos(np.hypot(y, x - C.hz0))
    s = cz1 + cz2
    d = cz1 - cz2
    lam = -np.arctan2(d, s * C.thz0)
    phi = np.arccos(np.clip(np.hypot(C.thz0 * s, d) * C.rhshz0, -1, 1))
    phi = np.where(y < 0.0, -phi, phi)
    sp = np.sin(phi)
    cp = np.cos(phi)
    lam = lam - C.lp
    sc = np.cos(lam)
    phi_out = np.arcsin(np.clip(C.sa * sp + C.ca * cp * sc, -1, 1))
    lam_out = np.arctan2(cp * np.sin(lam),
                         C.sa * cp * sc - C.ca * sp) + C.lamc
    return lam_out, phi_out


@dataclass(frozen=True)
class AiryConsts:
    mode: str
    Cb: float
    sinph0: float
    cosph0: float
    p_halfpi: float
    no_cut: bool


def airy_setup(params: dict, phi0: float) -> AiryConsts:
    """airy.cpp setup."""
    beta = 0.5 * (HALFPI - np.radians(float(params.get("lat_b", 0.0))))
    if abs(beta) < EPS10:
        Cb = -0.5
    else:
        Cb = 1.0 / np.tan(beta)
        Cb = Cb * Cb * np.log(np.cos(beta))
    if abs(abs(phi0) - HALFPI) < EPS10:
        mode = "s_pole" if phi0 < 0 else "n_pole"
        p_halfpi = -HALFPI if phi0 < 0 else HALFPI
    elif abs(phi0) < EPS10:
        mode, p_halfpi = "equit", 0.0
    else:
        mode, p_halfpi = "obliq", 0.0
    return AiryConsts(mode=mode, Cb=float(Cb), sinph0=float(np.sin(phi0)),
                      cosph0=float(np.cos(phi0)), p_halfpi=p_halfpi,
                      no_cut="no_cut" in params)


def airy_fwd(lam, phi, C: AiryConsts):
    """airy.cpp s_forward (fwd only in the reference)."""
    sinlam = np.sin(lam)
    coslam = np.cos(lam)
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.mode in ("equit", "obliq"):
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            cosz = cosphi * coslam
            if C.mode == "obliq":
                cosz = C.sinph0 * sinphi + C.cosph0 * cosz
            bad = (~C.no_cut) & (cosz < -EPS10)
            s = 1.0 - cosz
            t = 0.5 * (1.0 + cosz)
            Krho = np.where(np.abs(s) > EPS10,
                            -np.log(t) / s - C.Cb / t, 0.5 - C.Cb)
            x = Krho * cosphi * sinlam
            if C.mode == "obliq":
                y = Krho * (C.cosph0 * sinphi
                            - C.sinph0 * cosphi * coslam)
            else:
                y = Krho * sinphi
        else:
            ph = np.abs(C.p_halfpi - phi)
            bad = (~C.no_cut) & ((ph - EPS10) > HALFPI)
            ph = ph * 0.5
            t = np.tan(ph)
            Krho = -2.0 * (np.log(np.cos(ph)) / t + t * C.Cb)
            x = Krho * sinlam
            y = Krho * coslam
            if C.mode == "n_pole":
                y = -y
            small = ph <= EPS10
            x = np.where(small, 0.0, x)
            y = np.where(small, 0.0, y)
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


# --- batch 3: Putnins family, McBryde-Thomas family, oea ---------------

def putp2_fwd(lam, phi):
    """putp2.cpp: Newton for phi' then x = C_x λ (cosφ' − ½)."""
    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784
    PI3 = 1.0471975511965977
    p = C_p * np.sin(phi)
    p2 = phi * phi
    ph = phi * (0.615709 + p2 * (0.00909953 + p2 * 0.0046292))
    for _ in range(10):
        c = np.cos(ph)
        s = np.sin(ph)
        V = (ph + s * (c - 1.0) - p) / (1.0 + c * (c - 1.0) - s * s)
        ph = ph - V
        if np.all(np.abs(V) < EPS10):
            break
    ph = np.where(np.abs(ph) > PI3, np.sign(ph) * PI3, ph)
    return C_x * lam * (np.cos(ph) - 0.5), C_y * np.sin(ph)


def putp2_inv(x, y):
    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784
    ph = np.arcsin(np.clip(y / C_y, -1.0, 1.0))
    c = np.cos(ph)
    lam = x / (C_x * (c - 0.5))
    phi = np.arcsin(np.clip((ph + np.sin(ph) * (c - 1.0)) / C_p, -1.0, 1.0))
    return lam, phi


def putp3_fwd(lam, phi, A):
    """putp3.cpp (putp3: A=4/pi^2*..., putp3p: half)."""
    C = 0.79788456
    return C * lam * (1.0 - A * phi * phi), C * phi


def putp3_inv(x, y, A):
    C = 0.79788456
    phi = y / C
    return x / (C * (1.0 - A * phi * phi)), phi


def putp4p_fwd(lam, phi, C_x, C_y):
    """putp4p.cpp (putp4p / weren share the kernel)."""
    ph = np.arcsin(np.clip(0.883883476 * np.sin(phi), -1.0, 1.0))
    ph3 = ph / 3.0
    return C_x * lam * np.cos(ph) / np.cos(ph3), C_y * np.sin(ph3)


def putp4p_inv(x, y, C_x, C_y):
    ph3 = np.arcsin(np.clip(y / C_y, -1.0, 1.0))
    ph = ph3 * 3.0
    lam = x * np.cos(ph3) / (C_x * np.cos(ph))
    phi = np.arcsin(np.clip(1.13137085 * np.sin(ph), -1.0, 1.0))
    return lam, phi


def putp5_fwd(lam, phi, A, B):
    """putp5.cpp (putp5: A=2,B=1; putp5p: A=1.5,B=.5)."""
    C, D = 1.01346, 1.2158542
    return C * lam * (A - B * np.sqrt(1.0 + D * phi * phi)), C * phi


def putp5_inv(x, y, A, B):
    C, D = 1.01346, 1.2158542
    phi = y / C
    return x / (C * (A - B * np.sqrt(1.0 + D * phi * phi))), phi


def putp6_fwd(lam, phi, C_x, C_y, A, B, D):
    """putp6.cpp Newton."""
    CON_POLE = 1.732050807568877
    p = B * np.sin(phi)
    ph = phi * 1.10265779  # reference seed: phi *= 1.10265779
    for _ in range(10):
        r = np.sqrt(1.0 + ph * ph)
        V = ((A - r) * ph - np.log(ph + r) - p) / (A - 2.0 * r)
        ph = ph - V
        if np.all(np.abs(V) < EPS10):
            break
    ph = np.where(np.abs(V) >= EPS10,
                  np.where(p < 0.0, -CON_POLE, CON_POLE), ph)
    r = np.sqrt(1.0 + ph * ph)
    return C_x * lam * (D - r), C_y * ph


def putp6_inv(x, y, C_x, C_y, A, B, D):
    ph = y / C_y
    r = np.sqrt(1.0 + ph * ph)
    lam = x / (C_x * (D - r))
    phi = np.arcsin(np.clip(((A - r) * ph - np.log(ph + r)) / B, -1.0, 1.0))
    return lam, phi


def mbt_fps_fwd(lam, phi):
    """mbt_fps.cpp Newton."""
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C_x, C_y = 0.22248, 1.44492
    C1_2 = 0.33333333333333333333333333
    k = C3 * np.sin(phi)
    ph = phi.copy()
    for _ in range(10):
        t = ph / C2
        V = (C1 * np.sin(t) + np.sin(ph) - k) / (C1_2 * np.cos(t)
                                                 + np.cos(ph))
        ph = ph - V
        if np.all(np.abs(V) < 1e-7):
            break
    t = ph / C2
    return C_x * lam * (1.0 + 3.0 * np.cos(ph) / np.cos(t)), C_y * np.sin(t)


def mbt_fps_inv(x, y):
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C_x, C_y = 0.22248, 1.44492
    t = np.arcsin(np.clip(y / C_y, -1.0, 1.0))
    ph = C2 * t
    lam = x / (C_x * (1.0 + 3.0 * np.cos(ph) / np.cos(t)))
    phi = np.arcsin(np.clip((C1 * np.sin(t) + np.sin(ph)) / C3, -1.0, 1.0))
    return lam, phi


def mbtfpp_fwd(lam, phi):
    """mbtfpp.cpp."""
    CSy, FXC, FYC = 0.95257934441568037152, 0.92582009977255146156, \
        3.40168025708304504493
    C23, C13 = 2.0 / 3.0, 1.0 / 3.0
    ph = np.arcsin(np.clip(CSy * np.sin(phi), -1.0, 1.0))
    return FXC * lam * (2.0 * np.cos(C23 * ph) - 1.0), FYC * np.sin(C13 * ph)


def mbtfpp_inv(x, y):
    CSy, FXC, FYC = 0.95257934441568037152, 0.92582009977255146156, \
        3.40168025708304504493
    C23, C13 = 2.0 / 3.0, 1.0 / 3.0
    ph = np.arcsin(np.clip(y / FYC, -1.0, 1.0)) / C13
    lam = x / (FXC * (2.0 * np.cos(C23 * ph) - 1.0))
    phi = np.arcsin(np.clip(np.sin(ph) / CSy, -1.0, 1.0))
    return lam, phi


def mbtfpq_fwd(lam, phi):
    """mbtfpq.cpp Newton: C θ + sin θ... (quartic)."""
    C, FYC, FXC = 1.70710678118654752440, 1.87475828462269495505, \
        0.31245971410378249250
    c = C * np.sin(phi)
    th = phi.copy()
    for _ in range(20):
        V = (np.sin(0.5 * th) + np.sin(th) - c) \
            / (0.5 * np.cos(0.5 * th) + np.cos(th))
        th = th - V
        if np.all(np.abs(V) < 1e-7):
            break
    return (FXC * lam * (1.0 + 2.0 * np.cos(th) / np.cos(0.5 * th)),
            FYC * np.sin(0.5 * th))


def mbtfpq_inv(x, y):
    C, RC = 1.70710678118654752440, 0.58578643762690495119
    RYC, RXC = 0.53340209679417701685, 3.20041258076506210122
    th = 2.0 * np.arcsin(np.clip(RYC * y, -1.0, 1.0))
    lam = RXC * x / (1.0 + 2.0 * np.cos(th) / np.cos(0.5 * th))
    t = np.sin(0.5 * th)
    phi = np.arcsin(np.clip(RC * (t + np.sin(th)), -1.0, 1.0))
    return lam, phi


@dataclass(frozen=True)
class OeaConsts:
    n: float
    m: float
    theta: float
    sp0: float
    cp0: float
    rn: float
    rm: float
    two_r_n: float
    two_r_m: float
    hn: float
    hm: float


def oea_setup(params: dict, phi0: float) -> OeaConsts:
    """oea.cpp (oblated equal area): +n, +m, +theta."""
    n = float(params.get("n", 0.0))
    m = float(params.get("m", 0.0))
    if n <= 0.0 or m <= 0.0:
        raise ValueError("oea: n and m should be > 0")
    theta = np.radians(float(params.get("theta", 0.0)))
    return OeaConsts(n=n, m=m, theta=float(theta),
                     sp0=float(np.sin(phi0)), cp0=float(np.cos(phi0)),
                     rn=1.0 / n, rm=1.0 / m, two_r_n=2.0 / n,
                     two_r_m=2.0 / m, hn=0.5 * n, hm=0.5 * m)


def oea_fwd(lam, phi, C: OeaConsts):
    """oea.cpp s_forward."""
    cp = np.cos(phi)
    sp = np.sin(phi)
    cl = np.cos(lam)
    Az = np.arctan2(cp * np.sin(lam),
                    C.cp0 * sp - C.sp0 * cp * cl) + C.theta
    shz = np.sin(0.5 * np.arccos(np.clip(C.sp0 * sp + C.cp0 * cp * cl,
                                         -1, 1)))
    M = np.arcsin(np.clip(shz * np.sin(Az), -1, 1))
    N = np.arcsin(np.clip(shz * np.cos(Az) * np.cos(M)
                          / np.cos(M * C.two_r_m), -1, 1))
    y = C.n * np.sin(N * C.two_r_n)
    x = C.m * np.sin(M * C.two_r_m) * np.cos(N) / np.cos(N * C.two_r_n)
    return x, y


def oea_inv(x, y, C: OeaConsts):
    """oea.cpp s_inverse."""
    N = C.hn * np.arcsin(np.clip(y * C.rn, -1, 1))
    M = C.hm * np.arcsin(np.clip(x * C.rm * np.cos(N * C.two_r_n)
                                 / np.cos(N), -1, 1))
    xp = 2.0 * np.sin(M)
    yp = 2.0 * np.sin(N) * np.cos(M * C.two_r_m) / np.cos(M)
    Az = np.arctan2(xp, yp) - C.theta
    cAz = np.cos(Az)
    z = 2.0 * np.arcsin(np.clip(0.5 * np.hypot(xp, yp), -1, 1))
    sz = np.sin(z)
    cz = np.cos(z)
    phi = np.arcsin(np.clip(C.sp0 * cz + C.cp0 * sz * cAz, -1, 1))
    lam = np.arctan2(sz * np.sin(Az), C.cp0 * cz - C.sp0 * sz * cAz)
    return lam, phi


# --- Adams / Guyou / Peirce quincuncial family (adams.cpp) -------------

_RSQRT2 = 0.7071067811865475244008443620
_PEIRCE_SHD = 1.8540746773013719 * 2.0


def _ell_int_5(phi):
    """Incomplete elliptic integral F(phi, m=0.5) via the reference's
    Chebyshev-style recurrence (adams.cpp:45-66)."""
    C0 = 2.19174570831038
    C = (-8.58691003636495e-07, 2.02692115653689e-07,
         3.12960480765314e-05, 5.30394739921063e-05,
         -0.0012804644680613, -0.00575574836830288, 0.0914203033408211)
    y = phi * (2.0 / np.pi)
    y = 2.0 * y * y - 1.0
    y2 = 2.0 * y
    d1 = np.zeros_like(phi)
    d2 = np.zeros_like(phi)
    for c in C:
        d1, d2 = y2 * d1 - d2 + c, d1
    return phi * (y * d1 - d2 + 0.5 * C0)


def adams_fwd(lam, phi, mode: str, pqshape: str = "diamond",
              scrollx: float = 0.0, scrolly: float = 0.0):
    """adams.cpp:68-250, vectorized: a/b angles per mode, the elliptic
    integral, and the Peirce fold/rotate/scroll plumbing."""
    TOL = 1e-9
    with np.errstate(invalid="ignore", divide="ignore"):
        bad = np.zeros(lam.shape, dtype=bool)
        if mode == "guyou":
            bad |= (np.abs(lam) - TOL) > HALFPI
            sl = np.sin(lam)
            sp = np.sin(phi)
            cp = np.cos(phi)
            a = np.arccos(np.clip((cp * sl - sp) * _RSQRT2, -1, 1))
            b = np.arccos(np.clip((cp * sl + sp) * _RSQRT2, -1, 1))
            sm = lam < 0.0
            sn = phi < 0.0
        elif mode == "peirce_q":
            if pqshape == "nhemisphere":
                bad |= phi < -TOL
            if pqshape == "shemisphere":
                bad |= phi > -TOL
            sl = np.sin(lam)
            cl = np.cos(lam)
            cp = np.cos(phi)
            a = np.arccos(np.clip(cp * (sl + cl) * _RSQRT2, -1, 1))
            b = np.arccos(np.clip(cp * (sl - cl) * _RSQRT2, -1, 1))
            sm = sl < 0.0
            sn = cl > 0.0
        elif mode == "adams_hemi":
            sp = np.sin(phi)
            bad |= (np.abs(lam) - TOL) > HALFPI
            av = np.cos(phi) * np.sin(lam)
            sm = (sp + av) < 0.0
            sn = (sp - av) < 0.0
            a = np.arccos(np.clip(av, -1, 1))
            b = HALFPI - phi
        elif mode == "adams_ws1":
            sp = np.tan(0.5 * phi)
            bv = np.cos(np.arcsin(np.clip(sp, -1, 1))) * np.sin(0.5 * lam)
            a = np.arccos(np.clip((bv - sp) * _RSQRT2, -1, 1))
            b = np.arccos(np.clip((bv + sp) * _RSQRT2, -1, 1))
            sm = lam < 0.0
            sn = phi < 0.0
        else:  # adams_ws2
            spp = np.tan(0.5 * phi)
            av = np.cos(np.arcsin(np.clip(spp, -1, 1))) * np.sin(0.5 * lam)
            sm = (spp + av) < 0.0
            sn = (spp - av) < 0.0
            b = np.arccos(np.clip(spp, -1, 1))
            a = np.arccos(np.clip(av, -1, 1))
        m = np.arcsin(np.clip(np.sqrt(np.clip(
            1.0 + np.minimum(0.0, np.cos(a + b)), 0, None)), -1, 1))
        m = np.where(sm, -m, m)
        n = np.arcsin(np.clip(np.sqrt(np.abs(
            1.0 - np.maximum(0.0, np.cos(a - b)))), -1, 1))
        n = np.where(sn, -n, n)
        x = _ell_int_5(m)
        y = _ell_int_5(n)
        if mode == "guyou":
            pole = np.abs(np.abs(phi) - HALFPI) < TOL
            x = np.where(pole, 0.0, x)
            y = np.where(pole, np.where(phi < 0, -1.85407, 1.85407), y)
        if mode == "peirce_q":
            shd = _PEIRCE_SHD
            if pqshape in ("square", "diamond"):
                south = phi < 0.0
                seg1 = south & (lam < -0.75 * np.pi)
                seg2 = south & (lam >= -0.75 * np.pi) & (lam < -0.25 * np.pi)
                seg3 = south & (lam >= -0.25 * np.pi) & (lam < 0.25 * np.pi)
                seg4 = south & (lam >= 0.25 * np.pi) & (lam < 0.75 * np.pi)
                seg5 = south & (lam >= 0.75 * np.pi)
                y = np.where(seg1 | seg5, shd - y, y)
                x = np.where(seg2, -shd - x, x)
                y = np.where(seg3, -shd - y, y)
                x = np.where(seg4, shd - x, x)
            if pqshape == "square":
                x, y = _RSQRT2 * (x - y), _RSQRT2 * (x + y)
            if pqshape == "horizontal":
                x = np.where(phi < 0.0, shd - x, x)
                x = x - shd / 2.0
                if scrollx != 0.0:
                    xt = shd / 2.0 * 2.0
                    x = x + scrollx * (xt * 2.0)
                    x = np.where(x >= xt, x - shd * 2.0,
                                 np.where(x < -xt, x + shd * 2.0, x))
            if pqshape == "vertical":
                y = np.where(phi < 0.0, shd - y, y)
                y = y - shd / 2.0
                if scrolly != 0.0:
                    yt = shd / 2.0 * 2.0
                    y = y + scrolly * (yt * 2.0)
                    y = np.where(y >= yt, y - shd * 2.0,
                                 np.where(y < -yt, y + shd * 2.0, y))
        if mode in ("adams_hemi", "adams_ws2"):
            x, y = _RSQRT2 * (x - y), _RSQRT2 * (x + y)
    x = np.where(bad, np.nan, x)
    y = np.where(bad, np.nan, y)
    return x, y


# ----------------------------------------------- chamb (trimetric)

def _chamb_vect(dphi, c1, s1, c2, s2, dlam):
    """chamb.cpp vect(): great-circle (r, Az) with the small-distance
    haversine branch."""
    cdl = np.cos(dlam)
    big = (np.abs(dphi) > 1.0) | (np.abs(dlam) > 1.0)
    dp = np.sin(0.5 * dphi)
    dl = np.sin(0.5 * dlam)
    r_small = 2.0 * np.arcsin(np.clip(
        np.sqrt(dp * dp + c1 * c2 * dl * dl), -1, 1))
    r_big = np.arccos(np.clip(s1 * s2 + c1 * c2 * cdl, -1, 1))
    r = np.where(big, r_big, r_small)
    Az = np.where(np.abs(r) > 1e-9,
                  np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl),
                  0.0)
    r = np.where(np.abs(r) > 1e-9, r, 0.0)
    return r, Az


def _chamb_lc(b, c, a):
    return np.arccos(np.clip(0.5 * (b * b + c * c - a * a) / (b * c),
                             -1.0, 1.0))


@dataclass(frozen=True)
class ChambConsts:
    c_phi: tuple
    c_lam: tuple
    c_cos: tuple
    c_sin: tuple
    cv_r: tuple
    cv_Az: tuple
    cp_x: tuple
    cp_y: tuple
    p_x: float
    p_y: float
    beta_1: float
    beta_2: float


def chamb_setup(params: dict, lam0: float) -> ChambConsts:
    """chamb.cpp:92-135."""
    from .common import adjlon

    phis, lams, coss, sins = [], [], [], []
    for i in (1, 2, 3):
        phi = np.radians(float(params.get(f"lat_{i}", 0.0)))
        lam = np.radians(float(params.get(f"lon_{i}", 0.0)))
        lam = float(adjlon(np.array([lam - lam0]))[0])
        phis.append(phi)
        lams.append(lam)
        coss.append(float(np.cos(phi)))
        sins.append(float(np.sin(phi)))
    rs, azs = [], []
    for i in range(3):
        j = 0 if i == 2 else i + 1
        r, Az = _chamb_vect(np.array([phis[j] - phis[i]]), coss[i], sins[i],
                            coss[j], sins[j], np.array([lams[j] - lams[i]]))
        if r[0] == 0.0:
            raise ValueError("chamb: control points should be distinct")
        rs.append(float(r[0]))
        azs.append(float(Az[0]))
    beta_0 = float(_chamb_lc(rs[0], rs[2], rs[1]))
    beta_1 = float(_chamb_lc(rs[0], rs[1], rs[2]))
    beta_2 = np.pi - beta_0
    cp_y = [rs[2] * np.sin(beta_0)] * 2 + [0.0]
    p_y = 2.0 * cp_y[0]
    cp_x = [-0.5 * rs[0], 0.5 * rs[0], 0.0]
    cp_x[2] = cp_x[0] + rs[2] * np.cos(beta_0)
    p_x = cp_x[2]
    return ChambConsts(c_phi=tuple(phis), c_lam=tuple(lams),
                       c_cos=tuple(coss), c_sin=tuple(sins),
                       cv_r=tuple(rs), cv_Az=tuple(azs),
                       cp_x=tuple(float(v) for v in cp_x),
                       cp_y=tuple(float(v) for v in cp_y),
                       p_x=float(p_x), p_y=float(p_y),
                       beta_1=float(beta_1), beta_2=float(beta_2))


def chamb_fwd(lam, phi, C: ChambConsts):
    """chamb.cpp:46-90 (fwd only in the reference)."""
    from .common import adjlon

    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    v_r, v_az = [], []
    at_cp = np.full(lam.shape, -1, dtype=np.int64)
    for i in range(3):
        r, Az = _chamb_vect(phi - C.c_phi[i], C.c_cos[i], C.c_sin[i],
                            cosphi, sinphi, lam - C.c_lam[i])
        at_cp = np.where((at_cp < 0) & (r == 0.0), i, at_cp)
        Az = adjlon(Az - C.cv_Az[i])
        v_r.append(r)
        v_az.append(Az)
    x = np.full_like(lam, C.p_x)
    y = np.full_like(lam, C.p_y)
    for i in range(3):
        j = 0 if i == 2 else i + 1
        a = _chamb_lc(C.cv_r[i], v_r[i], v_r[j])
        a = np.where(v_az[i] < 0.0, -a, a)
        if i == 0:
            x = x + v_r[i] * np.cos(a)
            y = y - v_r[i] * np.sin(a)
        elif i == 1:
            a = C.beta_1 - a
            x = x - v_r[i] * np.cos(a)
            y = y - v_r[i] * np.sin(a)
        else:
            a = C.beta_2 - a
            x = x + v_r[i] * np.cos(a)
            y = y + v_r[i] * np.sin(a)
    x = x / 3.0
    y = y / 3.0
    for i in range(3):
        hit = at_cp == i
        x = np.where(hit, C.cp_x[i], x)
        y = np.where(hit, C.cp_y[i], y)
    return x, y


# -------------------------------------------------------- bertin1953

def bertin1953_fwd(lam, phi):
    """Bertin 1953 (bertin1953.cpp, fwd only): fixed oblique rotation
    about lat_0=-42 with the -16.5 deg shift, warped Hammer(1.68,2)."""
    from .common import adjlon

    fu, k, w = 1.4, 12.0, 1.68
    cdp, sdp = np.cos(np.radians(-42.0)), np.sin(np.radians(-42.0))
    lam = lam + np.radians(-16.5)
    cosphi = np.cos(phi)
    x = np.cos(lam) * cosphi
    y = np.sin(lam) * cosphi
    z = np.sin(phi)
    z0 = z * cdp + x * sdp
    lam = np.arctan2(y, x * cdp - z * sdp)
    phi = np.arcsin(np.clip(z0, -1.0, 1.0))
    lam = adjlon(lam)
    cond = lam + phi < -fu
    d = (lam - phi + 1.6) * (lam + phi + fu) / 8.0
    lam = np.where(cond, lam + d, lam)
    phi = np.where(cond, phi - 0.8 * d * np.sin(phi + np.pi / 2.0), phi)
    cosphi = np.cos(phi)
    d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lam / 2.0)))
    xx = w * d * cosphi * np.sin(lam / 2.0)
    yy = d * np.sin(phi)
    d = (1.0 - np.cos(lam * phi)) / k
    xx = np.where(yy < 0.0, xx * (1.0 + d), xx)
    yy = np.where(yy > 0.0, yy * (1.0 + d / 1.5 * xx * xx), yy)
    return xx, yy


_ELL5_HALFPI = 1.854074716833181  # _ell_int_5(pi/2): the CHEBYSHEV
# approximation's own endpoint (4e-8 above the true F(pi/2, m=0.5) =
# 1.8540746773013719) — clipping to the true value would truncate
# in-domain endpoint preimages


def _ell_int_5_inv(u):
    """Invert the monotone odd elliptic integral _ell_int_5 on
    [-pi/2, pi/2] by Newton with the true integrand derivative
    dF/dt = 1/sqrt(1 - sin^2(t)/2); converges to the root of the
    SAME Chebyshev approximation the forward uses, so fwd(inv) is
    machine-exact."""
    u = np.clip(u, -_ELL5_HALFPI, _ELL5_HALFPI)
    t = u * (HALFPI / _ELL5_HALFPI)  # proportional seed
    for _ in range(6):
        g = _ell_int_5(t) - u
        t = np.clip(t - g * np.sqrt(1.0 - 0.5 * np.sin(t) ** 2),
                    -HALFPI, HALFPI)
    # the true-integrand derivative differs from the Chebyshev
    # approximation by ~1e-7, leaving a fixed-point offset; polish
    # with a central-difference derivative OF the approximation so the
    # root is the approximation's own (fwd/inv then cancel exactly)
    h = 1e-6
    for _ in range(3):
        g = _ell_int_5(t) - u
        dg = (_ell_int_5(t + h) - _ell_int_5(t - h)) / (2.0 * h)
        t = np.clip(t - g / np.maximum(dg, 0.5), -HALFPI, HALFPI)
    return t


def adams_ws2_inv(x, y):
    """ANALYTIC inverse of Adams World in a Square II (the reference
    uses a seeded 2D Newton, adams.cpp:296-317, which cannot converge
    near the lam=+-pi seam where d(x)/d(a+b) is singular — its own
    corpus comments one corner out as platform-dependent).

    Derivation from the forward (adams.cpp:183-201): with
    b = acos(spp), a = acos(A), the elliptic-integral arguments obey
    cos(a+b) = -cos^2(m) and cos(a-b) = cos^2(n) (the min/max guards
    never bind in-domain because A^2 <= 1-spp^2), and the fold signs
    pin the branches: a+b > pi  <=>  spp+A < 0  <=>  m < 0, and
    a-b < 0  <=>  spp-A < 0  <=>  n < 0.  So m,n from inverting the
    1-D integral give a,b, hence spp = cos b -> phi and
    sin(lam/2) = cos a / sqrt(1-spp^2) -> lam."""
    with np.errstate(invalid="ignore", divide="ignore"):
        u = _RSQRT2 * (x + y)   # undo the final 45-degree rotation
        v = _RSQRT2 * (y - x)
        m = _ell_int_5_inv(u)
        n = _ell_int_5_inv(v)
        cm = np.cos(m)
        cn = np.cos(n)
        s = np.arccos(np.clip(-cm * cm, -1.0, 1.0))   # principal a+b
        s = np.where(m < 0.0, 2.0 * np.pi - s, s)
        d = np.arccos(np.clip(cn * cn, -1.0, 1.0))    # principal a-b
        d = np.where(n < 0.0, -d, d)
        a = 0.5 * (s + d)
        b = 0.5 * (s - d)
        spp = np.cos(b)
        A = np.cos(a)
        phi = 2.0 * np.arctan(spp)
        csp = np.sqrt(np.maximum(1.0 - spp * spp, 0.0))
        sinhalf = np.where(csp > 1e-12, A / np.where(csp > 1e-12, csp, 1.0),
                           0.0)
        lam = 2.0 * np.arcsin(np.clip(sinhalf, -1.0, 1.0))
    bad = ~(np.isfinite(x) & np.isfinite(y))
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


def _peirce_mn_to_lp(u, v, south):
    """Shared analytic core for the Peirce quincuncial inverse: from
    pre-fold elliptic coordinates (u, v) recover (lam, phi) on the
    requested hemisphere.  Same branch algebra as adams_ws2_inv but
    with cos a = cp*sin(lam+pi/4), cos b = cp*sin(lam-pi/4)
    (adams.cpp:155-161), so lam = atan2(ca+cb, ca-cb) and
    cp = hypot(...)."""
    m = _ell_int_5_inv(u)
    n = _ell_int_5_inv(v)
    cm = np.cos(m)
    cn = np.cos(n)
    s = np.arccos(np.clip(-cm * cm, -1.0, 1.0))
    s = np.where(m < 0.0, 2.0 * np.pi - s, s)
    d = np.arccos(np.clip(cn * cn, -1.0, 1.0))
    d = np.where(n < 0.0, -d, d)
    a = 0.5 * (s + d)
    b = 0.5 * (s - d)
    ca = np.cos(a)
    cb = np.cos(b)
    cpsl = (ca + cb) / np.sqrt(2.0)
    cpcl = (ca - cb) / np.sqrt(2.0)
    lam = np.arctan2(cpsl, cpcl)
    cp = np.clip(np.hypot(cpsl, cpcl), -1.0, 1.0)
    phi = np.arccos(cp)
    return lam, np.where(south, -phi, phi)


def peirce_q_inv(x, y, pqshape: str):
    """ANALYTIC inverse of the Peirce quincuncial square/diamond
    shapes (the reference uses per-quadrant seed heuristics + 2D
    Newton, adams.cpp:319-385, which diverges at the fold seams /
    square vertices).  Tries the identity (northern-hemisphere)
    unfolding plus the five southern quincunx segment reflections
    (adams.cpp:214-231), reconstructs (lam, phi) analytically for
    each, and keeps the candidate whose forward best reproduces the
    input — exact at seams where Newton cannot converge."""
    shd = _PEIRCE_SHD
    with np.errstate(invalid="ignore", divide="ignore"):
        if pqshape == "square":   # undo the 45-degree rotation
            uf = _RSQRT2 * (x + y)
            vf = _RSQRT2 * (y - x)
        else:                     # diamond
            uf, vf = np.asarray(x, float), np.asarray(y, float)
        best_l = np.full_like(uf, np.nan)
        best_p = np.full_like(uf, np.nan)
        best_r = np.full_like(uf, np.inf)
        # (unfold_u, unfold_v, south, lam_range) — the range is each
        # fold segment's half-open lam interval (adams.cpp:214-231);
        # the reconstructed lam is clamped into it so the verifying
        # forward applies THIS candidate's fold (an FP hair across the
        # boundary would fold differently), and so the pole's
        # arbitrary atan2(0,0) lands in-segment
        eps = 1e-12
        q = np.pi / 4.0
        candidates = (
            (uf, vf, False, None),                       # north, no fold
            (uf, shd - vf, True, "top"),                 # |lam| >= 3pi/4
            (-shd - uf, vf, True, (-3 * q, -q - eps)),   # left
            (uf, -shd - vf, True, (-q, q - eps)),        # bottom
            (shd - uf, vf, True, (q, 3 * q - eps)),      # right
        )
        for u, v, south, rng in candidates:
            inside = (np.abs(u) <= _ELL5_HALFPI + 1e-12) & \
                     (np.abs(v) <= _ELL5_HALFPI + 1e-12)
            lam, phi = _peirce_mn_to_lp(u, v, south)
            if rng == "top":  # disjoint: [-pi, -3pi/4) u [3pi/4, pi]
                lam = np.where(lam >= 0.0,
                               np.clip(lam, 3 * q, np.pi),
                               np.clip(lam, -np.pi, -3 * q - eps))
            elif rng is not None:
                lam = np.clip(lam, rng[0], rng[1])
            fx, fy = adams_fwd(lam, phi, "peirce_q", pqshape)
            r = np.hypot(fx - x, fy - y)
            better = inside & np.isfinite(r) & (r < best_r)
            best_l = np.where(better, lam, best_l)
            best_p = np.where(better, phi, best_p)
            best_r = np.where(better, r, best_r)
    # acceptance: the right candidate's xy residual is <= ~3e-4 even at
    # the square corners (where the conformal scale diverges and the
    # m,n reconstruction loses half its digits); wrong-fold candidates
    # are reflections >= 1.2 units away — 1e-3 separates them cleanly
    ok = best_r < 1e-3
    return (np.where(ok, best_l, np.nan), np.where(ok, best_p, np.nan))


# ----------------------------------------------------------- spilhaus

@dataclass(frozen=True)
class SpilhausConsts:
    cosalpha: float
    sinalpha: float
    beta: float
    lambda_0: float
    conformal_distortion: float
    cosrot: float
    sinrot: float
    e: float
    k0: float


def spilhaus_setup(params: dict, ell, k0: float, lam0: float,
                   phi0: float) -> tuple:
    """spilhaus.cpp setup; returns (consts, effective_lam0, phi0)."""
    if "lon_0" not in params:
        lam0 = np.radians(66.94970198)
    if "lat_0" not in params:
        phi0 = np.radians(-49.56371678)
    azimuth = np.radians(float(params.get("azi", 40.17823482)))
    rotation = np.radians(float(params.get("rot", 45.0)))
    e = ell.e
    clc = _conformal_lat(np.float64(phi0), e)
    sinalpha = -np.cos(clc) * np.cos(azimuth)
    cosalpha = np.sqrt(1.0 - sinalpha * sinalpha)
    lambda_0 = np.arctan2(np.tan(azimuth), -np.sin(clc))
    beta = np.pi + np.arctan2(-np.sin(azimuth), -np.tan(clc))
    cd = np.cos(phi0) / np.sqrt(1.0 - ell.es * np.sin(phi0) ** 2) \
        / np.cos(clc)
    C = SpilhausConsts(cosalpha=float(cosalpha), sinalpha=float(sinalpha),
                       beta=float(beta), lambda_0=float(lambda_0),
                       conformal_distortion=float(cd),
                       cosrot=float(np.cos(rotation)),
                       sinrot=float(np.sin(rotation)), e=e, k0=k0)
    return C, lam0, phi0


def _conformal_lat(phi, e):
    """pj_conformal_lat (src/latitudes.cpp:17-29)."""
    if e == 0.0:
        return phi
    es = e * np.sin(phi)
    return 2.0 * np.arctan(np.tan(FORTPI + phi / 2.0)
                           * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)) - HALFPI


def _conformal_lat_inverse(chi, e, threshold=1e-10, max_iter=10):
    """pj_conformal_lat_inverse (latitudes.cpp:30-52)."""
    if e == 0.0:
        return chi
    taninit = np.tan(np.pi / 4.0 + chi / 2.0)
    phi = chi.copy()
    for _ in range(max_iter):
        es = e * np.sin(phi)
        new_phi = 2.0 * np.arctan(
            taninit * ((1.0 + es) / (1.0 - es)) ** (e / 2.0)) - 0.5 * np.pi
        if np.all(np.abs(new_phi - phi) < threshold):
            phi = new_phi
            break
        phi = new_phi
    return phi


def spilhaus_fwd(lam, phi, C: SpilhausConsts):
    """spilhaus.cpp:20-45: conformal-sphere rotation (Snyder 5-7/5-8b)
    into adams_ws2, then the rotation/scale."""
    phi_c = _conformal_lat(phi, C.e)
    cphi = np.cos(phi_c)
    sphi = np.sin(phi_c)
    # lam is already lam0-relative (the Operation subtracts lam0)
    coslam = np.cos(lam - C.lambda_0)
    sinlam = np.sin(lam - C.lambda_0)
    pa = np.arcsin(np.clip(C.sinalpha * sphi - C.cosalpha * cphi * coslam,
                           -1, 1))
    la = C.beta + np.arctan2(
        cphi * sinlam, C.sinalpha * cphi * coslam + C.cosalpha * sphi)
    la = np.where(la > np.pi, la - 2 * np.pi, la)
    la = np.where(la < -np.pi, la + 2 * np.pi, la)
    xa, ya = adams_fwd(la, pa, "adams_ws2")
    factor = C.conformal_distortion * C.k0
    x = -(xa * C.cosrot + ya * C.sinrot) * factor
    y = -(-xa * C.sinrot + ya * C.cosrot) * factor
    return x, y


def spilhaus_inv(x, y, C: SpilhausConsts):
    """spilhaus.cpp:47-73."""
    factor = 1.0 / (C.conformal_distortion * C.k0)
    xa = -(x * C.cosrot - y * C.sinrot) * factor
    ya = -(x * C.sinrot + y * C.cosrot) * factor
    la, pa = adams_ws2_inv(xa, ya)
    cphi = np.cos(pa)
    sphi = np.sin(pa)
    coslam = np.cos(la - C.beta)
    sinlam = np.sin(la - C.beta)
    phi = np.arcsin(np.clip(C.sinalpha * sphi + C.cosalpha * cphi * coslam,
                            -1, 1))
    lam = C.lambda_0 + np.arctan2(
        cphi * sinlam, C.sinalpha * cphi * coslam - C.cosalpha * sphi)
    phi = _conformal_lat_inverse(phi, C.e)
    return lam, phi
