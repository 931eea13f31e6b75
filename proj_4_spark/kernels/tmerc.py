"""Transverse Mercator — Poder/Engsager (exact) and Evenden/Snyder (approx).

Vectorized NumPy re-derivation of /root/reference/src/projections/tmerc.cpp:
- Poder/Engsager 6th-order complex-Clenshaw series: setup :487-596,
  fwd :328-412, inv :415-485
- Evenden/Snyder truncated series: setup :228-242, fwd :71-116, inv :153-190
- spherical: fwd :118-151, inv :192-215
- AUTO hybrid thresholds: fwd :598-603, inv :605-615
- UTM parameter derivation: :737-779

Coordinates: (lam, phi) radians relative to the central meridian in,
(x, y) in units of the semimajor axis out ("classic" IO units).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .common import DEG_TO_RAD, HALFPI, clenS, clens, enfn, gatg, inv_mlfn, mlfn
from .ellipsoid import Ellipsoid

_ORDER = 6
_DOMAIN_CE = 2.623395162778  # 150 degrees, tmerc.cpp:404


@dataclass(frozen=True)
class PoderEngsager:
    Qn: float
    Zb: float
    cgb: tuple
    cbg: tuple
    utg: tuple
    gtu: tuple


@dataclass(frozen=True)
class EvendenSnyder:
    esp: float
    ml0: float
    en: tuple | None  # None for sphere
    es: float
    k0: float
    phi0: float
    spherical: bool


@dataclass(frozen=True)
class TmercConsts:
    algo: str  # 'poder_engsager' | 'evenden_snyder' | 'auto'
    exact: PoderEngsager | None
    approx: EvendenSnyder | None
    es: float
    k0: float


def setup_exact(ell: Ellipsoid, k0: float, phi0: float) -> PoderEngsager:
    """Coefficient pack; tmerc.cpp:487-596 (KW = Koenig & Weise 1951)."""
    if ell.es <= 0:
        raise ValueError("Poder/Engsager TM requires an ellipsoid (es > 0)")
    n = ell.n
    cgb = [0.0] * 6
    cbg = [0.0] * 6
    utg = [0.0] * 6
    gtu = [0.0] * 6

    np_ = n
    cgb[0] = n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (26 / 45.0 + n * (-2854 / 675.0))))))
    cbg[0] = n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (32 / 45.0 + n * (4642 / 4725.0))))))
    np_ *= n
    cgb[1] = np_ * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (2704 / 315.0 + n * (2323 / 945.0)))))
    cbg[1] = np_ * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (904 / 315.0 + n * (-1522 / 945.0)))))
    np_ *= n
    cgb[2] = np_ * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 + n * (73814 / 2835.0))))
    cbg[2] = np_ * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 + n * (-12686 / 2835.0))))
    np_ *= n
    cgb[3] = np_ * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0)))
    cbg[3] = np_ * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0)))
    np_ *= n
    cgb[4] = np_ * (4174 / 315.0 + n * (-144838 / 6237.0))
    cbg[4] = np_ * (-734 / 315.0 + n * (109598 / 31185.0))
    np_ *= n
    cgb[5] = np_ * (601676 / 22275.0)
    cbg[5] = np_ * (444337 / 155925.0)

    np2 = n * n
    Qn = k0 / (1 + n) * (1 + np2 * (1 / 4.0 + np2 * (1 / 64.0 + np2 / 256.0)))

    np_ = np2
    utg[0] = n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (1 / 360.0 + n * (81 / 512.0 + n * (-96199 / 604800.0))))))
    gtu[0] = n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (41 / 180.0 + n * (-127 / 288.0 + n * (7891 / 37800.0))))))
    utg[1] = np_ * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (-46 / 105.0 + n * (1118711 / 3870720.0)))))
    gtu[1] = np_ * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (281 / 630.0 + n * (-1983433 / 1935360.0)))))
    np_ *= n
    utg[2] = np_ * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 + n * (-5569 / 90720.0))))
    gtu[2] = np_ * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0 + n * (167603 / 181440.0))))
    np_ *= n
    utg[3] = np_ * (-4397 / 161280.0 + n * (11 / 504.0 + n * (830251 / 7257600.0)))
    gtu[3] = np_ * (49561 / 161280.0 + n * (-179 / 168.0 + n * (6601661 / 7257600.0)))
    np_ *= n
    utg[4] = np_ * (-4583 / 161280.0 + n * (108847 / 3991680.0))
    gtu[4] = np_ * (34729 / 80640.0 + n * (-3418889 / 1995840.0))
    np_ *= n
    utg[5] = np_ * (-20648693 / 638668800.0)
    gtu[5] = np_ * (212378941 / 319334400.0)

    Z = gatg(cbg, np.float64(phi0), np.cos(2 * np.float64(phi0)), np.sin(2 * np.float64(phi0)))
    Zb = -Qn * (float(Z) + float(clens(gtu, 2 * float(Z))))
    return PoderEngsager(Qn=Qn, Zb=Zb, cgb=tuple(cgb), cbg=tuple(cbg), utg=tuple(utg), gtu=tuple(gtu))


def setup_approx(ell: Ellipsoid, k0: float, phi0: float) -> EvendenSnyder:
    """tmerc.cpp:228-242."""
    if ell.es != 0.0:
        en = enfn(ell.n)
        ml0 = float(mlfn(np.float64(phi0), np.sin(np.float64(phi0)), np.cos(np.float64(phi0)), en))
        esp = ell.es / (1.0 - ell.es)
        return EvendenSnyder(esp=esp, ml0=ml0, en=tuple(en), es=ell.es, k0=k0, phi0=phi0, spherical=False)
    esp = k0
    ml0 = 0.5 * esp
    return EvendenSnyder(esp=esp, ml0=ml0, en=None, es=0.0, k0=k0, phi0=phi0, spherical=True)


# --- Poder/Engsager -----------------------------------------------------

def exact_e_fwd(lam, phi, Q: PoderEngsager):
    """tmerc.cpp:328-412 (keeps the sincos/identity optimizations)."""
    Cn = gatg(Q.cbg, phi, np.cos(2 * phi), np.sin(2 * phi))
    sin_Cn = np.sin(Cn)
    cos_Cn = np.cos(Cn)
    sin_Ce = np.sin(lam)
    cos_Ce = np.cos(lam)

    cos_Cn_cos_Ce = cos_Cn * cos_Ce
    Cn = np.arctan2(sin_Cn, cos_Cn_cos_Ce)

    inv_denom_tan_Ce = 1.0 / np.hypot(sin_Cn, cos_Cn_cos_Ce)
    tan_Ce = sin_Ce * cos_Cn * inv_denom_tan_Ce
    Ce = np.arcsinh(tan_Ce)

    two_inv = 2.0 * inv_denom_tan_Ce
    two_inv_sq = two_inv * inv_denom_tan_Ce
    tmp_r = cos_Cn_cos_Ce * two_inv_sq
    sin_arg_r = sin_Cn * tmp_r
    cos_arg_r = cos_Cn_cos_Ce * tmp_r - 1.0

    sinh_arg_i = tan_Ce * two_inv
    cosh_arg_i = two_inv_sq - 1.0

    dCn, dCe = clenS(Q.gtu, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
    Cn = Cn + dCn
    Ce = Ce + dCe
    bad = ~(np.abs(Ce) <= _DOMAIN_CE)
    y = Q.Qn * Cn + Q.Zb
    x = Q.Qn * Ce
    if bad.any():
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    return x, y


def exact_e_inv(x, y, Q: PoderEngsager):
    """tmerc.cpp:415-485."""
    Cn = (y - Q.Zb) / Q.Qn
    Ce = x / Q.Qn
    bad = ~(np.abs(Ce) <= _DOMAIN_CE)

    sin_arg_r = np.sin(2 * Cn)
    cos_arg_r = np.cos(2 * Cn)
    exp_2_Ce = np.exp(2 * Ce)
    half_inv = 0.5 / exp_2_Ce
    sinh_arg_i = 0.5 * exp_2_Ce - half_inv
    cosh_arg_i = 0.5 * exp_2_Ce + half_inv

    dCn, dCe = clenS(Q.utg, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
    Cn = Cn + dCn
    Ce = Ce + dCe

    sin_Cn = np.sin(Cn)
    cos_Cn = np.cos(Cn)
    sinhCe = np.sinh(Ce)
    Ce = np.arctan2(sinhCe, cos_Cn)
    modulus_Ce = np.hypot(sinhCe, cos_Cn)
    Cn = np.arctan2(sin_Cn, modulus_Ce)

    tmp = 2.0 * modulus_Ce / (sinhCe * sinhCe + 1.0)
    sin_2_Cn = sin_Cn * tmp
    cos_2_Cn = tmp * modulus_Ce - 1.0

    phi = gatg(Q.cgb, Cn, cos_2_Cn, sin_2_Cn)
    lam = Ce
    if bad.any():
        lam = np.where(bad, np.nan, lam)
        phi = np.where(bad, np.nan, phi)
    return lam, phi


# --- Evenden/Snyder ------------------------------------------------------

FC1, FC2, FC3 = 1.0, 0.5, 0.16666666666666666666
FC4, FC5, FC6 = 0.08333333333333333333, 0.05, 0.03333333333333333333
FC7, FC8 = 0.02380952380952380952, 0.01785714285714285714


def approx_e_fwd(lam, phi, Q: EvendenSnyder):
    """tmerc.cpp:71-116."""
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
    t = t * t
    al = cosphi * lam
    als = al * al
    al = al / np.sqrt(1.0 - Q.es * sinphi * sinphi)
    n = Q.esp * cosphi * cosphi
    x = Q.k0 * al * (
        FC1 + FC3 * als * (1.0 - t + n + FC5 * als * (
            5.0 + t * (t - 18.0) + n * (14.0 - 58.0 * t)
            + FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0))))
    )
    y = Q.k0 * (
        mlfn(phi, sinphi, cosphi, np.asarray(Q.en)) - Q.ml0
        + sinphi * al * lam * FC2 * (
            1.0 + FC4 * als * (5.0 - t + n * (9.0 + 4.0 * n) + FC6 * als * (
                61.0 + t * (t - 58.0) + n * (270.0 - 330 * t)
                + FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))))
        )
    )
    bad = (lam < -HALFPI) | (lam > HALFPI)
    if bad.any():
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    return x, y


def approx_e_inv(x, y, Q: EvendenSnyder):
    """tmerc.cpp:153-190."""
    en = np.asarray(Q.en)
    phi = inv_mlfn(Q.ml0 + y / Q.k0, en)
    pole = np.abs(phi) >= HALFPI

    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
    n = Q.esp * cosphi * cosphi
    con = 1.0 - Q.es * sinphi * sinphi
    with np.errstate(invalid="ignore", divide="ignore"):
        d = x * np.sqrt(con) / Q.k0
        con = con * t
        t = t * t
        ds = d * d
        phi_out = phi - (con * ds / (1.0 - Q.es)) * FC2 * (
            1.0 - ds * FC4 * (
                5.0 + t * (3.0 - 9.0 * n) + n * (1.0 - 4 * n)
                - ds * FC6 * (
                    61.0 + t * (90.0 - 252.0 * n + 45.0 * t) + 46.0 * n
                    - ds * FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1575.0 * t))))))
        lam_out = d * (
            FC1 - ds * FC3 * (
                1.0 + 2.0 * t + n - ds * FC5 * (
                    5.0 + t * (28.0 + 24.0 * t + 8.0 * n) + 6.0 * n
                    - ds * FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))))
        ) / cosphi
    phi_pole = np.where(y < 0.0, -HALFPI, HALFPI)
    phi_out = np.where(pole, phi_pole, phi_out)
    lam_out = np.where(pole, 0.0, lam_out)
    return lam_out, phi_out


def spherical_fwd(lam, phi, Q: EvendenSnyder):
    """tmerc.cpp:118-151."""
    cosphi = np.cos(phi)
    b = cosphi * np.sin(lam)
    bad = np.abs(np.abs(b) - 1.0) <= 1e-10
    with np.errstate(invalid="ignore", divide="ignore"):
        x = Q.ml0 * np.log((1.0 + b) / (1.0 - b))
        yv = cosphi * np.cos(lam) / np.sqrt(1.0 - b * b)
    ay = np.abs(yv)
    y = np.where(
        (cosphi == 1.0) & ((lam < -HALFPI) | (lam > HALFPI)),
        np.pi,
        np.where(ay >= 1.0, np.where((ay - 1.0) > 1e-10, np.nan, 0.0), np.arccos(np.clip(yv, -1, 1))),
    )
    y = np.where(phi < 0.0, -y, y)
    y = Q.esp * (y - Q.phi0)
    if bad.any():
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
    return x, y


def spherical_inv(x, y, Q: EvendenSnyder):
    """tmerc.cpp:192-215."""
    with np.errstate(over="ignore", invalid="ignore", divide="ignore"):
        h = np.exp(x / Q.esp)
        bad = h == 0.0  # x -> -inf underflows: domain error (:198-201)
        g = 0.5 * (h - 1.0 / h)
        D = Q.phi0 + y / Q.esp
        h = np.cos(D)
        phi = np.arcsin(np.sqrt(np.clip((1.0 - h * h) / (1.0 + g * g), 0, 1)))
    phi = np.copysign(phi, D)
    lam = np.where((g != 0.0) | (h != 0.0), np.arctan2(g, h), 0.0)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


# --- AUTO hybrid + registry glue ----------------------------------------

def setup(params: dict, ell: Ellipsoid, k0: float, phi0: float, proj_id: str = "tmerc") -> TmercConsts:
    """Algorithm choice per tmerc.cpp:617-779 (+getAlgoFromParams :664-704).

    Default algo is poder_engsager (data/proj.ini:59).
    """
    if "approx" in params:
        algo = "evenden_snyder"
    else:
        algo = params.get("algo", "poder_engsager")
    if proj_id == "etmerc":
        algo = "poder_engsager"
    if ell.es == 0:
        algo = "evenden_snyder"
    if algo == "auto" and (ell.es > 0.1 or phi0 != 0 or abs(k0 - 1) > 0.01):
        algo = "poder_engsager"
    exact = setup_exact(ell, k0, phi0) if algo in ("poder_engsager", "auto") else None
    approx = setup_approx(ell, k0, phi0) if algo in ("evenden_snyder", "auto") else None
    return TmercConsts(algo=algo, exact=exact, approx=approx, es=ell.es, k0=k0)


def fwd(lam, phi, C: TmercConsts):
    if C.algo == "poder_engsager":
        return exact_e_fwd(lam, phi, C.exact)
    if C.algo == "evenden_snyder":
        if C.approx.spherical:
            return spherical_fwd(lam, phi, C.approx)
        return approx_e_fwd(lam, phi, C.approx)
    # AUTO: Engsager when |lam| > 3 deg (tmerc.cpp:598-603)
    m = np.abs(lam) > 3 * DEG_TO_RAD
    x = np.empty_like(lam)
    y = np.empty_like(lam)
    if m.any():
        xe, ye = exact_e_fwd(lam[m], phi[m], C.exact)
        x[m], y[m] = xe, ye
    if (~m).any():
        xa, ya = approx_e_fwd(lam[~m], phi[~m], C.approx)
        x[~m], y[~m] = xa, ya
    return x, y


def inv(x, y, C: TmercConsts):
    if C.algo == "poder_engsager":
        return exact_e_inv(x, y, C.exact)
    if C.algo == "evenden_snyder":
        if C.approx.spherical:
            return spherical_inv(x, y, C.approx)
        return approx_e_inv(x, y, C.approx)
    # AUTO: parabola frontier (tmerc.cpp:605-615)
    m = np.abs(x) > 0.053 - 0.022 * y * y
    lam = np.empty_like(x)
    phi = np.empty_like(x)
    if m.any():
        le, pe = exact_e_inv(x[m], y[m], C.exact)
        lam[m], phi[m] = le, pe
    if (~m).any():
        la, pa = approx_e_inv(x[~m], y[~m], C.approx)
        lam[~m], phi[~m] = la, pa
    return lam, phi


def utm_params(params: dict, ell: Ellipsoid) -> dict:
    """Derive UTM cartographic offsets; tmerc.cpp:737-779.

    Returns overrides {lam0, phi0, x0, y0, k0}.
    """
    from .common import adjlon

    if ell.es == 0.0:
        raise ValueError("utm requires an ellipsoid")
    y0 = 1e7 if "south" in params else 0.0
    x0 = 500000.0
    if "zone" in params:
        zone = int(params["zone"])
        if not (0 < zone <= 60):
            raise ValueError("invalid utm zone")
        zone -= 1
    else:
        lam0 = float(params.get("lon_0", 0.0)) * DEG_TO_RAD
        zone = int(round(np.floor((float(adjlon(np.array([lam0]))[0]) + np.pi) * 30.0 / np.pi)))
        zone = min(max(zone, 0), 59)
    lam0 = (zone + 0.5) * np.pi / 30.0 - np.pi
    return {"lam0": lam0, "phi0": 0.0, "x0": x0, "y0": y0, "k0": 0.9996}
