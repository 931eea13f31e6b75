"""Icosahedral Snyder Equal Area (isea) — plane output mode.

Vectorized NumPy re-derivation of /root/reference/src/projections/isea.cpp:
- orientation transform (snyder_ctran / isea_ctran, :436-488)
- per-face Snyder equal-area forward (:307-434; Snyder 1992 eqs 5-12)
- triangle plane placement (isea_triangle_xy / isea_tri_plane,
  :219-247, :561-572)

The reference ships no closed-form inverse ("if an inverse was
needed..." isea.cpp:998); the registration exposes the generic Newton.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEG120 = 2.09439510239319549229
DEG180 = np.pi
ISEA_STD_LAT = 1.01722196792335072101
ISEA_STD_LONG = 0.19634954084936207740
E_RAD = 0.91843818701052843323
F_RAD = 0.18871053078356206978
SDC2VOS = 0.6523581397843681859886783   # g
TANG = 0.76393202250021030358019673567  # tan(g)
COT_THETA = 1.0 / np.tan(np.radians(30.0))
COSG = 0.80901699437494742410229341718281905886
SIN_G_COS_SDC2VOS = np.sin(np.radians(36.0)) * np.cos(SDC2VOS)
RPRIME_OVER_R = 0.9103832815095032
TABLE_G = TANG * np.sin(np.radians(60.0))
TABLE_H = 0.25 * TANG

# face centers (isea.cpp:199-210)
_FACE_LAT = np.array([E_RAD] * 5 + [F_RAD] * 5 + [-F_RAD] * 5 + [-E_RAD] * 5)
_FACE_LON = np.radians(np.array(
    [-144, -72, 0, 72, 144,
     -144, -72, 0, 72, 144,
     -108, -36, 36, 108, 180,
     -108, -36, 36, 108, 180], dtype=np.float64))


def _az_adjustment(i: int) -> float:
    """isea.cpp:211-217."""
    if (5 <= i <= 9) or i in (15, 16):
        return np.pi
    if i >= 17:
        return -np.pi
    return 0.0


def _triangle_xy(i: int):
    """isea.cpp:219-247."""
    x = TABLE_G * ((i % 5) - 2) * 2.0
    if i > 9:
        x += TABLE_G
    y = (5.0, 1.0, -1.0, -5.0)[i // 5] * TABLE_H
    return x * RPRIME_OVER_R, y * RPRIME_OVER_R


@dataclass(frozen=True)
class IseaConsts:
    o_lat: float
    o_lon: float
    o_az: float


def setup(params: dict) -> IseaConsts:
    """isea.cpp grid init + +orient/+azi overrides.  Hex output mode
    mirrors the reference's integer-overflow guards (isea.cpp:775-777
    even / ap3odd offset :880-884): aperture^(resolution/2) (or
    3^(resolution-1) for odd aperture-3) must fit a 32-bit int."""
    mode = params.get("mode", "plane")
    if mode == "hex":
        resolution = int(params.get("resolution", 4))
        aperture = int(params.get("aperture", 3))
        if aperture == 3 and resolution % 2 != 0:
            if 3.0 ** (resolution - 1) > 2 ** 31 - 1:
                raise ValueError("isea: integer overflow "
                                 f"(resolution {resolution})")
        elif aperture > 0 and \
                aperture ** (resolution / 2.0) > 2 ** 31 - 1:
            raise ValueError("isea: integer overflow "
                             f"(resolution {resolution})")
        raise NotImplementedError(
            "isea: hex output lives in index/hexdggs (aperture-7 "
            "DGGS); the projection kernel is plane-mode only")
    if mode != "plane":
        raise NotImplementedError(f"isea: mode {mode} not supported")
    o_lat, o_lon, o_az = ISEA_STD_LAT, ISEA_STD_LONG, 0.0
    orient = params.get("orient")
    if orient is not None:
        if orient == "isea":
            pass
        elif orient == "pole":
            o_lat, o_lon = np.pi / 2.0, 0.0
        else:
            raise ValueError("isea: orient should be isea or pole")
    if "azi" in params:
        o_az = np.radians(float(params["azi"]))
    return IseaConsts(o_lat=float(o_lat), o_lon=float(o_lon),
                      o_az=float(o_az))


def _ctran(lam, phi, C: IseaConsts):
    """isea_ctran (isea.cpp:469-488) with the np.lon+pi shifted pole
    and the o_az output-longitude origin."""
    alpha = C.o_lat
    beta = C.o_lon + np.pi
    dl = lam - beta
    cp, sp = np.cos(phi), np.sin(phi)
    ca, sa = np.cos(alpha), np.sin(alpha)
    cdl, sdl = np.cos(dl), np.sin(dl)
    sin_phip = sa * sp - ca * cp * cdl
    lambdap = np.arctan2(cp * sdl, sa * cp * cdl + ca * sp) + beta
    lambdap = np.mod(lambdap, 2.0 * np.pi)
    lambdap = np.where(lambdap > np.pi, lambdap - 2.0 * np.pi, lambdap)
    lambdap = lambdap - (-C.o_az + C.o_lon)
    lambdap = np.mod(lambdap, 2.0 * np.pi)
    lambdap = np.where(lambdap > np.pi, lambdap - 2.0 * np.pi, lambdap)
    lambdap = np.where(lambdap < -np.pi, lambdap + 2.0 * np.pi, lambdap)
    # arctan2(sin, |cos|) instead of arcsin(sin): near the orientation
    # pole (an icosahedron vertex) sin_phip rounds to 1.0 and arcsin
    # collapses a ~1e-8 rad neighbourhood to exactly pi/2, flattening
    # the forward there; the horizontal-norm form stays conditioned
    cos_phip = np.hypot(cp * sdl, sa * cp * cdl + ca * sp)
    phip = np.arctan2(sin_phip, cos_phip)
    return lambdap, phip


def fwd(lam, phi, C: IseaConsts):
    """Full plane-mode forward: orientation, per-face Snyder forward
    (first matching face, like the reference's loop), triangle
    placement."""
    lam, phi = _ctran(lam, phi, C)
    sinLat = np.sin(phi)
    cosLat = np.cos(phi)
    x_out = np.full(lam.shape, np.nan)
    y_out = np.full(lam.shape, np.nan)
    done = np.zeros(lam.shape, dtype=bool)
    with np.errstate(invalid="ignore", divide="ignore"):
        for i in range(20):
            if done.all():
                break
            dLon = lam - _FACE_LON[i]
            s_c, c_c = np.sin(_FACE_LAT[i]), np.cos(_FACE_LAT[i])
            cosLat_cosLon = cosLat * np.cos(dLon)
            cosZ = s_c * sinLat + c_c * cosLat_cosLon
            z = np.arccos(np.clip(cosZ, -1.0, 1.0))
            cand = ~done & (z <= SDC2VOS + 0.000005)
            if not cand.any():
                continue
            Az = np.arctan2(cosLat * np.sin(dLon),
                            c_c * sinLat - s_c * cosLat_cosLon)
            Az = Az - _az_adjustment(i)
            Az = np.where(Az < 0.0, Az + 2.0 * np.pi, Az)
            # fold into [0, 120deg] counting multiples
            mult = np.floor(Az / DEG120)
            Az = Az - mult * DEG120
            neg = Az < 0.0
            Az = np.where(neg, Az + DEG120, Az)
            mult = np.where(neg, mult - 1, mult)
            cosAz = np.cos(Az)
            sinAz = np.sin(Az)
            q = np.arctan2(TANG, cosAz + sinAz * COT_THETA)
            cand = cand & (z <= q + 0.000005)
            if not cand.any():
                continue
            H = np.arccos(np.clip(
                sinAz * SIN_G_COS_SDC2VOS - cosAz * COSG, -1.0, 1.0))
            Ag = Az + np.radians(36.0) + H - DEG180
            Azprime = np.arctan2(
                2.0 * Ag,
                RPRIME_OVER_R * RPRIME_OVER_R * TANG * TANG
                - 2.0 * Ag * COT_THETA)
            dprime = RPRIME_OVER_R * TANG \
                / (np.cos(Azprime) + np.sin(Azprime) * COT_THETA)
            f = dprime / (2.0 * RPRIME_OVER_R * np.sin(q / 2.0))
            rho = 2.0 * RPRIME_OVER_R * f * np.sin(z / 2.0)
            Azprime = Azprime + DEG120 * mult
            x = rho * np.sin(Azprime)
            y = rho * np.cos(Azprime)
            # triangle plane placement (isea_tri_plane)
            if (i // 5) % 2 == 1:  # DOWNTRI
                x = -x
                y = -y
            tcx, tcy = _triangle_xy(i)
            x_out = np.where(cand, x + tcx, x_out)
            y_out = np.where(cand, y + tcy, y_out)
            done |= cand
    return x_out, y_out


# -------------------------------------------------------------- inverse
#
# The reference gained an inverse only for the default planar grid
# (isea.cpp:1096-1370 ISEAPlanarProjection::cartesianToGeo — per-face
# inverse Snyder with a Newton on Az).  Here the inverse is a
# table-seeded 2D Newton on the vectorized forward: a coarse
# fwd-sampled grid (built once per orientation and cached) supplies a
# same-face seed, and the within-face forward is smooth so Newton
# converges quadratically.  Points whose Newton diverges (triangle
# edges / outside the net) return NaN like the reference's
# out-of-domain path.

_ISEA_SEEDS: dict = {}


def _seed_table(C: IseaConsts):
    key = (C.o_lat, C.o_lon, C.o_az)
    tab = _ISEA_SEEDS.get(key)
    if tab is None:
        lon = np.radians(np.arange(-178.75, 180.0, 2.5))
        lat = np.radians(np.arange(-88.75, 90.0, 2.5))
        LO, LA = np.meshgrid(lon, lat)
        lo = LO.ravel()
        la = LA.ravel()
        fx, fy = fwd(lo, la, C)
        ok = np.isfinite(fx) & np.isfinite(fy)
        tab = (lo[ok], la[ok], fx[ok], fy[ok])
        _ISEA_SEEDS[key] = tab
    return tab


def inv(x, y, C: IseaConsts, chunk: int = 4096):
    """Seeded-Newton inverse of the plane-mode forward (see above).
    The nearest-seed search is O(n_points × n_table) per chunk — fine
    for fixture/driver scale; at cluster scale the forward direction
    is the hot path and this inverse is diagnostic."""
    from .generic_inverse import generic_inverse

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    slo, sla, sfx, sfy = _seed_table(C)
    lam0 = np.zeros_like(x)
    phi0 = np.zeros_like(x)
    for i in range(0, x.shape[0], chunk):
        xs = x[i:i + chunk]
        ys = y[i:i + chunk]
        d2 = (xs[:, None] - sfx[None, :]) ** 2 \
            + (ys[:, None] - sfy[None, :]) ** 2
        j = np.nanargmin(np.where(np.isnan(d2), np.inf, d2), axis=1)
        lam0[i:i + chunk] = slo[j]
        phi0[i:i + chunk] = sla[j]
    # rescue=False: the generic multi-seed rescue starts far from the
    # right icosahedron face and can settle in another face's local
    # minimum — the seed-table compass below is the better fallback
    lam, phi = generic_inverse(lambda la, ph: fwd(la, ph, C), x, y,
                               lam0=lam0, phi0=phi0, seed_from_xy=False,
                               max_iter=20, rescue=False)
    fx, fy = fwd(lam, phi, C)
    bad = ~(np.isfinite(lam) & np.isfinite(phi)
            & (np.abs(fx - x) < 1e-9) & (np.abs(fy - y) < 1e-9))
    if np.any(bad):
        # icosahedron VERTICES (5 faces meet, forward gradient is
        # discontinuous): the numeric-Jacobian Newton straddles faces
        # and diverges — fall back to a derivative-free compass search
        # from the NEAREST-SEED start, which only EVALUATES the forward
        cl, cp = _compass_refine(x[bad], y[bad], C, lam0[bad],
                                 phi0[bad])
        # damped-Newton polish tracks the narrow valley the
        # axis-aligned compass cannot (vertex Jacobian ill-conditioned)
        from .generic_inverse import _newton_polish

        nl, npp = _newton_polish(lambda a, b: fwd(a, b, C),
                                 x[bad], y[bad], cl, cp)
        fx1, fy1 = fwd(nl, npp, C)
        fx2, fy2 = fwd(cl, cp, C)
        d1 = (fx1 - x[bad]) ** 2 + (fy1 - y[bad]) ** 2
        d2 = (fx2 - x[bad]) ** 2 + (fy2 - y[bad]) ** 2
        better = np.isfinite(d1) & (d1 < d2)
        lam[bad] = np.where(better, nl, cl)
        phi[bad] = np.where(better, npp, cp)
    return lam, phi


def _compass_refine(x, y, C, lam, phi, span: float = 0.2,
                    levels: int = 40):
    """Coordinate pattern search minimizing |fwd(l,p) - (x,y)|², span
    halved per level (0.2 rad -> ~2e-13 rad ≈ µm ground scale)."""
    lam = lam.copy()
    phi = phi.copy()
    offs = np.array([-1.0, -0.5, 0.0, 0.5, 1.0])
    best = np.full(x.shape, np.inf)
    xt, yt = fwd(lam, phi, C)
    d0 = (xt - x) ** 2 + (yt - y) ** 2
    np.copyto(best, d0, where=np.isfinite(d0))
    for _ in range(levels):
        for dlo in offs * span:
            for dla in offs * span:
                if dlo == 0.0 and dla == 0.0:
                    continue
                lt = lam + dlo
                pt = np.clip(phi + dla, -np.pi / 2, np.pi / 2)
                xt, yt = fwd(lt, pt, C)
                d = (xt - x) ** 2 + (yt - y) ** 2
                better = np.isfinite(d) & (d < best)
                lam = np.where(better, lt, lam)
                phi = np.where(better, pt, phi)
                best = np.where(better, d, best)
        span *= 0.5
    return lam, phi
