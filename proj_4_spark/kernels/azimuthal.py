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
from .common import HALFPI, adjlon
from .misc_proj import qsfn

EPS10 = 1e-10


# ------------------------------------------------------------------ aeqd

@dataclass(frozen=True)
class AeqdConsts:
    """aeqd.cpp pj_aeqd_data: modes 0=N_POLE 1=S_POLE 2=EQUIT
    3=OBLIQ, UNIT-radius geodesic (geod_init(&Q->g, 1, P->f), setup
    :283), mlfn pack + Mp/M1 for the polar-ellipsoidal and guam
    variants."""
    phi0: float
    sinph0: float
    cosph0: float
    mode: int
    g: object
    es: float
    e: float
    en: object
    Mp: float
    M1: float
    guam: bool


def aeqd_setup(ell, phi0: float, lam0: float,
               guam: bool = False) -> AeqdConsts:
    from .common import enfn, mlfn

    g = geod.Geodesic.init(1.0, ell.f)
    if abs(abs(phi0) - HALFPI) < EPS10:
        mode = 1 if phi0 < 0 else 0
        sinph0, cosph0 = (-1.0 if phi0 < 0 else 1.0), 0.0
    elif abs(phi0) < EPS10:
        mode = 2
        sinph0, cosph0 = 0.0, 1.0
    else:
        mode = 3
        sinph0, cosph0 = float(np.sin(phi0)), float(np.cos(phi0))
    en = Mp = M1 = None
    if ell.es != 0:
        en = enfn(ell.n)
        if mode in (0, 1):
            s = np.float64(1.0 if mode == 0 else -1.0)
            Mp = float(mlfn(s * HALFPI, s, np.float64(0.0), en))
        if guam:
            M1 = float(mlfn(np.float64(phi0), np.sin(phi0),
                            np.cos(phi0), en))
    return AeqdConsts(phi0=phi0, sinph0=sinph0, cosph0=cosph0, mode=mode,
                      g=g, es=ell.es, e=ell.e, en=en,
                      Mp=Mp if Mp is not None else 0.0,
                      M1=M1 if M1 is not None else 0.0,
                      guam=guam and ell.es != 0)


def _aeqd_e_fwd(lam, phi, C: AeqdConsts):
    """aeqd_e_forward (:85-122): geodesic azimuth/distance from the
    center, units of a; polar modes via the meridional arc."""
    from .common import mlfn

    if C.mode in (0, 1) and C.en is not None:
        sinp, cosp = np.sin(phi), np.cos(phi)
        rho = np.abs(C.Mp - mlfn(phi, sinp, cosp, C.en))
        coslam = np.cos(lam)
        return (rho * np.sin(lam),
                rho * (-coslam if C.mode == 0 else coslam))
    la0 = np.full_like(phi, np.degrees(C.phi0))
    lo0 = np.zeros_like(lam)
    s12, azi1, _, _ = geod.inverse(C.g, la0, lo0, np.degrees(phi),
                                   np.degrees(lam))
    at_center = (np.abs(lam) < EPS10) & (np.abs(phi - C.phi0) < EPS10)
    az = np.radians(azi1)
    return (np.where(at_center, 0.0, s12 * np.sin(az)),
            np.where(at_center, 0.0, s12 * np.cos(az)))


def aeqd_fwd(lam, phi, C: AeqdConsts):
    """aeqd forward (aeqd.cpp): guam / spherical (with the TOL-close
    delegation to the geodesic path and the antipode domain error,
    s_forward :124-187) / ellipsoidal."""
    from .common import mlfn

    if C.guam:
        cosp, sinp = np.cos(phi), np.sin(phi)
        t = 1.0 / np.sqrt(1.0 - C.es * sinp * sinp)
        x = lam * cosp * t
        y = (mlfn(phi, sinp, cosp, C.en) - C.M1
             + 0.5 * lam * lam * cosp * sinp * t)
        return x, y
    if C.es != 0:
        return _aeqd_e_fwd(lam, phi, C)
    sinp, cosp = np.sin(phi), np.cos(phi)
    coslam, sinlam = np.cos(lam), np.sin(lam)
    if C.mode in (2, 3):
        cosc = C.sinph0 * sinp + C.cosph0 * cosp * coslam
        near = np.abs(np.abs(cosc) - 1.0) < 1e-14
        bad = near & (cosc < 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            c = np.arccos(np.clip(cosc, -1.0, 1.0))
            k = np.where(near, 1.0, c / np.sin(c))
        x = k * cosp * sinlam
        y = k * (C.cosph0 * sinp - C.sinph0 * cosp * coslam)
        if np.any(near & ~bad):
            # within TOL of the center: delegate to the geodesic path
            # like the reference (s_forward :136-144)
            xg, yg = _aeqd_e_fwd(lam, phi, C)
            sel = near & ~bad
            x = np.where(sel, xg, x)
            y = np.where(sel, yg, y)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)
    # polar spherical (:172-186)
    phw = -phi if C.mode == 0 else phi
    clw = -coslam if C.mode == 0 else coslam
    bad = np.abs(phw - HALFPI) < EPS10
    yy = HALFPI + phw
    return (np.where(bad, np.nan, yy * sinlam),
            np.where(bad, np.nan, yy * clw))


def aeqd_inv(x, y, C: AeqdConsts):
    """aeqd inverse (aeqd.cpp :189-271)."""
    from .common import aasin, inv_mlfn

    if C.guam:
        x2 = 0.5 * x * x
        phi = np.full_like(x, C.phi0)
        t = np.zeros_like(x)
        for _ in range(3):
            t = C.e * np.sin(phi)
            t = np.sqrt(1.0 - t * t)
            phi = inv_mlfn(C.M1 + y - x2 * np.tan(phi) * t, C.en)
        return x * t / np.cos(phi), phi
    if C.es != 0:
        s12 = np.hypot(x, y)
        if C.mode in (2, 3):
            azi1 = np.degrees(np.arctan2(x, y))
            la0 = np.full_like(s12, np.degrees(C.phi0))
            lo0 = np.zeros_like(s12)
            lat2, lon2, _ = geod.direct(C.g, la0, lo0, azi1, s12)
            lam = np.radians(lon2)
            phi = np.radians(lat2)
        else:
            phi = inv_mlfn(C.Mp - s12 if C.mode == 0 else C.Mp + s12,
                           C.en)
            lam = np.arctan2(x, -y if C.mode == 0 else y)
        near0 = s12 < EPS10
        return (np.where(near0, 0.0, lam),
                np.where(near0, C.phi0, phi))
    c_rh = np.hypot(x, y)
    bad = c_rh - EPS10 > np.pi
    c_rh = np.minimum(c_rh, np.pi)
    with np.errstate(invalid="ignore", divide="ignore"):
        sinc = np.sin(c_rh)
        cosc = np.cos(c_rh)
        crs = np.where(c_rh == 0, 1.0, c_rh)
        if C.mode == 2:
            phi = aasin(y * sinc / crs)
            xx = x * sinc
            yy = cosc * c_rh
        elif C.mode == 3:
            phi = aasin(cosc * C.sinph0 + y * sinc * C.cosph0 / crs)
            yy = (cosc - C.sinph0 * np.sin(phi)) * c_rh
            xx = x * sinc * C.cosph0
        elif C.mode == 0:
            phi = HALFPI - c_rh
            yy = -y
            xx = x
        else:
            phi = c_rh - HALFPI
            yy = y
            xx = x
        if C.mode in (2, 3):
            lam = np.where(yy == 0.0, 0.0, np.arctan2(xx, yy))
        else:
            lam = np.arctan2(xx, yy)
    near0 = c_rh < EPS10
    phi = np.where(near0, C.phi0, phi)
    lam = np.where(near0, 0.0, lam)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


# ------------------------------------------------------ gnom / ortho

@dataclass(frozen=True)
class GnomConsts:
    """gnom.cpp pj_gnom_data; ellipsoidal case uses a UNIT-radius
    geodesic (geod_init(&Q->g, 1, P->f), setup :206) so outputs stay
    in units of a."""
    phi0: float
    sinph0: float
    cosph0: float
    mode: int           # 0=N_POLE 1=S_POLE 2=EQUIT 3=OBLIQ
    g: object | None    # Geodesic (unit radius) when ellipsoidal


def gnom_setup(ell, phi0: float) -> GnomConsts:
    if abs(abs(phi0) - HALFPI) < EPS10:
        mode = 1 if phi0 < 0 else 0
    elif abs(phi0) < EPS10:
        mode = 2
    else:
        mode = 3
    g = geod.Geodesic.init(1.0, ell.f) if ell.es != 0 else None
    return GnomConsts(phi0=phi0, sinph0=float(np.sin(phi0)),
                      cosph0=float(np.cos(phi0)), mode=mode, g=g)


def gnom_fwd(lam, phi, C: GnomConsts):
    """Gnomonic forward (gnom.cpp): spherical closed form with the
    beyond-horizon guard (y <= EPS10 -> domain error, :50-53), or the
    ellipsoidal geodesic form rho = m12/M12, azimuth azi0
    (gnom_e_forward :119-137, Karney, "Gnomonic projection of the
    ellipsoid")."""
    if C.g is not None:
        lat0 = np.degrees(C.phi0)
        la0 = np.full_like(phi, lat0)
        lo0 = np.zeros_like(lam)
        s12, azi1, _, _ = geod.inverse(C.g, la0, lo0, np.degrees(phi),
                                       np.degrees(lam))
        _, _, _, m, M, _ = geod.direct(C.g, la0, lo0, azi1, s12,
                                       want_scale=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            rho = np.where(M > 0, m / M, np.nan)
        az = np.radians(azi1)
        return rho * np.sin(az), rho * np.cos(az)
    sinp0, cosp0 = C.sinph0, C.cosph0
    sinp, cosp = np.sin(phi), np.cos(phi)
    coslam = np.cos(lam)
    if C.mode == 2:
        den = cosp * coslam
        num = sinp
    elif C.mode == 3:
        den = sinp0 * sinp + cosp0 * cosp * coslam
        num = cosp0 * sinp - sinp0 * cosp * coslam
    elif C.mode == 1:
        den = -sinp
        num = cosp * coslam
    else:
        den = sinp
        num = cosp * (-coslam)
    with np.errstate(invalid="ignore", divide="ignore"):
        k = np.where(den > EPS10, 1.0 / den, np.nan)
        x = k * cosp * np.sin(lam)
        y = k * num
    return x, y


def gnom_inv(x, y, C: GnomConsts):
    """Gnomonic inverse (gnom_s_inverse :74-117; gnom_e_inverse
    :139-185 — Newton on the arc length s along the azi0 geodesic,
    solving rho(s) = rho with drho/ds = 1/M^2, 10 iterations)."""
    if C.g is not None:
        lat0 = np.degrees(C.phi0)
        la0 = np.full_like(x, lat0)
        lo0 = np.zeros_like(x)
        azi0 = np.degrees(np.arctan2(x, y))
        rho = np.hypot(x, y)
        s = np.arctan(rho)
        little = rho <= 1.0
        with np.errstate(invalid="ignore", divide="ignore"):
            rho = np.where(little, rho, 1.0 / np.where(rho == 0, 1.0, rho))
        eps_ = 0.01 * np.sqrt(np.finfo(np.float64).eps)
        lat1 = np.zeros_like(x)
        lon1 = np.zeros_like(x)
        trip = np.zeros(x.shape, dtype=bool)
        for _ in range(10):
            lat1n, lon1n, _, m, M, _ = geod.direct(
                C.g, la0, lo0, azi0, s, want_scale=True)
            lat1 = np.where(trip, lat1, lat1n)
            lon1 = np.where(trip, lon1, lon1n)
            if trip.all():
                break
            ds = np.where(little, (m - rho * M) * M, (rho * m - M) * m)
            s = np.where(trip, s, s - ds)
            trip = trip | ~(np.abs(ds) >= eps_)
        lam = np.where(trip, np.radians(lon1), np.nan)
        phi = np.where(trip, np.radians(lat1), np.nan)
        return lam, phi
    rh = np.hypot(x, y)
    phi_c = np.arctan(rh)
    sinz = np.sin(phi_c)
    cosz = np.sqrt(1.0 - sinz * sinz)
    rhs = np.where(rh == 0, 1.0, rh)
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.mode == 3:
            sphi = cosz * C.sinph0 + y * sinz * C.cosph0 / rhs
            phi = np.where(np.abs(sphi) >= 1.0,
                           np.where(sphi > 0, HALFPI, -HALFPI),
                           np.arcsin(np.clip(sphi, -1.0, 1.0)))
            yy = (cosz - C.sinph0 * np.sin(phi)) * rh
            xx = x * sinz * C.cosph0
        elif C.mode == 2:
            sphi = y * sinz / rhs
            phi = np.where(np.abs(sphi) >= 1.0,
                           np.where(sphi > 0, HALFPI, -HALFPI),
                           np.arcsin(np.clip(sphi, -1.0, 1.0)))
            yy = cosz * rh
            xx = x * sinz
        elif C.mode == 1:
            phi = phi_c - HALFPI
            yy = y
            xx = x
        else:
            phi = HALFPI - phi_c
            yy = -y
            xx = x
        lam = np.arctan2(xx, yy)
    phi = np.where(rh <= EPS10, C.phi0, phi)
    lam = np.where(rh <= EPS10, 0.0, lam)
    return lam, phi


@dataclass(frozen=True)
class OrthoConsts:
    """ortho.cpp pj_ortho_data: modes 0=N_POLE 1=S_POLE 2=EQUIT
    3=OBLIQ; ellipsoidal recentering nu0/y_shift/y_scale (setup
    :306-341); +alpha plane rotation and k0."""
    phi0: float
    sinph0: float
    cosph0: float
    mode: int
    es: float
    one_es: float
    nu0: float
    y_shift: float
    y_scale: float
    sinalpha: float
    cosalpha: float
    k0: float


def ortho_setup(ell, phi0: float, k0: float = 1.0,
                alpha: float = 0.0) -> OrthoConsts:
    sinph0, cosph0 = float(np.sin(phi0)), float(np.cos(phi0))
    if abs(abs(phi0) - np.pi / 2) <= EPS10:
        mode = 1 if phi0 < 0 else 0
    elif abs(phi0) > EPS10:
        mode = 3
    else:
        mode = 2
    nu0 = y_shift = 0.0
    y_scale = 1.0
    if ell.es != 0:
        nu0 = 1.0 / float(np.sqrt(1.0 - ell.es * sinph0 * sinph0))
        y_shift = ell.es * nu0 * sinph0 * cosph0
        y_scale = 1.0 / float(np.sqrt(1.0 - ell.es * cosph0 * cosph0))
    return OrthoConsts(phi0=phi0, sinph0=sinph0, cosph0=cosph0, mode=mode,
                       es=ell.es, one_es=ell.one_es, nu0=nu0,
                       y_shift=y_shift, y_scale=y_scale,
                       sinalpha=float(np.sin(alpha)),
                       cosalpha=float(np.cos(alpha)), k0=k0)


def _ortho_s_fwd_raw(lam, phi, C: OrthoConsts):
    """Unrotated unit-sphere forward (ortho_s_forward :35-83)."""
    sinp, cosp = np.sin(phi), np.cos(phi)
    coslam = np.cos(lam)
    if C.mode == 2:
        bad = cosp * coslam < -EPS10
        y = sinp
    elif C.mode == 3:
        bad = C.sinph0 * sinp + C.cosph0 * cosp * coslam < -EPS10
        y = C.cosph0 * sinp - C.sinph0 * cosp * coslam
    else:
        bad = np.abs(phi - C.phi0) - EPS10 > np.pi / 2
        y = cosp * (-coslam if C.mode == 0 else coslam)
    x = cosp * np.sin(lam)
    return (np.where(bad, np.nan, x), np.where(bad, np.nan, y))


def ortho_fwd(lam, phi, C: OrthoConsts):
    """Orthographic forward, Sph&Ell (ortho.cpp); outside-hemisphere
    points -> NaN (PROJ_ERR_COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)."""
    if C.es == 0:
        xp, yp = _ortho_s_fwd_raw(lam, phi, C)
    else:
        # EPSG guidance note 7-2 §3.3.5 (ortho_e_forward :148-173)
        sinp, cosp = np.sin(phi), np.cos(phi)
        coslam, sinlam = np.cos(lam), np.sin(lam)
        bad = C.sinph0 * sinp + C.cosph0 * cosp * coslam < -EPS10
        nu = 1.0 / np.sqrt(1.0 - C.es * sinp * sinp)
        xp = nu * cosp * sinlam
        yp = (nu * (sinp * C.cosph0 - cosp * C.sinph0 * coslam)
              + C.es * (C.nu0 * C.sinph0 - nu * sinp) * C.cosph0)
        xp = np.where(bad, np.nan, xp)
        yp = np.where(bad, np.nan, yp)
    x = (xp * C.cosalpha - yp * C.sinalpha) * C.k0
    y = (xp * C.sinalpha + yp * C.cosalpha) * C.k0
    return x, y


def _ortho_s_inv_raw(x, y, C: OrthoConsts):
    """Unrotated unit-sphere inverse (ortho_s_inverse :85-146):
    points outside the unit disc -> NaN."""
    rh = np.hypot(x, y)
    bad = rh - 1.0 > EPS10
    sinc = np.minimum(rh, 1.0)
    cosc = np.sqrt(1.0 - sinc * sinc)
    rhs = np.where(rh == 0, 1.0, rh)
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.mode == 0:            # N_POLE
            phi = np.arccos(sinc)
            lam = np.arctan2(x, -y)
        elif C.mode == 1:          # S_POLE
            phi = -np.arccos(sinc)
            lam = np.arctan2(x, y)
        else:
            if C.mode == 2:
                sphi = y * sinc / rhs
                xx = x * sinc
                yy = cosc * rh
            else:
                sphi = cosc * C.sinph0 + y * sinc * C.cosph0 / rhs
                yy = (cosc - C.sinph0 * sphi) * rh
                xx = x * sinc * C.cosph0
            phi = np.where(np.abs(sphi) >= 1.0,
                           np.where(sphi < 0, -np.pi / 2, np.pi / 2),
                           np.arcsin(np.clip(sphi, -1.0, 1.0)))
            lam = np.where(
                yy == 0.0,
                np.where(xx == 0.0, 0.0,
                         np.where(xx < 0, -np.pi / 2, np.pi / 2)),
                np.arctan2(xx, yy))
    phi = np.where(rh <= EPS10, C.phi0, phi)
    lam = np.where(rh <= EPS10, 0.0, lam)
    return (np.where(bad, np.nan, lam), np.where(bad, np.nan, phi))


def ortho_inv(x, y, C: OrthoConsts):
    """Orthographic inverse, Sph&Ell (ortho.cpp :85-146, :175-304)."""
    xr = (C.cosalpha * x + C.sinalpha * y) / C.k0
    yr = (-C.sinalpha * x + C.cosalpha * y) / C.k0
    if C.es == 0:
        return _ortho_s_inv_raw(xr, yr, C)
    with np.errstate(invalid="ignore", divide="ignore"):
        if C.mode in (0, 1):
            # closed-form polar case (ortho_e_inverse :188-211)
            rh2 = xr * xr + yr * yr
            bad = rh2 - 1.0 > EPS10
            at_edge = rh2 >= 1.0 - 1e-15
            cos2 = np.clip(rh2 * C.one_es / (1.0 - C.es * rh2), 0.0, 1.0)
            phi = np.where(
                at_edge, 0.0,
                np.arccos(np.sqrt(cos2)) * (1 if C.mode == 0 else -1))
            lam = np.arctan2(xr, yr * (-1 if C.mode == 0 else 1))
            return (np.where(bad, np.nan, lam), np.where(bad, np.nan, phi))
        if C.mode == 2:
            # closed-form equatorial case (:213-243)
            a_over_b = 1.0 / np.sqrt(C.one_es)
            bad = xr * xr + (yr * a_over_b) ** 2 > 1 + 1e-11
            sinphi2 = np.where(
                yr == 0, 0.0,
                1.0 / (((1 - C.es) / np.where(yr == 0, 1.0, yr)) ** 2 + C.es))
            at_pole = sinphi2 > 1 - 1e-11
            phi = np.where(at_pole, np.pi / 2 * np.sign(yr),
                           np.arcsin(np.sqrt(sinphi2)) * np.where(
                               yr > 0, 1.0, -1.0))
            sinlam = xr * np.sqrt((1 - C.es * sinphi2)
                                  / np.maximum(1 - sinphi2, 1e-300))
            lam = np.where(np.abs(sinlam) - 1 > -1e-15,
                           np.pi / 2 * np.sign(xr),
                           np.arcsin(np.clip(sinlam, -1.0, 1.0)))
            lam = np.where(at_pole, 0.0, lam)
            return (np.where(bad, np.nan, lam), np.where(bad, np.nan, phi))
        # oblique: Newton on the forward map from the spherical guess
        # over the recentered ellipse (:245-303)
        yc = (yr - C.y_shift) / C.y_scale
        bad = xr * xr + yc * yc > 1 + 1e-11
        lam, phi = _ortho_s_inv_raw(np.where(bad, 0.0, xr),
                                    np.where(bad, 0.0, yc), C)
        lam = np.where(np.isnan(lam), 0.0, lam)
        phi = np.where(np.isnan(phi), C.phi0, phi)
        active = ~bad & np.isfinite(xr) & np.isfinite(yr)
        for _ in range(20):
            if not np.any(active):
                break
            cosp, sinp = np.cos(phi), np.sin(phi)
            coslam, sinlam = np.cos(lam), np.sin(lam)
            ome = 1.0 - C.es * sinp * sinp
            nu = 1.0 / np.sqrt(ome)
            xn = nu * cosp * sinlam
            yn = (nu * (sinp * C.cosph0 - cosp * C.sinph0 * coslam)
                  + C.es * (C.nu0 * C.sinph0 - nu * sinp) * C.cosph0)
            rho = (1.0 - C.es) * nu / ome
            J11 = -rho * sinp * sinlam
            J12 = nu * cosp * coslam
            J21 = rho * (cosp * C.cosph0 + sinp * C.sinph0 * coslam)
            J22 = nu * C.sinph0 * cosp * sinlam
            D = J11 * J22 - J12 * J21
            dx = xr - xn
            dy = yr - yn
            dphi = np.where(active, (J22 * dx - J12 * dy) / D, 0.0)
            dlam = np.where(active, (-J21 * dx + J11 * dy) / D, 0.0)
            phi = phi + dphi
            over = phi > np.pi / 2
            under = phi < -np.pi / 2
            phi = np.where(over, np.pi - phi, phi)
            phi = np.where(under, -np.pi - phi, phi)
            lam = np.where(over | under, adjlon(lam + np.pi), lam)
            lam = lam + dlam
            active = active & ((np.abs(dphi) >= 1e-12)
                               | (np.abs(dlam) >= 1e-12))
        # points still iterating after 20 steps error out like the
        # reference (:300-303) — e.g. exactly on the horizon rim
        bad = bad | active
        return (np.where(bad, np.nan, lam), np.where(bad, np.nan, phi))


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


# eqearth MAX_Y: y(psi = M*pi/2... ) — the reference clamps at the
# pole ordinate A1*psi + ... evaluated at psi_max = asin(M)
_EE_PSI_MAX = np.arcsin(_EE_M)
_EE_MAX_Y = float(_EE_PSI_MAX * (_EE_A1 + _EE_A2 * _EE_PSI_MAX ** 2
                  + _EE_PSI_MAX ** 6 * (_EE_A3
                                        + _EE_A4 * _EE_PSI_MAX ** 2)))


def eqearth_inv(x, y, C: EqearthConsts, max_iter: int = 12,
                eps: float = 1e-9):
    """Equal Earth inverse (eqearth.cpp:77-140): Newton on the y
    polynomial with the MAX_Y pole clamp, then psi -> authalic ->
    geographic latitude."""
    from .misc_proj import _authlat, _authset

    x = np.asarray(x, dtype=np.float64) / C.rqda
    y = np.asarray(y, dtype=np.float64) / C.rqda
    y = np.clip(y, -_EE_MAX_Y, _EE_MAX_Y)
    yc = y.copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        for _ in range(max_iter):
            y2 = yc * yc
            y6 = y2 * y2 * y2
            f = yc * (_EE_A1 + _EE_A2 * y2
                      + y6 * (_EE_A3 + _EE_A4 * y2)) - y
            fder = (_EE_A1 + 3 * _EE_A2 * y2
                    + y6 * (7 * _EE_A3 + 9 * _EE_A4 * y2))
            step = f / fder
            yc = yc - step
            if np.all(np.isnan(step) | (np.abs(step) < eps)):
                break
        y2 = yc * yc
        y6 = y2 * y2 * y2
        lam = (_EE_M * x * (_EE_A1 + 3 * _EE_A2 * y2
                            + y6 * (7 * _EE_A3 + 9 * _EE_A4 * y2))
               / np.cos(yc))
        # exactly at the pole cos(yc)->cos(psi_max) != 0, stays finite
        beta = np.arcsin(np.clip(np.sin(yc) / _EE_M, -1.0, 1.0))
    if C.es != 0.0:
        phi = _authlat(beta, _authset(C.es))
    else:
        phi = beta
    return lam, phi


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
