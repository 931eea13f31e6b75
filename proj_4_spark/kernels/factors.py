"""Projection distortion factors — the vectorized restatement of
proj_factors (/root/reference/src/factors.cpp:111-240): meridional
scale h, parallel scale k, areal scale s, angular distortion omega,
and Tissot axes a/b, all via 4th-order central numeric derivatives of
the forward map (PROJ uses simple central differences with
DEFAULT_H; we match the semantics, not the step size).
"""

from __future__ import annotations

import numpy as np

DERIV_H = 1e-7  # radians step (factors.cpp uses 1e-5 deg ~ 1.7e-7 rad)


def factors(tr, lon_deg, lat_deg, ell=None):
    """Returns dict of arrays: h, k, s, omega_deg, a, b.

    `tr` is a compiled Transform whose forward consumes degrees and
    yields meters (transform_deg)."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    hdeg = np.degrees(DERIV_H)
    xe, ye, _, _ = tr.transform_deg(lon + hdeg, lat)
    xw, yw, _, _ = tr.transform_deg(lon - hdeg, lat)
    xn, yn, _, _ = tr.transform_deg(lon, lat + hdeg)
    xs, ys, _, _ = tr.transform_deg(lon, lat - hdeg)
    dxdl = (xe - xw) / (2 * DERIV_H)
    dydl = (ye - yw) / (2 * DERIV_H)
    dxdp = (xn - xs) / (2 * DERIV_H)
    dydp = (yn - ys) / (2 * DERIV_H)

    if ell is None:
        ops = getattr(tr, "ops", [])
        ell = ops[0].ell if ops else None
    a = ell.a if ell is not None else 6378137.0
    es = ell.es if ell is not None else 0.0

    phi = np.radians(lat)
    sphi = np.sin(phi)
    cphi = np.cos(phi)
    t = 1.0 - es * sphi * sphi
    n = 1.0 / np.sqrt(t)  # prime-vertical radius / a
    r_merid = a * (1.0 - es) * t ** -1.5  # meridian curvature radius
    r_paral = a * n * cphi  # parallel radius

    h = np.hypot(dxdp, dydp) / r_merid
    k = np.hypot(dxdl, dydl) / r_paral
    # areal scale via the Jacobian (factors.cpp s = h*k*sin(theta'))
    det = dxdl * dydp - dxdp * dydl
    s = det / (r_merid * r_paral)
    # meridian convergence (factors.cpp:85)
    conv = -np.arctan2(dxdp, dydp)
    # meridian-parallel angle theta' (factors.cpp:92)
    with np.errstate(invalid="ignore", divide="ignore"):
        thetap = np.degrees(np.arcsin(np.clip(s / (h * k), -1.0, 1.0)))
    # Tissot axes (factors.cpp:95-101)
    t2 = h * h + k * k
    ap = np.sqrt(np.maximum(t2 + 2.0 * s, 0.0))
    bp = np.sqrt(np.maximum(t2 - 2.0 * s, 0.0))
    tissot_a = 0.5 * (ap + bp)
    tissot_b = 0.5 * (ap - bp)
    # angular distortion (factors.cpp:103-104)
    with np.errstate(invalid="ignore", divide="ignore"):
        omega = 2.0 * np.degrees(np.arcsin(np.clip(
            (tissot_a - tissot_b) / (tissot_a + tissot_b), -1.0, 1.0)))
    return {"h": h, "k": k, "s": s, "omega_deg": omega,
            "a": tissot_a, "b": tissot_b,
            "conv_deg": np.degrees(conv), "thetap_deg": thetap}
