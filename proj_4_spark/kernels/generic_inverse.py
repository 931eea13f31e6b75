"""Generic 2D Newton inverse for projections without a closed-form
inverse — the vectorized restatement of
/root/reference/src/generic_inverse.cpp:33+ (Newton-Raphson on the
forward map with a numeric Jacobian, per-point convergence).

Given fwd: (lam, phi) -> (x, y), solves fwd(lam, phi) = (X, Y) with
an active-mask iteration (converged points stop updating, mirroring
PROJ's fixed iteration bound — max 15 iterations, tol 1e-12 in
projected units of the semimajor axis).
"""

from __future__ import annotations

import numpy as np


def generic_inverse(fwd, x, y, lam0=None, phi0=None, max_iter: int = 15,
                    tol: float = 1e-12, h: float = 1e-8,
                    seed_from_xy: bool = True):
    """Vectorized Newton: returns (lam, phi); NaN where diverged.

    With ``seed_from_xy`` the iteration starts from the scaled
    projected coordinates (inputs are in semimajor-axis units, so
    x ~ lam and y ~ phi to first order for most projections) blended
    with the provided center seeds — much larger convergence basin
    than a fixed center start."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lam = np.zeros_like(x) if lam0 is None else np.full_like(x, lam0)
    phi = np.zeros_like(x) if phi0 is None else np.full_like(x, phi0)
    if seed_from_xy:
        lam = np.clip(np.where(np.isfinite(x), 0.9 * x + lam, lam),
                      -3.1, 3.1)
        phi = np.clip(np.where(np.isfinite(y), 0.9 * y + phi, phi),
                      -1.45, 1.45)
    active = np.isfinite(x) & np.isfinite(y)
    for _ in range(max_iter):
        if not active.any():
            break
        la, ph = lam[active], phi[active]
        fx, fy = fwd(la, ph)
        rx = fx - x[active]
        ry = fy - y[active]
        done = (np.abs(rx) < tol) & (np.abs(ry) < tol)
        # numeric Jacobian (forward differences, generic_inverse.cpp)
        fxl, fyl = fwd(la + h, ph)
        fxp, fyp = fwd(la, ph + h)
        j11 = (fxl - fx) / h
        j21 = (fyl - fy) / h
        j12 = (fxp - fx) / h
        j22 = (fyp - fy) / h
        det = j11 * j22 - j12 * j21
        with np.errstate(invalid="ignore", divide="ignore"):
            dlam = np.where(det != 0, (rx * j22 - ry * j12) / det, np.nan)
            dphi = np.where(det != 0, (ry * j11 - rx * j21) / det, np.nan)
        la = la - dlam
        ph = np.clip(ph - dphi, -np.pi / 2, np.pi / 2)
        lam[active] = np.where(done, lam[active], la)
        phi[active] = np.where(done, phi[active], ph)
        idx = np.flatnonzero(active)
        active[idx[done]] = False
    # mark never-converged points
    fx, fy = fwd(lam, phi)
    bad = (np.abs(fx - x) > 1e-6) | (np.abs(fy - y) > 1e-6)
    lam = np.where(bad, np.nan, lam)
    phi = np.where(bad, np.nan, phi)
    return lam, phi
