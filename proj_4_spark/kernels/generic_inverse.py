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
                    seed_from_xy: bool = True, rescue: bool = True):
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
        # numeric Jacobian; the difference step points TOWARD zero so a
        # clamped iterate at the +-pi / +-pi/2 boundary never samples
        # the forward outside its domain (generic_inverse.cpp:66,73)
        hl = np.where(la > 0, -h, h)
        hp = np.where(ph > 0, -h, h)
        fxl, fyl = fwd(la + hl, ph)
        fxp, fyp = fwd(la, ph + hp)
        j11 = (fxl - fx) / hl
        j21 = (fyl - fy) / hl
        j12 = (fxp - fx) / hp
        j22 = (fyp - fy) / hp
        det = j11 * j22 - j12 * j21
        with np.errstate(invalid="ignore", divide="ignore"):
            dlam = np.where(det != 0, (rx * j22 - ry * j12) / det, np.nan)
            dphi = np.where(det != 0, (ry * j11 - rx * j21) / det, np.nan)
        # cap the correction (+-0.3) and clamp the iterate to the
        # principal lon/lat domain: half-angle forwards (adams_ws2,
        # spilhaus) are not 2pi-periodic, so an escaped iterate
        # converges to a DIFFERENT valid preimage outside [-pi, pi]
        # (generic_inverse.cpp:93-107 pins this choice)
        la = np.clip(la - np.clip(dlam, -0.3, 0.3), -np.pi, np.pi)
        ph = np.clip(ph - np.clip(dphi, -0.3, 0.3), -np.pi / 2, np.pi / 2)
        lam[active] = np.where(done, lam[active], la)
        phi[active] = np.where(done, phi[active], ph)
        idx = np.flatnonzero(active)
        active[idx[done]] = False
    # mark never-converged points (NaN residuals compare False, so
    # build the mask from the CLOSED side)
    fx, fy = fwd(lam, phi)
    closed = (np.abs(fx - x) <= 1e-6) & (np.abs(fy - y) <= 1e-6)
    bad = ~closed & np.isfinite(x) & np.isfinite(y)
    if rescue and bad.any():
        # Newton diverges where the forward is only piecewise smooth
        # (fold seams of the Peirce square, icosahedron vertices):
        # derivative-free multi-seed compass search, ACCEPTED only when
        # the residual actually closes — true outside-domain points
        # still come back NaN
        lr, pr = rescue_compass(fwd, x[bad], y[bad])
        lam[bad] = lr
        phi[bad] = pr
        bad = np.zeros_like(bad)
    bad |= ~(np.isfinite(x) & np.isfinite(y))
    lam = np.where(bad, np.nan, lam)
    phi = np.where(bad, np.nan, phi)
    return lam, phi


def compass_refine(fwd, x, y, lam, phi, span: float = 0.5,
                   levels: int = 46):
    """Coordinate pattern search minimizing |fwd(l,p) - (x,y)|²; span
    halves per level.  Returns (lam, phi, residual²)."""
    lam = np.array(lam, dtype=np.float64, copy=True)
    phi = np.array(phi, dtype=np.float64, copy=True)
    offs = np.array([-1.0, -0.5, 0.0, 0.5, 1.0])
    fx, fy = fwd(lam, phi)
    best = (fx - x) ** 2 + (fy - y) ** 2
    best = np.where(np.isfinite(best), best, np.inf)
    for _ in range(levels):
        for dlo in offs * span:
            for dla in offs * span:
                if dlo == 0.0 and dla == 0.0:
                    continue
                lt = np.clip(lam + dlo, -np.pi, np.pi)
                pt = np.clip(phi + dla, -np.pi / 2, np.pi / 2)
                xt, yt = fwd(lt, pt)
                d = (xt - x) ** 2 + (yt - y) ** 2
                better = np.isfinite(d) & (d < best)
                lam = np.where(better, lt, lam)
                phi = np.where(better, pt, phi)
                best = np.where(better, d, best)
        span *= 0.5
    return lam, phi, best


_RESCUE_SEEDS = [(0.0, 1e-7)] + [
    (sl, sp) for sl in (-2.36, -0.79, 0.79, 2.36) for sp in (-0.6, 0.6)]


def rescue_compass(fwd, x, y, accept: float = 1e-7):
    """Best compass result over a fixed seed grid, Newton-polished
    (axis-aligned compass stalls in the narrow curved valleys near
    poles; Newton from the compass point tracks them); NaN where even
    the best residual does not close below ``accept`` (map units)."""
    lam = np.full_like(x, np.nan)
    phi = np.full_like(x, np.nan)
    best = np.full_like(x, np.inf)
    for sl, sp in _RESCUE_SEEDS:
        lr, pr, _ = compass_refine(fwd, x, y,
                                   np.full_like(x, sl),
                                   np.full_like(x, sp))
        ln, pn = _newton_polish(fwd, x, y, lr, pr)
        for ll, pl in ((ln, pn), (lr, pr)):
            with np.errstate(invalid="ignore"):
                fx, fy = fwd(ll, pl)
                dd = (fx - x) ** 2 + (fy - y) ** 2
            better = np.isfinite(dd) & (dd < best)
            lam = np.where(better, ll, lam)
            phi = np.where(better, pl, phi)
            best = np.where(better, dd, best)
    ok = best < accept * accept
    return np.where(ok, lam, np.nan), np.where(ok, phi, np.nan)


def _newton_polish(fwd, x, y, lam0, phi0, max_iter: int = 30,
                   h: float = 1e-9):
    """Damped Newton from an explicit per-point seed; keeps the best
    iterate instead of NaNing on divergence."""
    lam = np.array(lam0, dtype=np.float64, copy=True)
    phi = np.array(phi0, dtype=np.float64, copy=True)
    best_l, best_p = lam.copy(), phi.copy()
    with np.errstate(invalid="ignore", divide="ignore"):
        fx, fy = fwd(lam, phi)
        best = (fx - x) ** 2 + (fy - y) ** 2
        best = np.where(np.isfinite(best), best, np.inf)
        for _ in range(max_iter):
            fx, fy = fwd(lam, phi)
            rx, ry = fx - x, fy - y
            fxl, fyl = fwd(lam + h, phi)
            fxp, fyp = fwd(lam, phi + h)
            j11 = (fxl - fx) / h
            j21 = (fyl - fy) / h
            j12 = (fxp - fx) / h
            j22 = (fyp - fy) / h
            det = j11 * j22 - j12 * j21
            dlam = np.where(det != 0, (rx * j22 - ry * j12) / det, 0.0)
            dphi = np.where(det != 0, (ry * j11 - rx * j21) / det, 0.0)
            # damp steps so one bad Jacobian doesn't eject the iterate
            dlam = np.clip(np.nan_to_num(dlam), -0.3, 0.3)
            dphi = np.clip(np.nan_to_num(dphi), -0.3, 0.3)
            lam = np.clip(lam - dlam, -np.pi, np.pi)
            phi = np.clip(phi - dphi, -np.pi / 2, np.pi / 2)
            fx, fy = fwd(lam, phi)
            d = (fx - x) ** 2 + (fy - y) ** 2
            better = np.isfinite(d) & (d < best)
            best_l = np.where(better, lam, best_l)
            best_p = np.where(better, phi, best_p)
            best = np.where(better, d, best)
    return best_l, best_p
