"""Grid-based datum shifts (hgridshift / vgridshift / gridshift).

Re-derivation of the reference's grid application machinery:
- bilinear 4-corner sampling: /root/reference/src/grids.cpp:3322-3393
- iterative inverse (fixed-point on the forward shift, <= 10
  iterations, tolerance 1e-12): src/grids.cpp:3400-3450
- vertical grid: direct offset add/subtract (src/grids.cpp:200-310)

Grids are small NumPy arrays broadcast to executors (the reference
lazily loads + LRU-caches grid tiles; a broadcast variable is the
Spark-native equivalent).  The grid layout matches PROJ/NTv2
conventions: row-major, origin (lon0, lat0), spacing (dlon, dlat),
values in radians offsets (dlam, dphi) for horizontal grids, meters
for vertical grids.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_ITER = 10
TOL = 1e-12


@dataclass(frozen=True)
class Grid:
    lon0: float  # west edge, radians
    lat0: float  # south edge, radians
    dlon: float
    dlat: float
    # (height, width [, 2]) arrays
    values: np.ndarray


def _bilinear(grid: Grid, lam, phi):
    """4-corner weighted sample; grids.cpp:3322-3393 semantics
    (clamped to the grid edge)."""
    g = grid.values
    h, w = g.shape[:2]
    fx = (lam - grid.lon0) / grid.dlon
    fy = (phi - grid.lat0) / grid.dlat
    ix = np.clip(np.floor(fx).astype(np.int64), 0, w - 2)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, h - 2)
    tx = fx - ix
    ty = fy - iy
    v00 = g[iy, ix]
    v10 = g[iy, ix + 1]
    v01 = g[iy + 1, ix]
    v11 = g[iy + 1, ix + 1]
    if g.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]
    return ((1 - tx) * (1 - ty) * v00 + tx * (1 - ty) * v10
            + (1 - tx) * ty * v01 + tx * ty * v11)


def in_grid(grid: Grid, lam, phi):
    h, w = grid.values.shape[:2]
    return ((lam >= grid.lon0) & (lam <= grid.lon0 + (w - 1) * grid.dlon)
            & (phi >= grid.lat0) & (phi <= grid.lat0 + (h - 1) * grid.dlat))


def hgrid_fwd(grid: Grid, lam, phi):
    """Apply horizontal shift: out = in + interp(in)."""
    d = _bilinear(grid, lam, phi)
    m = in_grid(grid, lam, phi)
    dl = np.where(m, d[..., 0], 0.0)
    dp = np.where(m, d[..., 1], 0.0)
    return lam + dl, phi + dp


def hgrid_inv(grid: Grid, lam, phi):
    """Iterative inverse (grids.cpp:3400-3450): fixed-point solve
    out + interp(out) = in, <= MAX_ITER, tol 1e-12 rad."""
    cl = lam.copy()
    cp = phi.copy()
    active = np.ones(lam.shape, dtype=bool)
    for _ in range(MAX_ITER):
        if not active.any():
            break
        fl, fp = hgrid_fwd(grid, cl[active], cp[active])
        rl = fl - lam[active]
        rp = fp - phi[active]
        cl[active] -= rl
        cp[active] -= rp
        done = (np.abs(rl) < TOL) & (np.abs(rp) < TOL)
        idx = np.flatnonzero(active)
        active[idx[done]] = False
    return cl, cp


def vgrid_apply(grid: Grid, lam, phi, z, forward: bool = True):
    """Vertical shift: geometric -> orthometric subtracts the geoid
    undulation on fwd (vgridshift.cpp semantics)."""
    u = _bilinear(grid, lam, phi)
    m = in_grid(grid, lam, phi)
    u = np.where(m, u, 0.0)
    return z - u if forward else z + u


def synthetic_hgrid(n: int = 61, amp: float = 1e-5) -> Grid:
    """Deterministic smooth test grid over Europe-ish extent (radians):
    the correction field is C1-smooth so the fixed-point inverse
    converges quadratically."""
    lon = np.linspace(np.radians(-10.0), np.radians(30.0), n)
    lat = np.linspace(np.radians(35.0), np.radians(70.0), n)
    LO, LA = np.meshgrid(lon, lat)
    dl = amp * np.sin(3 * LO) * np.cos(2 * LA)
    dp = amp * np.cos(2 * LO) * np.sin(3 * LA)
    return Grid(lon0=float(lon[0]), lat0=float(lat[0]),
                dlon=float(lon[1] - lon[0]), dlat=float(lat[1] - lat[0]),
                values=np.stack([dl, dp], axis=-1))
