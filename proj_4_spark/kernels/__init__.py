"""Pure-NumPy projection kernels (no Spark imports here).

Each projection module exposes::

    setup(params: dict, ell: Ellipsoid) -> consts   # driver-side, once
    fwd(lam, phi, consts)  -> (x, y)                # vectorized, radians in
    inv(x, y, consts)      -> (lam, phi)            # vectorized

with (x, y) in "classic" units of the semimajor axis — scaling by
``a`` and false eastings are applied by the generic finalize step
(mirrors /root/reference/src/fwd.cpp:123-174 and src/inv.cpp:39-100).
"""
