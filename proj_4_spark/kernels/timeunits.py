"""Time-unit conversions for +proj=unitconvert +t_in/+t_out.

Re-derivation of /root/reference/src/conversions/unitconvert.cpp:
- mjd (no-op pivot)               :149-160
- decimalyear <-> mjd             :162-205
- gps_week <-> mjd                :207-230  (epoch 1980-01-06, mjd 44244)
- yyyymmdd <-> mjd                :232-270
(MJD epoch used by the reference: 1858-11-16 00:00.)

Vectorized over NumPy arrays; leap-day loops are replaced by closed
-form Gregorian leap counts (identical results, O(1) per point).
"""

from __future__ import annotations

import numpy as np

_CUM_DAYS = np.array([0, 31, 59, 90, 120, 151, 181, 212, 243, 273,
                      304, 334], dtype=np.float64)


def _is_leap(year):
    return ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)


def _days_in_year(year):
    return np.where(_is_leap(year), 366.0, 365.0)


def _leaps_between(y_lo_excl, y_hi_incl):
    """# leap years y with y_lo_excl < y <= y_hi_incl (vectorized)."""

    def cum(y):
        return np.floor(y / 4) - np.floor(y / 100) + np.floor(y / 400)

    return cum(y_hi_incl) - cum(y_lo_excl)


def decimalyear_to_mjd(dy):
    dy = np.asarray(dy, dtype=np.float64)
    ok = (dy >= -10000) & (dy <= 10000)
    year = np.floor(dy)
    frac = dy - year
    mjd = (year - 1859) * 365 + 14 + 31
    mjd = mjd + frac * _days_in_year(year)
    # leap days of years 1859..year-1 (unitconvert.cpp:181-186)
    mjd = mjd + _leaps_between(1858.0, year - 1)
    return np.where(ok, mjd, 0.0)


def mjd_to_decimalyear(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    # invert: find year with cumdays(year) <= mjd < cumdays(year+1)
    # cumdays(y) = (y-1859)*365 + leaps(1858, y-1) + 45
    year = np.floor(mjd / 365.2425) + 1859  # close seed
    for _ in range(3):  # correct the seed (at most off by one)
        cd = (year - 1859) * 365 + _leaps_between(1858.0, year - 1) + 45
        year = np.where(mjd < cd, year - 1, year)
        cd2 = (year - 1858) * 365 + _leaps_between(1858.0, year) + 45
        year = np.where(mjd >= cd2, year + 1, year)
    cd = (year - 1859) * 365 + _leaps_between(1858.0, year - 1) + 45
    return year + (mjd - cd) / _days_in_year(year)


def gps_week_to_mjd(w):
    return 44244.0 + np.asarray(w, dtype=np.float64) * 7.0


def mjd_to_gps_week(mjd):
    return (np.asarray(mjd, dtype=np.float64) - 44244.0) / 7.0


def yyyymmdd_to_mjd(v):
    v = np.asarray(v, dtype=np.float64)
    year = np.floor(v / 10000)
    month = np.clip(np.floor((v - year * 10000) / 100), 1, 12)
    day = np.floor(v - year * 10000 - month * 100)
    doy = _CUM_DAYS[(month - 1).astype(np.int64)] + day
    doy = doy + np.where(_is_leap(year) & (month > 2), 1.0, 0.0)
    return doy + (year - 1859) * 365 + _leaps_between(1858.0, year - 1) + 13 + 31


def mjd_to_yyyymmdd(mjd):
    """unitconvert.cpp:249-269: round to integer date, then exact
    integer day-count arithmetic.  D(y) = 45 + days(1859..y-1) is the
    loop's date_iter at the start of year y."""
    mjd = np.asarray(mjd, dtype=np.float64)
    date = np.round(mjd)

    def D(year):
        return 45.0 + (year - 1859) * 365 + _leaps_between(1858.0, year - 1)

    # year = max{y : D(y) <= date}; seed + bounded correction
    year = np.floor((date - 45.0) / 365.2425) + 1859
    for _ in range(3):
        year = np.where(D(year) > date, year - 1, year)
        year = np.where(D(year + 1) <= date, year + 1, year)
    doy = date - D(year)  # 0-based day of year
    leap = _is_leap(year)
    month = np.ones_like(year)
    for m in range(2, 13):
        start = _CUM_DAYS[m - 1] + np.where(leap & (m > 2), 1.0, 0.0)
        month = np.where(doy >= start, float(m), month)
    mstart = (_CUM_DAYS[(month - 1).astype(np.int64)]
              + np.where(leap & (month > 2), 1.0, 0.0))
    day = doy - mstart + 1.0
    return year * 10000.0 + month * 100.0 + day


TO_MJD = {
    "mjd": lambda v: np.asarray(v, dtype=np.float64),
    "decimalyear": decimalyear_to_mjd,
    "gps_week": gps_week_to_mjd,
    "yyyymmdd": yyyymmdd_to_mjd,
}

FROM_MJD = {
    "mjd": lambda v: v,
    "decimalyear": mjd_to_decimalyear,
    "gps_week": mjd_to_gps_week,
    "yyyymmdd": mjd_to_yyyymmdd,
}
