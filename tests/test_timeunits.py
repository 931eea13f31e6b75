"""unitconvert time conversions — golden values transcribed from
/root/reference/test/unit/gie_self_tests.cpp:759-810."""

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring


def _t(projstr, t_in, direction="fwd"):
    tr = compile_projstring(projstr)
    z = np.zeros(len(np.atleast_1d(t_in)))
    x, y, zz, t = tr.transform(z, z, z, np.asarray(t_in, dtype=np.float64),
                               direction=direction)
    return t


ROUNDTRIP = [
    ("+proj=unitconvert +t_in=decimalyear +t_out=decimalyear", 2004.25),
    ("+proj=unitconvert +t_in=gps_week +t_out=gps_week", 1782.0),
    ("+proj=unitconvert +t_in=mjd +t_out=mjd", 57390.0),
    ("+proj=unitconvert +t_in=yyyymmdd +t_out=yyyymmdd", 20170131.0),
]


@pytest.mark.parametrize("ps,val", ROUNDTRIP)
def test_time_identity(ps, val):
    out = _t(ps, [val])
    assert abs(out[0] - val) < 1e-6
    back = _t(ps, out, direction="inv")
    assert abs(back[0] - val) < 1e-6


def test_gps_week_to_decimalyear():
    # gie_self_tests.cpp:769-778
    out = _t("+proj=unitconvert +t_in=gps_week +t_out=decimalyear",
             [1877.71428])
    assert abs(out[0] - 2016.0) < 1e-6
    back = _t("+proj=unitconvert +t_in=gps_week +t_out=decimalyear",
              out, direction="inv")
    assert abs(back[0] - 1877.71428) < 1e-6


@pytest.mark.parametrize("dy,ymd", [
    (2022.0027, 20220102), (1990.0, 19900101),
    (2004.1612, 20040229), (1899.999, 19000101),
])
def test_decimalyear_to_yyyymmdd(dy, ymd):
    out = _t("+proj=unitconvert +t_in=decimalyear +t_out=yyyymmdd", [dy])
    assert abs(out[0] - ymd) < 1e-6


@pytest.mark.parametrize("ymd,dy", [
    (20220102, 2022.0027397), (19900101, 1990.0),
    (20040229, 2004.1612022), (18991231, 1899.9972603),
])
def test_yyyymmdd_to_decimalyear(ymd, dy):
    out = _t("+proj=unitconvert +t_in=yyyymmdd +t_out=decimalyear", [ymd])
    assert abs(out[0] - dy) < 1e-6
