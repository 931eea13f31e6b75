"""Horner polynomial transforms (kernels/horner.py): fixtures from
/root/reference/test/unit/gie_self_tests.cpp:812-903."""

import numpy as np
import pytest

from proj_4_spark.proj import compile_projstring

TC32 = ("+proj=horner +ellps=intl +range=500000"
        " +fwd_origin=877605.269066,6125810.306769"
        " +inv_origin=877605.760036,6125811.281773"
        " +deg=4"
        " +fwd_v=6.1258112678e+06,9.9999971567e-01,1.5372750011e-10,"
        "5.9300860915e-15,2.2609497633e-19,4.3188227445e-05,"
        "2.8225130416e-10,7.8740007114e-16,-1.7453997279e-19,"
        "1.6877465415e-10,-1.1234649773e-14,-1.7042333358e-18,"
        "-7.9303467953e-15,-5.2906832535e-19,3.9984284847e-19"
        " +fwd_u=8.7760574982e+05,9.9999752475e-01,2.8817299305e-10,"
        "5.5641310680e-15,-1.5544700949e-18,-4.1357045890e-05,"
        "4.2106213519e-11,2.8525551629e-14,-1.9107771273e-18,"
        "3.3615590093e-10,2.4380247154e-14,-2.0241230315e-18,"
        "1.2429019719e-15,5.3886155968e-19,-1.0167505000e-18"
        " +inv_v=6.1258103208e+06,1.0000002826e+00,-1.5372762184e-10,"
        "-5.9304261011e-15,-2.2612705361e-19,-4.3188331419e-05,"
        "-2.8225549995e-10,-7.8529116371e-16,1.7476576773e-19,"
        "-1.6875687989e-10,1.1236475299e-14,1.7042518057e-18,"
        "7.9300735257e-15,5.2881862699e-19,-3.9990736798e-19"
        " +inv_u=8.7760527928e+05,1.0000024735e+00,-2.8817540032e-10,"
        "-5.5627059451e-15,1.5543637570e-18,4.1357152105e-05,"
        "-4.2114813612e-11,-2.8523713454e-14,1.9109017837e-18,"
        "-3.3616407783e-10,-2.4382678126e-14,2.0245020199e-18,"
        "-1.2441377565e-15,-5.3885232238e-19,1.0167203661e-18")

SB = ("+proj=horner +ellps=intl +range=500000 +tolerance=0.0005"
      " +fwd_origin=4.94690026817276e+05,6.13342113183056e+06"
      " +inv_origin=6.19480258923588e+05,6.13258568148837e+06"
      " +deg=3"
      " +fwd_c=6.13258562111350e+06,6.19480105709997e+05,"
      "9.99378966275206e-01,-2.82153291753490e-02,-2.27089979140026e-10,"
      "-1.77019590701470e-09,1.08522286274070e-14,2.11430298751604e-15"
      " +inv_c=6.13342118787027e+06,4.94690181709311e+05,"
      "9.99824464710368e-01,2.82279070814774e-02,7.66123542220864e-11,"
      "1.78425334628927e-09,-1.05584823306400e-14,-3.32554258683744e-15")


def test_horner_real_roundtrip_tc32():
    """gie_self_tests.cpp:859-873: roundtrip <= 0.01 m."""
    tr = compile_projstring(TC32)
    u = np.array([878354.8539])
    v = np.array([6125305.4245])
    x, y, _, _ = tr.transform(u, v)
    xi, yi, _, _ = tr.transform(x, y, direction="inv")
    assert np.hypot(xi - u, yi - v)[0] <= 0.01


def test_horner_complex_sb_utm32():
    """gie_self_tests.cpp:875-901: fwd/inv <= 0.001 m."""
    tr = compile_projstring(SB)
    x, y, _, _ = tr.transform(np.array([495136.8544]),
                              np.array([6130821.2945]))
    assert np.hypot(x - 620000.0, y - 6130000.0)[0] <= 0.001
    xi, yi, _, _ = tr.transform(np.array([620000.0]),
                                np.array([6130000.0]), direction="inv")
    assert np.hypot(xi - 495136.8544, yi - 6130821.2945)[0] <= 0.001


def test_horner_iterative_inverse_fixed_point():
    """No inv coefficients: the 2x2-Jacobian fixed point
    (horner.cpp:290-345) recovers the input after fwd.  (The
    reference's iterative path range-checks the RAW plane coords, so
    the polynomial here is near-identity about origin 0.)"""
    pstr = ("+proj=horner +deg=2 +range=500000 +tolerance=1e-9 "
            "+fwd_origin=0,0 "
            "+fwd_u=100.0,1.0001,1e-9,2e-8,1.5e-9,1e-12 "
            "+fwd_v=-200.0,0.9999,1e-12,3e-8,2e-9,1.2e-9")
    tr = compile_projstring(pstr)
    u = np.array([10000.0, -250000.0, 400000.0])
    v = np.array([5000.0, 300000.0, -100000.0])
    x, y, _, _ = tr.transform(u, v)
    ui, vi, _, _ = tr.transform(x, y, direction="inv")
    assert np.nanmax(np.hypot(ui - u, vi - v)) < 1e-6


def test_horner_out_of_range_nan():
    tr = compile_projstring(TC32)
    x, y, _, _ = tr.transform(np.array([878354.0 + 5e6]),
                              np.array([6125305.0]))
    assert np.isnan(x[0]) and np.isnan(y[0])


def test_horner_missing_args():
    with pytest.raises(ValueError):
        compile_projstring("+proj=horner +deg=4")
    with pytest.raises(ValueError):
        compile_projstring("+proj=horner +fwd_u=1,2,3 +fwd_v=1,2,3")
