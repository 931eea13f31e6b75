"""geod-style batch job (jobs/geod_job.py): inverse/direct solutions
match the kernel, geodtest.c golden line, checkpoint resumes."""

import numpy as np
import pytest

from proj_4_spark.jobs import geod_job
from proj_4_spark.kernels import geodesic as k_geod


@pytest.fixture()
def pairs_parquet(spark, tmp_path):
    path = str(tmp_path / "pairs.parquet")
    # first row = geodtest.c:43-75 testcase 0 endpoints
    rows = [(0, 35.60777, -139.44815, -11.17491, -69.95921),
            (1, 48.8567, 2.3508, 35.6895, 139.6917),
            (2, 0.0, 0.0, 0.0, 90.0)]
    spark.createDataFrame(
        rows, "id long, lat1 double, lon1 double, lat2 double, lon2 double"
    ).write.parquet(path)
    return path


def test_inverse_matches_kernel(spark, tmp_path, pairs_parquet):
    out = str(tmp_path / "out")
    summary = geod_job.run(spark, pairs_parquet, out, "inverse")
    assert summary["rows"] == 3
    got = {r["id"]: r for r in
           spark.read.parquet(out + "/solved").collect()}
    g = k_geod.Geodesic.init(geod_job.WGS84_A, 1.0 / geod_job.WGS84_RF)
    s12, azi1, azi2, _ = k_geod.inverse(
        g, np.array([35.60777]), np.array([-139.44815]),
        np.array([-11.17491]), np.array([-69.95921]))
    assert got[0]["s12"] == pytest.approx(float(s12[0]), abs=1e-6)
    assert got[0]["azi1"] == pytest.approx(float(azi1[0]), abs=1e-9)
    assert got[0]["azi2"] == pytest.approx(float(azi2[0]), abs=1e-9)
    # geodtest.c:44-47 testcase 0
    assert got[0]["s12"] == pytest.approx(8935244.5604818305, abs=1e-3)
    assert got[0]["azi1"] == pytest.approx(111.098748429560326, abs=1e-6)
    assert got[0]["azi2"] == pytest.approx(129.289270889708762, abs=1e-6)


def test_direct_roundtrips_inverse(spark, tmp_path, pairs_parquet):
    inv_out = str(tmp_path / "inv")
    geod_job.run(spark, pairs_parquet, inv_out, "inverse")
    direct_in = str(tmp_path / "starts.parquet")
    (spark.read.parquet(inv_out + "/solved")
          .select("id", "lat1", "lon1", "azi1", "s12")
          .write.parquet(direct_in))
    out = str(tmp_path / "dir")
    geod_job.run(spark, direct_in, out, "direct")
    got = {r["id"]: r for r in
           spark.read.parquet(out + "/solved").collect()}
    assert got[1]["lat2"] == pytest.approx(35.6895, abs=1e-8)
    assert got[1]["lon2"] == pytest.approx(139.6917, abs=1e-8)
