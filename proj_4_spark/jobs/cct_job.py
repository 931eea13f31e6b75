"""cct-style batch coordinate transform as a spark-submit job.

The reference's primary batch UX is the ``cct`` filter app
(src/apps/cct.cpp:63-198: read coordinate tuples, apply a proj-string
pipeline, emit transformed tuples with per-line error reporting).
This job is its cluster-scale equivalent: read a parquet table of
coordinate columns, run the compiled pipeline as a chunked pandas UDF,
and write projected parquet with a per-row ``errno`` column (0 = ok;
``coord_transfm_outside_grid``-style failures surface as the NaN
in-band signal, recorded as errno 2049 like
PROJ_ERR_COORD_TRANSFM_OUTSIDE_GRID's class).  The single transform
stage runs under the checkpoint/metrics machinery, so a killed job
resumes without recomputation.

    python -m proj_4_spark.jobs.cct_job \
        --in coords.parquet --out /tmp/cct_out \
        --projstr "+proj=utm +zone=32" --direction fwd
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proj_4_spark.jobs.tiling_job import build_session

# per-row error codes (mirroring the PROJ_ERR_COORD_TRANSFM class,
# proj.h: 2048 + n; a NaN produced by any kernel is the in-band signal)
ERRNO_OK = 0
ERRNO_COORD_TRANSFM = 2049


def transform_frame(df: DataFrame, projstr: str, direction: str = "fwd",
                    x_col: str = "x", y_col: str = "y",
                    z_col: str | None = None,
                    t_col: str | None = None) -> DataFrame:
    """Append x_out/y_out/z_out/errno to ``df`` by running the
    compiled pipeline over (x, y[, z[, t]]) columns."""
    from pyspark.sql.functions import pandas_udf

    from proj_4_spark.functions.geo import run_chunked
    from proj_4_spark.proj import compile_projstring

    tr = compile_projstring(projstr)

    @pandas_udf("struct<x: double, y: double, z: double>")
    def _t(a: pd.Series, b: pd.Series, c: pd.Series,
           d: pd.Series) -> pd.DataFrame:
        def k(xx, yy, zz, tt):
            xo, yo, zo, _ = tr.transform_deg(xx, yy, z=zz, t=tt,
                                             direction=direction)
            return xo, yo, zo

        x, y, z = run_chunked(k, a.to_numpy(np.float64),
                              b.to_numpy(np.float64),
                              c.to_numpy(np.float64),
                              d.to_numpy(np.float64))
        return pd.DataFrame({"x": x, "y": y, "z": z})

    zc = F.col(z_col) if z_col else F.lit(0.0)
    tc = F.col(t_col) if t_col else F.lit(float("inf"))
    st = _t(F.col(x_col).cast("double"), F.col(y_col).cast("double"),
            zc.cast("double"), tc.cast("double"))
    out = (df.withColumn("_o", st)
             .withColumn("x_out", F.col("_o.x"))
             .withColumn("y_out", F.col("_o.y"))
             .withColumn("z_out", F.col("_o.z"))
             .drop("_o"))
    def _bad(c):
        # NaN produced inside the pandas UDF arrives as NULL through
        # Arrow; inputs may carry literal NaN — treat both as missing
        return F.isnull(c) | F.isnan(c)

    had_input = (~_bad(F.col(x_col).cast("double"))
                 & ~_bad(F.col(y_col).cast("double")))
    failed = _bad(F.col("x_out")) | _bad(F.col("y_out"))
    return out.withColumn(
        "errno",
        F.when(had_input & failed, F.lit(ERRNO_COORD_TRANSFM))
         .otherwise(F.lit(ERRNO_OK)))


def run(spark: SparkSession, in_path: str, out_dir: str, projstr: str,
        direction: str = "fwd", x_col: str = "x", y_col: str = "y",
        z_col: str | None = None, t_col: str | None = None) -> dict:
    from proj_4_spark.plans.checkpoint import CheckpointedPipeline

    cp = CheckpointedPipeline(spark, out_dir)
    result = cp.stage(
        "transformed",
        lambda: transform_frame(spark.read.parquet(in_path), projstr,
                                direction, x_col, y_col, z_col, t_col))
    n_rows = result.count()
    n_err = result.where(F.col("errno") != ERRNO_OK).count()
    return {"stages": cp.metrics(),
            "rows": n_rows, "errors": n_err,
            "projstr": projstr, "direction": direction}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--projstr", required=True)
    ap.add_argument("--direction", default="fwd", choices=["fwd", "inv"])
    ap.add_argument("--x-col", default="x")
    ap.add_argument("--y-col", default="y")
    ap.add_argument("--z-col", default=None)
    ap.add_argument("--t-col", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    spark = build_session(args.master)
    try:
        summary = run(spark, args.in_path, args.out, args.projstr,
                      args.direction, args.x_col, args.y_col,
                      args.z_col, args.t_col)
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
