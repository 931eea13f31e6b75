"""Run the local replica of the driver's correctness gate over EVERY
registered query at sf0.01, in driver order. Prints one line per query
and a final summary; exit code 1 if any query mismatches.

Usage: python scripts/parity_all.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from proj_4_spark import queries as Q
from proj_4_spark.plans.parity import check_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("parity-all")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in Q.queries() if not only or n in only]
    bad = []
    for name in names:
        t0 = time.time()
        try:
            problems = check_query(spark, name, sf_dir)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        dt = time.time() - t0
        status = "ok" if not problems else "FAIL"
        print(f"{status:4s} {name:28s} {dt:6.2f}s" + ("" if not problems else f"  {problems[0][:160]}"), flush=True)
        if problems:
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} green" + (f"; FAILING: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
