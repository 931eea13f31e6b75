"""Embedding similarity search.

- cosine_topk: exact brute-force top-k for a broadcast query set —
  the correctness baseline.  Dot products run in a vectorized pandas
  UDF (one BLAS matmul per Arrow batch against the broadcast query
  matrix) — the scalable layout for 10^12 x small-k.
- hyperplane_bucket: SimHash-for-vectors LSH — sign bits against B
  fixed random hyperplanes (deterministic seed), as a pure Catalyst
  expression; near-dup pairs are found within equal buckets only
  (candidate generation), then exact-cosine-verified.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def hyperplanes(dim: int = 64, n: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (fixed literal values —
    shared verbatim by engine and oracle)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n, dim)).round(6)


def dot_expr(vec: Column, w: list[float]) -> Column:
    """<vec, w> as a Catalyst aggregate over the array column."""
    return F.aggregate(
        F.zip_with(vec, F.array(*[F.lit(float(x)) for x in w]),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)


def bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """LSH bucket id: sign bit per hyperplane."""
    acc = F.lit(0)
    for k, w in enumerate(planes):
        acc = acc + F.when(dot_expr(vec, list(w)) > 0,
                           F.lit(1 << k)).otherwise(F.lit(0))
    return acc


def cosine_topk(vectors: DataFrame, query_ids: list[int], k: int,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int = 9) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding
    self).  Ranking key is the ROUNDED similarity (+ id tie-break) so
    the result is invariant to FP summation order."""
    spark = vectors.sparkSession
    qrows = (vectors.where(F.col(id_col).isin(query_ids))
                    .select(F.col(id_col).alias("query_id"), vec_col)
                    .collect())
    qmat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    @pandas_udf("array<double>")
    def _sims(vec: pd.Series) -> pd.Series:
        m = np.array(vec.tolist(), dtype=np.float64)
        nrm = np.sqrt((m * m).sum(axis=1))
        sims = (m @ qmat.T) / np.outer(nrm, qnorm)
        return pd.Series(list(sims))

    qid_arr = F.array(*[F.lit(int(q)) for q in qids.tolist()])
    sims = (vectors.select(id_col, _sims(F.col(vec_col)).alias("s"))
                   .select(id_col,
                           F.explode(F.arrays_zip(qid_arr.alias("query_id"),
                                                  F.col("s").alias("sim")))
                           .alias("z"))
                   .select(F.col("z.query_id").cast("long").alias("query_id"),
                           F.col(id_col),
                           F.round(F.col("z.sim"), round_to).alias("sim"))
                   .where(F.col("query_id") != F.col(id_col)))
    from pyspark.sql import Window

    w = (Window.partitionBy("query_id")
         .orderBy(F.col("sim").desc(), F.col(id_col).asc()))
    return (sims.withColumn("rank", F.row_number().over(w).cast("long"))
                .where(F.col("rank") <= k)
                .select("query_id", "rank", id_col, "sim"))


def neardup_pairs(vectors: DataFrame, threshold: float = 0.9,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  planes: np.ndarray | None = None,
                  round_to: int = 9) -> DataFrame:
    """Near-duplicate pairs inside equal LSH buckets with rounded
    cosine >= threshold (bucket-candidate + exact verify)."""
    planes = hyperplanes() if planes is None else planes
    b = vectors.select(id_col, vec_col,
                       bucket_expr(F.col(vec_col), planes).alias("bucket"))
    b = b.persist()  # avoid recomputing 8 dot products per join side
    a, c = b.alias("a"), b.alias("b")
    pairs = (a.join(c, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
              .select(F.col(f"a.{id_col}").alias("vec_a"),
                      F.col(f"b.{id_col}").alias("vec_b"),
                      F.col(f"a.{vec_col}").alias("va"),
                      F.col(f"b.{vec_col}").alias("vb")))

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.array(va.tolist(), dtype=np.float64)
        mb = np.array(vb.tolist(), dtype=np.float64)
        num = (ma * mb).sum(axis=1)
        den = np.sqrt((ma * ma).sum(axis=1)) * np.sqrt((mb * mb).sum(axis=1))
        return pd.Series(num / den)

    return (pairs.withColumn("sim", F.round(_cos("va", "vb"), round_to))
                 .where(F.col("sim") >= threshold)
                 .select("vec_a", "vec_b", "sim"))
