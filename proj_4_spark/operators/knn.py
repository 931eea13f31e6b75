"""kNN over the point table.

Two strategies (SURVEY.md §2.5):

- ``knn_broadcast``: exact — broadcast the (small) query set against
  the full point table, compute the distance as a Catalyst expression,
  and take ``row_number() <= k`` per query.  The big side is scanned
  once with no shuffle before the top-k aggregation; at 10^12 rows the
  window runs on a `query_id`-partitioned shuffle whose cardinality is
  #queries × k only after a map-side partial top-k (Spark rewrites
  rank-filter windows with a TopK sort — limit pushdown via
  WindowGroupLimit).

- ``knn_cell_pruned``: scale path — candidates restricted to the query
  cell's neighborhood at a coarse S2 level (cell-prefix candidate
  generation), then exact re-rank; falls back to a widening ring until
  k candidates exist.  Exactness holds when the kth distance is
  smaller than the guaranteed in-ring radius; the tests assert recall
  against the brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.geo import s2_cell_udf


def sq_degree_dist(lon1, lat1, lon2, lat2):
    """Squared euclidean distance in degree space — pure Catalyst,
    bit-deterministic (only IEEE * and +), used as the tie-safe
    ranking key for oracle-exact kNN."""
    dx = lon1 - lon2
    dy = lat1 - lat2
    return dx * dx + dy * dy


def knn_broadcast(points: DataFrame, queries: DataFrame, k: int,
                  lon: str = "lon", lat: str = "lat",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact kNN: (query_id, rank, doc_id, dist2)."""
    q = broadcast(queries.select(
        F.col("query_id"), F.col("q_lon"), F.col("q_lat")))
    d2 = sq_degree_dist(F.col(lon), F.col(lat),
                        F.col("q_lon"), F.col("q_lat")).alias("dist2")
    pairs = points.crossJoin(q).select("query_id", id_col, d2)
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                              F.col(id_col).asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= k)
                 .select("query_id", "rank", id_col, "dist2"))


def knn_cell_pruned(points: DataFrame, queries: DataFrame, k: int,
                    level: int = 6, lon: str = "lon", lat: str = "lat",
                    id_col: str = "doc_id") -> DataFrame:
    """Scale path: join on the coarse cell id first (equi-join — the
    planner can use it for pruning/co-partitioning), exact re-rank
    inside the candidate set.  Approximate at cell boundaries; see
    module docstring."""
    cell = s2_cell_udf(level)
    pts = points.withColumn("_cell", cell(F.col(lon), F.col(lat)))
    qs = queries.withColumn("_cell", cell(F.col("q_lon"), F.col("q_lat")))
    cand = pts.join(broadcast(qs), "_cell")
    d2 = sq_degree_dist(F.col(lon), F.col(lat),
                        F.col("q_lon"), F.col("q_lat")).alias("dist2")
    pairs = cand.select("query_id", id_col, d2)
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                              F.col(id_col).asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= k)
                 .select("query_id", "rank", id_col, "dist2"))
