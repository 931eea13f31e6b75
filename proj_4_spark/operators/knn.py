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

- ``knn_cell_pruned``: scale path — candidates restricted to the grid
  cells within a Chebyshev ring of each query's cell (broadcast
  equi-join on the cell key), widening the ring until every query has
  k candidates inside the guaranteed in-ring radius.  EXACT: the tests
  assert equality with the brute-force oracle, including a
  cell-boundary query where single-cell pruning is provably wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


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
                    grid_deg: float = 2.0, lon: str = "lon", lat: str = "lat",
                    id_col: str = "doc_id", max_ring: int | None = None
                    ) -> DataFrame:
    """Scale path: EXACT kNN with cell-pruned candidates and a
    widening ring.

    Points are bucketed once onto a ``grid_deg`` lon/lat grid
    (longitude cells wrap modulo 360).  Per ring r the candidate set is
    the points in all grid cells within Chebyshev distance r of each
    query's cell — a broadcast equi-join on the cell key, so the big
    side never shuffles.  The ring widens until every query has >= k
    candidates whose k-th distance is within the guaranteed in-ring
    radius (the distance from the query to the covered-square
    boundary), which makes the result provably equal to brute force.
    The per-ring driver check collects only #queries rows.
    """
    g = float(grid_deg)
    nx = max(int(round(360.0 / g)), 1)
    pts = (points.withColumn(
               "_ix", F.floor((F.col(lon) + 180.0) / g).cast("long") % nx)
                 .withColumn("_iy", F.floor((F.col(lat) + 90.0) / g)
                             .cast("long")))
    qrows = queries.select("query_id", "q_lon", "q_lat").collect()
    spark = points.sparkSession
    if max_ring is None:
        max_ring = int(180.0 / g) + 1

    def cover_df(r: int):
        rows = []
        for q in qrows:
            qix = int((q["q_lon"] + 180.0) // g) % nx
            qiy = int((q["q_lat"] + 90.0) // g)
            for dx in range(-r, r + 1):
                for dy in range(-r, r + 1):
                    rows.append((q["query_id"], (qix + dx) % nx, qiy + dy))
        return spark.createDataFrame(
            rows, "query_id long, _ix long, _iy long")

    d2 = sq_degree_dist(F.col(lon), F.col(lat),
                        F.col("q_lon"), F.col("q_lat")).alias("dist2")
    qdf = queries.select("query_id", "q_lon", "q_lat")
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(),
                                              F.col(id_col).asc())
    for r in range(1, max_ring + 1):
        cand = (pts.join(broadcast(cover_df(r)), ["_ix", "_iy"])
                   .join(broadcast(qdf), "query_id")
                   .select("query_id", id_col, d2))
        ranked = (cand.withColumn("rank", F.row_number().over(w))
                      .where(F.col("rank") <= k))
        if r >= max_ring:
            return ranked.select("query_id", "rank", id_col, "dist2")
        # exactness check: k-th distance within the in-ring radius
        kth = {row["query_id"]: (row["n"], row["kd"]) for row in
               ranked.groupBy("query_id")
                     .agg(F.count("*").alias("n"), F.max("dist2").alias("kd"))
                     .collect()}
        ok = True
        for q in qrows:
            n_kd = kth.get(q["query_id"])
            if n_kd is None or n_kd[0] < k:
                ok = False
                break
            qix = int((q["q_lon"] + 180.0) // g) % nx
            qiy = int((q["q_lat"] + 90.0) // g)
            qlx = (q["q_lon"] + 180.0) - qix * g
            qly = (q["q_lat"] + 90.0) - qiy * g
            bound = min(qlx + r * g, (r + 1) * g - qlx,
                        qly + r * g, (r + 1) * g - qly)
            if n_kd[1] > bound * bound:
                ok = False
                break
        if ok:
            return ranked.select("query_id", "rank", id_col, "dist2")
    raise AssertionError("unreachable")
