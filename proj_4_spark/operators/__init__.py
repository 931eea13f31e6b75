"""Relational/spatial operators built on Spark DataFrame primitives:
point-in-polygon joins, kNN, raster<->vector aggregation, dedup,
similarity search, text analysis."""
