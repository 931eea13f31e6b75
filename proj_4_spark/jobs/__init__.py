"""End-to-end jobs (spark-submit entry points)."""
