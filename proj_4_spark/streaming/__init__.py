"""Structured Streaming operators (windowed aggregation, stateful)."""
