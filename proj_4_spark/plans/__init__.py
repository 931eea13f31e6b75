"""Driver-side planning: oracle SQL generation, salting policy,
checkpointing, lineage metrics."""
