"""Spark-side job layer: session config, extraction UDF wrappers,
skew-aware repartitioning, checkpoint/lineage."""
