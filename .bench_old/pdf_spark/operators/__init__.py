"""Spark pipeline stages: partitioning, extraction, assembly, lineage."""
