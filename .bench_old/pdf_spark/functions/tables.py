"""Table loading + temp-view registration for the query matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create temp views for spark.sql-based queries. Re-registers every
    call: createOrReplaceTempView is cheap, and a session-conf "already
    registered" marker would pin views to a stale file listing after the
    sf_dir parquet is rewritten (FileNotFoundException with no in-session
    recovery)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
