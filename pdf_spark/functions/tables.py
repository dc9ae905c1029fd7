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
    """Create temp views for spark.sql-based queries (idempotent)."""
    marker = f"_pdfspark_views::{sf_dir}"
    if spark.conf.get("spark.pdfspark.views", "") == marker:
        return
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.conf.set("spark.pdfspark.views", marker)
