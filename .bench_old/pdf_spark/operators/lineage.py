"""Per-partition lineage/metrics + snapshot resume (north rule).

- ``docs_text_with_lineage``: tags each extraction output row with its
  ``spark_partition_id`` and the input file it came from
  (``input_file_name``), then a JVM-side groupBy produces one lineage row
  per (partition, input_file): doc counts, ok/err split, per-error-code
  counts, min/max url as the offset-range analogue.

- Resume: the sink is an append-only parquet directory keyed by ``url``.
  ``remaining_pages`` anti-joins the input against already-committed urls
  — rerunning after a partial failure processes only the tail. On Iceberg
  this would be a snapshot-scoped MERGE; parquet-dir + anti-join gives the
  same at-least-once-input / exactly-once-output semantics in the sandbox
  (idempotent by url).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tag_lineage_cols(pages: DataFrame) -> DataFrame:
    # partition_id as string so it can ride the UDF passthrough unchanged
    return pages.withColumn("input_file", F.input_file_name()).withColumn(
        "partition_id", F.spark_partition_id().cast("string")
    )


def lineage_rows(docs_text: DataFrame, run_id: str) -> DataFrame:
    """docs_text (+ partition_id, input_file) -> lineage table rows
    (FIXTURES.md §7)."""
    df = docs_text
    if "partition_id" not in df.columns:
        df = df.withColumn("partition_id", F.spark_partition_id())
    if "input_file" not in df.columns:
        df = df.withColumn("input_file", F.lit(""))
    per_code = (
        df.where(F.col("status") == "error")
        .groupBy("partition_id", "input_file", "error_code")
        .count()
    )
    codes_map = per_code.groupBy("partition_id", "input_file").agg(
        F.map_from_entries(
            F.collect_list(F.struct("error_code", "count"))
        ).alias("error_codes")
    )
    base = df.groupBy("partition_id", "input_file").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias("n_err"),
        F.min("url").alias("first_url"),
        F.max("url").alias("last_url"),
    )
    return (
        base.join(codes_map, ["partition_id", "input_file"], "left")
        .withColumn("run_id", F.lit(run_id))
        .withColumn(
            "offset_range", F.concat_ws("..", "first_url", "last_url")
        )
        .select(
            "run_id",
            "partition_id",
            "input_file",
            "offset_range",
            "n_docs",
            "n_ok",
            "n_err",
            "error_codes",
        )
    )


def committed_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, "docs_text")
    try:
        return spark.read.parquet(path).select("url")
    except Exception:
        return None


def remaining_pages(pages: DataFrame, spark: SparkSession, out_dir: str) -> DataFrame:
    """Anti-join input against committed output -> resume from checkpoint."""
    done = committed_urls(spark, out_dir)
    if done is None:
        return pages
    return pages.join(F.broadcast(done) if _small(done) else done, "url", "left_anti")


def _small(df: DataFrame, limit: int = 5_000_000) -> bool:
    # broadcast the committed-url set only when plausibly small; at real
    # scale the committed set is huge and a shuffled anti-join (AQE-planned)
    # is correct.
    try:
        return df.limit(limit + 1).count() <= limit
    except Exception:
        return False


def new_run_id() -> str:
    return f"run-{int(time.time())}-{uuid.uuid4().hex[:8]}"
