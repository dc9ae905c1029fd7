"""SparkSession factory tuned for the extraction workload.

Sandbox runs on ``local[N]`` (single JVM); the same config block is what we
would ship to a 1000-executor cluster via ``spark-submit --py-files`` — all
knobs are per-executor-safe:

- Arrow enabled end-to-end (the only Python<->JVM traffic is columnar);
- ``maxRecordsPerBatch`` kept small (64): one Arrow batch must never hold
  two oversized PDFs (SURVEY.md §7.3 hard part #3) — batch memory is
  bounded by ``batch_rows × max_doc_bytes``;
- AQE on (runtime coalescing + skew-join splitting for the relational ops);
- shuffle partitions default to cores (local) — on a real cluster this is
  set to 2-3× total cores by the submitter.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 64


def spark_session(
    app: str = "pdf-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        # split sizing, re-measured after the round-3 parse speedups
        # (~2.5 MB/s/core): 64 MB splits are ~25 s tasks — granular enough
        # for wave balancing at any cluster width, while the per-task
        # overhead (~10-30 ms python-runner setup) stays negligible. The
        # old 8 MB value quadrupled task count for the same bytes and cost
        # ~17% wall on the measured corpus. Under-utilization is
        # impossible: spark.sql.files.minPartitionNum (defaults to
        # spark.default.parallelism) floors the split count at the
        # cluster's core count regardless of this cap.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "64m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
