"""Structured Streaming ingestion: readStream over the pages table ->
the SAME batched extraction UDF -> append sink (SURVEY.md §2.5 streaming
row: "the batch UDF is reusable unchanged — this is the idiomatic Spark
dividend").

Shapes provided:

- ``stream_extract``: file-source stream over a pages parquet directory,
  fused extraction per micro-batch, append to parquet + checkpoint dir
  (exactly-once via the sink's write-ahead commit log). ``Trigger.
  AvailableNow`` drains existing data and stops — the test/backfill mode;
  omit for continuous tailing.

- ``stream_event_counts``: watermarked tumbling-window aggregation over
  ``warc_ts`` (late data beyond the watermark dropped) — the classic
  stateful-streaming operator, batch twin is ``qr22`` in the relational
  matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pdf_spark.operators.extract import extract_docs_text

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_pages_stream(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the streaming extraction; returns the StreamingQuery."""
    stream = read_pages_stream(spark, pages_dir)
    docs = extract_docs_text(stream)
    writer = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_counts(
    spark: SparkSession, pages_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window doc counts per lang (unstarted DF)."""
    stream = read_pages_stream(spark, pages_dir)
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("win"), "lang")
        .agg(F.count("*").alias("n_docs"))
        .select("win.start", "win.end", "lang", "n_docs")
    )


def stream_dedup_exact(
    spark: SparkSession, pages_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup on the content fingerprint within the
    watermark horizon (``dropDuplicatesWithinWatermark``): a re-crawled /
    mirrored page arriving inside the horizon is dropped; state older than
    the watermark is evicted, so dedup state stays bounded at any corpus
    rate — the streaming twin of qt01. Returns the unstarted DataFrame."""
    stream = read_pages_stream(spark, pages_dir)
    return (
        stream.withColumn("fingerprint", F.md5(F.col("html")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
        .select("url", "warc_ts", "fingerprint")
    )


def stream_lang_running_stats(spark: SparkSession, pages_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    running per-``lang`` document count + byte total, carried across
    micro-batches in explicit group state (the shape any bespoke stateful
    extraction-side aggregator — e.g. per-domain crawl budgets or
    dedup-bloom counters — takes at 100 TB).

    Returns the unstarted stateful DataFrame; start with
    ``.writeStream.outputMode("update")``.
    """
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = read_pages_stream(spark, pages_dir).select(
        "lang", F.length("html").alias("nbytes")
    )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_docs, total_bytes = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_docs += len(pdf)
            total_bytes += int(pdf["nbytes"].fillna(0).sum())
        state.update((n_docs, total_bytes))
        yield pd.DataFrame(
            {"lang": [key[0]], "n_docs": [n_docs], "total_bytes": [total_bytes]}
        )

    return stream.groupBy("lang").applyInPandasWithState(
        update,
        outputStructType="lang string, n_docs long, total_bytes long",
        stateStructType="n_docs long, total_bytes long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
