"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction roundtrip on sf0.001: synthesize the
Common-Crawl-style pages corpus from ``documents.text`` (distributed
mapInPandas generation), run the fused extraction pipeline, and return
docs_text joined with the expected text.

``queries()`` / ``oracle_sql()`` — the operator matrix from
``pdf_spark.functions`` (relational / text-dedup / similarity / multimodal
/ extraction), each Spark query paired with DuckDB-runnable ANSI SQL where
SQL can express it (rows-only checks otherwise).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:  # driver may import us from anywhere
    sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from pdf_spark.gen.corpus import expected_error_col, pages_from_documents
    from pdf_spark.operators.extract import extract_docs_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs)
    extracted = extract_docs_text(pages)
    expected = pages.select(
        "url",
        F.col("text").alias("expected_text"),
        "lang",
        expected_error_col(F.col("url")).alias("expected_error"),
    )
    return (
        extracted.join(expected, "url")
        .withColumn(
            "match",
            # Corrupt payloads (generator emits text=NULL) must surface as
            # error rows with the exact error code the corruption implies
            # (re-derived from the deterministic generator mapping, since the
            # 5-column pages shape can't carry it); everything else must
            # byte-match its expected text.
            F.when(
                F.col("expected_text").isNull(),
                (F.col("status") == "error")
                & (F.col("error_code") == F.col("expected_error")),
            ).otherwise(
                (F.col("status") == "ok")
                & (F.col("text") == F.col("expected_text"))
            ),
        )
        .select("url", "status", "error_code", "match", "n_pages", "n_spans", "lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_spark.functions.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from pdf_spark.functions.registry import all_oracles

    return all_oracles()
