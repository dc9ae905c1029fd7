"""Skew handling: byte-length bucketing + salted repartition (north rule).

Why it matters at 100 TB: AQE can split skewed *shuffle partitions* but can
never split a single row — a 500 MB PDF in a 1 MB-median corpus (SURVEY.md
§4.2) must be (a) spread away from other giants and (b) ultimately bounded
by the per-doc byte cap. Strategy:

1. ``size_bucket`` = floor(log2(len(html))) — cheap JVM-side expression.
2. ``salt`` = xxhash64(url) mod N — uniform, deterministic, no driver state.
3. ``repartition(N, salt, size_bucket)`` — giants of the same bucket land
   on *different* salts, so no partition accumulates several of them; the
   hash on (salt, bucket) keeps each output partition a mixed diet.

This single round-robin-ish shuffle costs one pass over the payload bytes.
For the fused extraction path it is OPTIONAL (the map is already
embarrassingly parallel and parquet input splits are size-balanced); it is
ON by default for corpora with pathological size skew, and `prepare_pages`
is a no-op when ``salt_partitions`` is None/0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_size_bucket(pages: DataFrame) -> DataFrame:
    return pages.withColumn(
        "size_bucket",
        F.floor(F.log2(F.greatest(F.length("html"), F.lit(1)))).cast("int"),
    )


def prepare_pages(pages: DataFrame, salt_partitions: int | None = None) -> DataFrame:
    """Optional salted repartition for size-skewed corpora."""
    if not salt_partitions:
        return pages
    df = with_size_bucket(pages)
    df = df.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(salt_partitions)).cast("int")
    )
    return df.repartition(salt_partitions, "salt", "size_bucket").drop(
        "salt", "size_bucket"
    )
