"""Skew handling: byte-length bucketing + explicit giant placement (north rule).

Why it matters at 100 TB: AQE can split skewed *shuffle partitions* but can
never split a single row — a 500 MB PDF in a 1 MB-median corpus (SURVEY.md
§4.2) must be (a) spread away from other giants and (b) ultimately bounded
by the per-doc byte cap. Strategy:

1. ``size_bucket`` = floor(log2(len(html))) — cheap JVM-side expression.
2. Normal docs take ``__part = xxhash64(url) mod N`` over the FULL 64-bit
   hash domain. (The earlier scheme pre-modded the salt to N values and
   then let the exchange hash those N values again — composing a hash
   over a tiny domain re-clumps: with N=8, two giants with distinct salts
   2 and 4 still landed in the same output partition. Never feed a
   small-cardinality salt to a hash exchange.)
3. Giant docs (``size_bucket >= giant_bucket``) get EXACT round-robin
   placement: a row_number over their urls, mod N — no partition holds a
   second giant until every partition holds one, which uniform hashing
   cannot promise (birthday bound). The window runs on a projected
   url-only frame (giants are rare by premise, and payload bytes must not
   funnel through the single-partition window), then a broadcast join
   maps the assignment back.
4. One ``repartitionByRange(N, __part)`` moves the payloads: the keys are
   dense integers 0..N-1, so the sampled range boundaries are
   near-bijective, honoring the explicit placement. (A hash repartition
   on ``__part`` would re-clump exactly like the old salt.)

This single shuffle costs one pass over the payload bytes. For the fused
extraction path it is OPTIONAL (the map is already embarrassingly parallel
and parquet input splits are size-balanced); it is ON for corpora with
pathological size skew, and `prepare_pages` is a no-op when
``salt_partitions`` is None/0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GIANT_BUCKET = 22  # 2^22 = 4 MiB: docs at or above this bucket are "giants"


def with_size_bucket(pages: DataFrame) -> DataFrame:
    return pages.withColumn(
        "size_bucket",
        F.floor(F.log2(F.greatest(F.length("html"), F.lit(1)))).cast("int"),
    )


def prepare_pages(
    pages: DataFrame,
    salt_partitions: int | None = None,
    giant_bucket: int = GIANT_BUCKET,
) -> DataFrame:
    """Optional skew-spreading repartition for size-skewed corpora."""
    if not salt_partitions:
        return pages
    df = with_size_bucket(pages)
    df = df.withColumn(
        "__part",
        F.pmod(F.xxhash64("url"), F.lit(salt_partitions)).cast("int"),
    )
    # giants: deterministic round-robin assignment computed over urls only
    giants_idx = (
        df.where(F.col("size_bucket") >= giant_bucket)
        .select("url")
        .withColumn("__g", F.row_number().over(Window.orderBy("url")))
    )
    df = df.join(F.broadcast(giants_idx), "url", "left")
    df = df.withColumn(
        "__part",
        F.when(
            F.col("__g").isNotNull(),
            F.pmod(F.col("__g") - 1, F.lit(salt_partitions)),
        )
        .otherwise(F.col("__part"))
        .cast("int"),
    )
    return df.repartitionByRange(salt_partitions, "__part").drop(
        "__part", "__g", "size_bucket"
    )
