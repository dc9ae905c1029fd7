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
   placement: a row_number over their DISTINCT urls, mod N — no partition
   holds a second giant until every partition holds one, which uniform
   hashing cannot promise (birthday bound). The window runs on a
   projected url-only frame (giants are rare by premise, and payload
   bytes must not funnel through the single-partition window), then a
   broadcast join maps the assignment back. The index is built on
   DISTINCT urls so a re-crawled duplicate url never multiplies rows
   through the equi-join.
4. The exchange is a plain hash ``repartition(N, __placed)`` — but on
   PREIMAGE values: a tiny driver-side probe finds, for each target
   partition t, an integer r_t with ``pmod(hash(r_t), N) == t`` (F.hash
   is the same Murmur3Hash the hash exchange applies), and ``__part`` is
   mapped through the preimage array. Rows therefore land EXACTLY on
   their assigned partition with no range-exchange sampling job over the
   payload plan, and no re-clumping (hashing a dense 0..N-1 key directly
   would collide ~1/e of the targets).

Cost at scale: the giant-index pre-pass reads (url, length(html)) once in
addition to the main scan — on Iceberg, replace it with a stats/length
column or file-size metadata so only urls are read. The payload itself
moves through exactly ONE exchange, with no sampling pass. For the fused
extraction path this operator is OPTIONAL (the map is already
embarrassingly parallel and parquet input splits are size-balanced); it
is ON for corpora with pathological size skew, and `prepare_pages` is a
no-op when ``salt_partitions`` is None/0.
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


def _hash_preimages(spark, n: int) -> list[int]:
    """For each target partition t in [0, n): the first int r with
    ``pmod(hash(r), n) == t``, computed with the SAME Murmur3Hash
    expression the hash exchange uses. One tiny driver job (a few
    thousand ints, no payload columns); coverage of all n residues is
    guaranteed long before the probe range runs out in practice, and
    verified before use."""
    probe = 64 * max(n, 4)
    rows = (
        spark.range(probe)
        .select(
            F.col("id").cast("int").alias("r"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("t"),
        )
        .groupBy("t")
        .agg(F.min("r").alias("r"))
        .collect()
    )
    by_t = {row["t"]: row["r"] for row in rows}
    if len(by_t) < n:  # astronomically unlikely; fail loud, not wrong
        raise ValueError(f"hash preimage probe covered {len(by_t)}/{n} targets")
    return [by_t[t] for t in range(n)]


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
    # giants: deterministic round-robin over DISTINCT urls (dup-safe join)
    giants_idx = (
        df.where(F.col("size_bucket") >= giant_bucket)
        .select("url")
        .distinct()
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
    preimages = _hash_preimages(pages.sparkSession, salt_partitions)
    placed = F.element_at(
        F.array(*[F.lit(r) for r in preimages]), F.col("__part") + 1
    )
    return (
        df.withColumn("__placed", placed.cast("int"))
        .repartition(salt_partitions, "__placed")
        .drop("__part", "__placed", "__g", "size_bucket")
    )
