"""Sharded JSONL training-data sink + source.

The delivery format LLM training pipelines actually consume (one JSON
object per line, gzip shards — the layout of The Pile / RedPajama /
Dolma releases). Mirrors the WET sink's scale shape (`warc.py::write_wet`):

- one shard per partition, each task streams its own ``.jsonl.gz`` —
  no shuffle (unless the caller asks for resharding), no driver data
  movement; the returned manifest is O(partitions);
- rows sorted within (never across) partitions and serialized JVM-side
  via ``DataFrame.toJSON`` with a canonical column order, so a given
  input partitioning yields byte-identical shards on every run —
  re-running a failed job overwrites shards with identical bytes
  (idempotent by content, the property object-store retries need);
- the Python task never parses a row: it gzips JVM-produced lines
  (``mtime=0`` so the gzip container is deterministic too).

``read_jsonl`` is the matching source: ``spark.read.json`` over the
shard directory (Spark decompresses ``.gz`` natively; one shard = one
input split, the same parallelism grain the writer produced).
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import DataFrame, SparkSession


def write_jsonl(
    df: DataFrame,
    out_dir: str,
    sort_cols: list[str] | None = None,
    num_shards: int | None = None,
) -> list[tuple[str, int]]:
    """Write ``df`` as gzip JSONL shards under ``out_dir``.

    ``num_shards`` reshards first — that is one explicit round-robin
    shuffle, only worth paying to hit a target shard size; by default
    the input partitioning (usually the narrow extract stage's) is kept.
    Returns ``[(path, n_records)]``, one entry per non-empty shard.
    """
    os.makedirs(out_dir, exist_ok=True)
    if num_shards is not None:
        df = df.repartition(num_shards)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)

    def dump(it):
        from pyspark import TaskContext

        lines = list(it)
        if not lines:
            return iter([])
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"shard-{pid:05d}.jsonl.gz")
        with open(path, "wb") as f:
            with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                for line in lines:
                    gz.write(line.encode("utf-8"))
                    gz.write(b"\n")
        return iter([(path, len(lines))])

    return df.toJSON().mapPartitions(dump).collect()


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a shard directory written by :func:`write_jsonl`.

    Pass ``schema`` in production — schema inference is an extra full
    pass over 10^12 rows; the writer side always knows the schema.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(f"{path}/*.jsonl.gz")
