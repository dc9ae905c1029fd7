"""Container/document-format queries: ZIP inventory + OOXML/EPUB/EML/RTF
text extraction — the non-PDF, non-HTML half of a crawl's document tier.

Same contract as every other functions module: deterministic fixtures
synthesized per ``doc_id`` INSIDE the mapInPandas batch (honest writers
— stdlib ``zipfile`` builds real containers; the readers under test in
``core/`` share no code with them), outputs reproducible by a DuckDB
oracle as pure ``doc_id`` arithmetic, zero per-row Python at the Spark
plan level (one Arrow batch in, one batch of rows out).

Reference parity note: the C reference (someone13574/pdf) reads bare
PDFs only — this module is net-new surface in the E19/E23 tradition
(HTML tier, WARC source).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_spark.functions.tables import load

QUERIES = {}
ORACLE = {}

# -- qm37: ZIP container inventory (core/zipread.py) --------------------------
#
# The audit that routes a container blob: member/dir counts, claimed
# inflation totals, encryption, and the zip-bomb flag — all at central-
# directory cost, no member inflated. fam = doc_id % 4: stored office-ish
# tree / deflated text pair / bomb claim (200k zeros, ratio >>50) /
# not-a-zip (PNG routes is_zip=0 + NULLs).

_ZIP_INV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("is_zip", IntegerType()),
        StructField("n_entries", LongType()),
        StructField("n_dirs", LongType()),
        StructField("total_uncomp", LongType()),
        StructField("n_deflated", LongType()),
        StructField("has_encrypted", IntegerType()),
        StructField("bomb_suspect", IntegerType()),
    ]
)


def _qm37_make_zip(doc_id: int) -> bytes:
    import io
    import zipfile

    from pdf_spark.core.imaging import encode_png

    i = int(doc_id)
    fam = i % 4
    if fam == 3:  # not a container at all
        return encode_png(2, 2, 1, bytes((i + k) % 256 for k in range(4)))
    buf = io.BytesIO()
    if fam == 0:  # stored office-ish tree with a directory entry
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
            z.writestr("a.txt", b"x" * (10 + i % 5))
            z.writestr("docs/", b"")
            z.writestr("docs/b.txt", b"y" * 20)
    elif fam == 1:  # two deflated text members
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("p1.txt", bytes(32 + (i + k) % 64 for k in range(40)))
            z.writestr("p2.txt", bytes(32 + (i * 3 + k) % 64 for k in range(60)))
    else:  # fam == 2: bomb CLAIM — 200k zeros deflate ~500:1
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("z.bin", b"\x00" * 200_000)
    return buf.getvalue()


def _qm37(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_spark.core.zipread import zip_inventory

        for batch in batches:
            ids = [int(d) for d in batch["doc_id"]]
            invs = [zip_inventory(_qm37_make_zip(d)) for d in ids]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "is_zip": [v["is_zip"] for v in invs],
                    "n_entries": pd.array(
                        [v["n_entries"] for v in invs], dtype="Int64"
                    ),
                    "n_dirs": pd.array(
                        [v["n_dirs"] for v in invs], dtype="Int64"
                    ),
                    "total_uncomp": pd.array(
                        [v["total_uncomp"] for v in invs], dtype="Int64"
                    ),
                    "n_deflated": pd.array(
                        [v["n_deflated"] for v in invs], dtype="Int64"
                    ),
                    "has_encrypted": pd.array(
                        [v["has_encrypted"] for v in invs], dtype="Int32"
                    ),
                    "bomb_suspect": pd.array(
                        [v["bomb_suspect"] for v in invs], dtype="Int32"
                    ),
                }
            )

    return docs.mapInPandas(run, _ZIP_INV_SCHEMA)


QUERIES["qm37_zip_inventory"] = _qm37
ORACLE["qm37_zip_inventory"] = """
WITH v AS (SELECT doc_id, doc_id % 4 AS fam FROM documents)
SELECT doc_id,
       CAST(CASE WHEN fam = 3 THEN 0 ELSE 1 END AS INTEGER) AS is_zip,
       CAST(CASE WHEN fam = 0 THEN 3 WHEN fam = 1 THEN 2
                 WHEN fam = 2 THEN 1 END AS BIGINT) AS n_entries,
       CAST(CASE WHEN fam = 3 THEN NULL
                 WHEN fam = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_dirs,
       CAST(CASE WHEN fam = 0 THEN 30 + doc_id % 5
                 WHEN fam = 1 THEN 100
                 WHEN fam = 2 THEN 200000 END AS BIGINT) AS total_uncomp,
       CAST(CASE WHEN fam = 3 THEN NULL
                 WHEN fam = 0 THEN 0
                 WHEN fam = 1 THEN 2 ELSE 1 END AS BIGINT) AS n_deflated,
       CAST(CASE WHEN fam = 3 THEN NULL
                 ELSE 0 END AS INTEGER) AS has_encrypted,
       CAST(CASE WHEN fam = 3 THEN NULL
                 WHEN fam = 2 THEN 1 ELSE 0 END AS INTEGER) AS bomb_suspect
FROM v
"""
