"""Extraction queries for the driver harness: the flagship roundtrip.

The testdata has no PDF column, so these queries *generate* the pages
corpus from ``documents.text`` inside the same job (distributed, via
mapInPandas — SURVEY.md M0 "synthesize the pages table"), extract it back,
and verify. That makes the whole parse chain oracle-checkable: the oracle
knows what must come out without parsing anything.

- qx01_roundtrip_match: every good-variant doc must extract to its expected
  text -> constant-true oracle. Any parser regression flips rows to false
  and fails the driver's value-hash compare.
- qx02_error_code_histogram: corrupt variants produce a deterministic
  error-code histogram the oracle computes arithmetically.
- qx03_span_stats: span-level geometry stats (no SQL oracle — rows-only).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_spark.core.extract import extract_document, assemble_text
from pdf_spark.functions.tables import load
from pdf_spark.gen.pdfgen import N_VARIANTS, generate_doc
from pdf_spark.operators.extract import extract_spans

QUERIES = {}
ORACLE = {}

_ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ok", BooleanType()),
        StructField("variant", StringType()),
    ]
)


def _qx01(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "text")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"doc_id": [], "ok": [], "variant": []}
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                variant = int(doc_id) % N_VARIANTS
                pdf, expected, vname, _ = generate_doc(text or "", variant)
                r = extract_document(pdf)
                got = assemble_text(r.spans) if r.ok else None
                out["doc_id"].append(int(doc_id))
                out["ok"].append(bool(r.ok and got == expected))
                out["variant"].append(vname)
            yield pd.DataFrame(out)

    return docs.mapInPandas(roundtrip, _ROUNDTRIP_SCHEMA).select("doc_id", "ok")


QUERIES["qx01_roundtrip_match"] = _qx01
ORACLE["qx01_roundtrip_match"] = (
    "SELECT doc_id, CAST('t' AS BOOLEAN) AS ok FROM documents"
)

_ERRHIST_SCHEMA = StructType(
    [
        StructField("error_code", StringType()),
        StructField("n", LongType()),
    ]
)


def _qx02(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "text")

    def corrupt_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            codes = []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                variant = N_VARIANTS + int(doc_id) % 5
                pdf, _, _, _ = generate_doc(text or "", variant)
                codes.append(extract_document(pdf).error_code)
            yield pd.DataFrame({"error_code": codes, "n": [1] * len(codes)})

    return (
        docs.mapInPandas(corrupt_extract, _ERRHIST_SCHEMA)
        .groupBy("error_code")
        .agg(F.sum("n").alias("n"))
    )


QUERIES["qx02_error_code_histogram"] = _qx02
# corrupt class is doc_id % 5 -> the histogram is pure arithmetic
ORACLE["qx02_error_code_histogram"] = """
SELECT CASE doc_id % 5
         WHEN 0 THEN 'INVALID_VERSION'
         WHEN 1 THEN 'INVALID_STARTXREF'
         WHEN 2 THEN 'INVALID_XREF'
         WHEN 3 THEN 'UNSUPPORTED_FILTER'
         ELSE 'UNBALANCED_STR' END AS error_code,
       COUNT(*) AS n
FROM documents GROUP BY 1
"""


def _qx03(spark: SparkSession, sf: str) -> DataFrame:
    """Span-level stats over the generated corpus (rows-only check)."""
    from pdf_spark.gen.corpus import pages_from_documents

    docs = load(spark, sf, "documents")
    pages = pages_from_documents(docs)
    spans = extract_spans(pages)
    return (
        spans.where(F.col("status") == "ok")
        .groupBy("page")
        .agg(
            F.count("*").alias("n_spans"),
            F.round(F.avg("size"), 2).alias("avg_font_size"),
            F.round(F.min("y"), 2).alias("min_y"),
            F.round(F.max("y"), 2).alias("max_y"),
        )
    )


QUERIES["qx03_span_stats"] = _qx03
