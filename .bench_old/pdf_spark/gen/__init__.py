"""Deterministic synthetic PDF generator + pages-corpus builder (no external
data; FIXTURES.md §3-§4)."""

from pdf_spark.gen.pdfgen import generate_doc, N_VARIANTS, sanitize_text  # noqa: F401
