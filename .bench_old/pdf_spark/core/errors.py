"""Error-code taxonomy for per-document failures.

The reference aborts the process on malformed input (``LOG_PANIC`` /
``Error*`` returns, e.g. /root/reference/libs/pdf/src/pdf.c:286-291); at
10^12-document scale a bad document must instead become an *error row*
(status='error', error_code=...) that flows into the lineage table, never a
task failure. The codes below mirror the reference's failure classes
(FIXTURES.md §4).
"""

from __future__ import annotations

# Error codes (stable strings; these land in docs_text.error_code and in the
# lineage table's error_codes map).
INVALID_VERSION = "INVALID_VERSION"        # header not %PDF-1.[0-7]  (pdf.c:278-297)
INVALID_STARTXREF = "INVALID_STARTXREF"    # no %%EOF/startxref tail  (pdf.c:304-341)
INVALID_XREF = "INVALID_XREF"              # malformed xref table     (xref.c:74-130)
INVALID_TRAILER = "INVALID_TRAILER"        # trailer dict malformed   (pdf.c:148-176)
INVALID_OBJECT = "INVALID_OBJECT"          # COS parse failure        (object.c:65-134)
UNBALANCED_STR = "UNBALANCED_STR"          # string never closed      (object.c:381-385)
NAME_BAD_CHAR_CODE = "NAME_BAD_CHAR_CODE"  # bad #xx escape in name   (object.c:606-643)
UNSUPPORTED_FILTER = "UNSUPPORTED_FILTER"  # filter not AHx/Flate     (filters.c:54)
FILTER_ERROR = "FILTER_ERROR"              # filter body corrupt
UNSUPPORTED_XREF = "UNSUPPORTED_XREF"      # startxref -> neither table nor stream
UNSUPPORTED_FONT = "UNSUPPORTED_FONT"      # font subtype not handled (font.c:228-236)
UNSUPPORTED_CMAP = "UNSUPPORTED_CMAP"      # predefined CMap unknown  (cmap_paths.c)
UNSUPPORTED_OPERATOR = "UNSUPPORTED_OPERATOR"  # content op outside supported set
MISSING_KEY = "MISSING_KEY"                # required dict key absent (deserde.c on_missing)
INCORRECT_TYPE = "INCORRECT_TYPE"          # wrong object type for a field
RECURSION_LIMIT = "RECURSION_LIMIT"        # page-tree depth cap 1024 (page.c:288) / form depth
ENCRYPTED = "ENCRYPTED"                    # password rejected / unsupported scheme (§7.6)
DOC_TOO_LARGE = "DOC_TOO_LARGE"            # payload above byte cap (skew guard)
EMPTY_DOC = "EMPTY_DOC"                    # null/near-empty payload
INTERNAL_ERROR = "INTERNAL_ERROR"          # anything unexpected (still a row, not a crash)


class PdfError(Exception):
    """A per-document failure with a stable error code."""

    __slots__ = ("code", "detail")

    def __init__(self, code: str, detail: str = "") -> None:
        super().__init__(f"{code}: {detail}" if detail else code)
        self.code = code
        self.detail = detail
