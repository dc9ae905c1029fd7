"""Property-based tests (hypothesis): the generator->extractor roundtrip
must hold for arbitrary text on every variant, and the codec/string layers
must roundtrip arbitrary bytes. Complements the seeded fuzz in
test_robustness_fuzz.py (which checks crash-safety on corrupted bytes;
here we check CORRECTNESS on arbitrary valid inputs)."""

from hypothesis import given, settings, strategies as st

from pdf_spark.core.extract import assemble_text, extract_document
from pdf_spark.gen.pdfgen import N_VARIANTS, generate_doc

# printable-ish text incl. the chars the sanitizer keeps and the escapes
_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=400,
)


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, variant=st.integers(min_value=0, max_value=N_VARIANTS - 1))
def test_any_text_roundtrips_on_any_variant(text, variant):
    pdf, expected, name, _ = generate_doc(text, variant)
    r = extract_document(pdf)
    assert r.ok, (name, r.error_code)
    assert assemble_text(r.spans) == expected, name


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048))
def test_lzw_roundtrip_arbitrary_bytes(data):
    from pdf_spark.core.filters import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=0, max_size=512))
def test_string_literal_parse_of_escaped_bytes(data):
    """esc() + parse_string_literal must be inverse for arbitrary payloads
    that stay within the literal-string escape set."""
    from pdf_spark.core.objects import ObjectParser

    body = (
        data.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )
    # \r in a literal string is EOL-normalized by spec readers; avoid the
    # ambiguity the same way the generator's sanitizer does
    if b"\r" in data:
        return
    p = ObjectParser(b"(" + body + b")")
    assert p.parse_string_literal() == data


@settings(max_examples=100, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=2**32 - 1),
            st.integers(min_value=0, max_value=2**16 - 1),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_xref_stream_rows_roundtrip(rows):
    """The xref-stream binary row packer and the engine's field reader are
    inverse (W=[1,4,2] layout)."""
    import zlib

    from pdf_spark.core.document import parse_xref_stream
    from pdf_spark.gen.pdfgen import _xref_stream_rows

    enc = zlib.compress(_xref_stream_rows(rows))
    buf = (
        b"1 0 obj\n<</Type/XRef/Size " + str(len(rows)).encode()
        + b"/W[1 4 2]/Root 1 0 R/Filter/FlateDecode/Length "
        + str(len(enc)).encode() + b">>\nstream\n" + enc
        + b"\nendstream\nendobj"
    )
    entries, _, _ = parse_xref_stream(buf, 0)
    kinds = {0: "f", 1: "n", 2: "s"}
    for oid, (ty, a, b) in enumerate(rows):
        if oid in entries:
            assert entries[oid] == (kinds[ty], a, b)
