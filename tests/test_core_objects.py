"""COS object parser unit tests — fixtures mirror the reference's in-source
tests (object.c's 62 TEST_FUNCs, ctx.c, xref.c:296-391; SURVEY.md §5.1)."""

import pytest

from pdf_spark.core.errors import PdfError
from pdf_spark.core.objects import Name, ObjectParser, Ref, Stream


def parse(b: bytes, **kw):
    return ObjectParser(b, **kw).parse_object()


class TestScalars:
    def test_booleans_and_null(self):
        assert parse(b"true") is True
        assert parse(b"false") is False
        assert parse(b"null") is None

    def test_integers(self):
        assert parse(b"123") == 123
        assert parse(b"-17") == -17
        assert parse(b"+42") == 42
        assert parse(b"0") == 0

    def test_reals(self):
        assert parse(b"34.5") == 34.5
        assert parse(b"-3.62") == -3.62
        assert parse(b"4.") == 4.0
        assert parse(b".5", content=True) == 0.5

    def test_int_vs_real_decided_by_dot(self):
        assert isinstance(parse(b"7"), int)
        assert isinstance(parse(b"7.0"), float)

    def test_i32_overflow_is_error(self):
        # reference range-checks at parse (object.c:288-294)
        with pytest.raises(PdfError):
            parse(b"99999999999")


class TestStrings:
    def test_literal(self):
        assert parse(b"(Hello World!)") == b"Hello World!"

    def test_escapes(self):
        assert parse(rb"(a\nb\rc\td\be\ff)") == b"a\nb\rc\td\be\x0cf"
        assert parse(rb"(\(\)\\)") == b"()\\"

    def test_balanced_parens(self):
        assert parse(b"(a(b)c)") == b"a(b)c"

    def test_unbalanced_is_error(self):
        with pytest.raises(PdfError) as e:
            parse(b"(abc")
        assert e.value.code == "UNBALANCED_STR"

    def test_octal_escape_extension(self):
        # divergence: reference panics on octal (object.c:451)
        assert parse(rb"(\101\60)") == b"A0"

    def test_line_continuation(self):
        assert parse(b"(ab\\\ncd)") == b"abcd"

    def test_hex_string(self):
        assert parse(b"<48656C6C6F>") == b"Hello"
        assert parse(b"<48 65 6C\n6C 6F>") == b"Hello"

    def test_hex_odd_trailing_high_nibble(self):
        assert parse(b"<901FA>") == b"\x90\x1f\xa0"


class TestNames:
    def test_simple(self):
        n = parse(b"/Type")
        assert isinstance(n, Name) and n == "Type"

    def test_hash_escape(self):
        assert parse(b"/A#42") == "AB"

    def test_bad_hash_escape(self):
        with pytest.raises(PdfError) as e:
            parse(b"/a#zq")
        assert e.value.code == "NAME_BAD_CHAR_CODE"


class TestContainers:
    def test_array(self):
        assert parse(b"[1 2.5 (x) /N true]") == [1, 2.5, b"x", "N", True]

    def test_nested_array(self):
        assert parse(b"[[1 2] [3]]") == [[1, 2], [3]]

    def test_dict(self):
        d = parse(b"<</Type/Catalog/Pages 2 0 R>>")
        assert d["Type"] == "Catalog"
        assert d["Pages"] == Ref(2, 0)

    def test_dict_duplicate_key_first_wins(self):
        # linear-scan-from-front lookup (object.c:929-945)
        d = parse(b"<</K 1 /K 2>>")
        assert d["K"] == 1

    def test_dict_insertion_order(self):
        d = parse(b"<</B 1 /A 2>>")
        assert list(d.keys()) == ["B", "A"]


class TestIndirect:
    def test_ref(self):
        assert parse(b"12 0 R") == Ref(12, 0)

    def test_number_backtrack(self):
        # `12 0` followed by no R must parse as the number 12
        p = ObjectParser(b"12 0 obj")
        assert p.parse_object() == 12

    def test_content_mode_no_refs(self):
        assert parse(b"12 0 R", content=True) == 12

    def test_indirect_object(self):
        ind = ObjectParser(b"4 0 obj\n(hi)\nendobj").parse_indirect_object()
        assert (ind.obj_id, ind.gen, ind.value) == (4, 0, b"hi")


class TestStreams:
    def test_stream_direct_length(self):
        ind = ObjectParser(
            b"4 0 obj\n<</Length 5>>\nstream\nhello\nendstream\nendobj"
        ).parse_indirect_object()
        assert isinstance(ind.value, Stream)
        assert ind.value.raw == b"hello"
        assert ind.value.decoded() == b"hello"

    def test_stream_crlf_after_keyword(self):
        ind = ObjectParser(
            b"4 0 obj <</Length 2>> stream\r\nhi\nendstream endobj"
        ).parse_indirect_object()
        assert ind.value.raw == b"hi"


class TestComments:
    def test_comment_skipped_as_whitespace(self):
        assert parse(b"% note\n42") == 42
