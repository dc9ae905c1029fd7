"""core/csvsniff.py — parse-based dialect sniff + RFC 4180 vectors."""

import hashlib

from pdf_spark.core.csvsniff import parse_delimited, sniff_table


def test_basic_comma_with_header():
    m = sniff_table(b"name,score\nalice,10\nbob,20\n")
    assert m["delimiter"] == ","
    assert m["has_header"] == 1
    assert m["n_rows"] == 2 and m["n_cols"] == 2


def test_tsv_numeric_first_row_no_header():
    m = sniff_table(b"1\t2\n3\t4\n")
    assert m["delimiter"] == "\t" and m["has_header"] == 0
    assert m["n_rows"] == 2


def test_quoted_delimiter_newline_and_escaped_quote():
    raw = b'a;b\n"x;y";"he said ""hi""\nnext"\n'
    rows = parse_delimited(raw.decode(), ";")
    assert rows == [["a", "b"], ["x;y", 'he said "hi"\nnext']]
    m = sniff_table(raw)
    assert m["delimiter"] == ";" and m["n_cols"] == 2
    # all-text table: header NOT claimed (conservative rule)
    assert m["has_header"] == 0 and m["n_rows"] == 2
    canon = "a\x1fb\x1ex;y\x1fhe said \"hi\"\nnext"
    assert m["cells_md5"] == hashlib.md5(canon.encode()).hexdigest()


def test_crlf_and_trailing_newline():
    rows = parse_delimited("a,b\r\nc,d\r\n", ",")
    assert rows == [["a", "b"], ["c", "d"]]


def test_quote_only_honored_at_field_start():
    rows = parse_delimited('say "hi",x\n', ",")
    assert rows == [['say "hi"', "x"]]


def test_inconsistent_widths_and_prose_rejected():
    assert sniff_table(b"a,b\nc,d,e\n")["is_tabular"] == 0
    assert sniff_table(b"just prose here\nanother line\n")["is_tabular"] == 0
    assert sniff_table(b"\x00binary\x00")["is_tabular"] == 0


def test_widest_consistent_delimiter_wins():
    # ';' gives 3 consistent cols, ',' would give 1
    m = sniff_table(b"a;b;c\nd;e;f\n")
    assert m["delimiter"] == ";" and m["n_cols"] == 3
