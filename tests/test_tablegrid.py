"""core/tablegrid.py — rowspan/colspan grid semantics (HTML5 model)."""

import hashlib

from pdf_spark.core.tablegrid import table_grid


def _md5(rows):
    return hashlib.md5(
        "\x1e".join("\x1f".join(r) for r in rows).encode()
    ).hexdigest()


def test_plain_2x2():
    m = table_grid(
        "<table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table>"
    )
    assert m["n_rows"] == 2 and m["n_cols"] == 2 and m["n_spanned"] == 0
    assert m["grid_md5"] == _md5([["a", "b"], ["c", "d"]])


def test_colspan_header_expands():
    m = table_grid(
        '<table><tr><th colspan="2">H</th></tr>'
        "<tr><td>x</td><td>y</td></tr></table>"
    )
    assert m["grid_md5"] == _md5([["H", "H"], ["x", "y"]])
    assert m["n_spanned"] == 1


def test_rowspan_shifts_later_rows():
    # the rowspan cell occupies column 0 of BOTH rows; row 2's single
    # cell must land in column 1, not column 0
    m = table_grid(
        '<table><tr><td rowspan="2">L</td><td>r1</td></tr>'
        "<tr><td>r2</td></tr></table>"
    )
    assert m["grid_md5"] == _md5([["L", "r1"], ["L", "r2"]])


def test_combined_spans_and_entities():
    m = table_grid(
        '<table><tr><td rowspan="2" colspan="2">Q&amp;A</td>'
        "<td>c</td></tr><tr><td>d</td></tr>"
        "<tr><td>e</td><td>f</td><td>g</td></tr></table>"
    )
    assert m["grid_md5"] == _md5(
        [["Q&A", "Q&A", "c"], ["Q&A", "Q&A", "d"], ["e", "f", "g"]]
    )
    assert m["n_spanned"] == 1


def test_ragged_rows_pad_and_inner_tags_stripped():
    m = table_grid(
        "<table><tr><td><b>x</b> y</td><td>z</td></tr>"
        "<tr><td>only</td></tr></table>"
    )
    assert m["grid_md5"] == _md5([["x y", "z"], ["only", ""]])


def test_no_table():
    assert table_grid("<p>no tables</p>")["has_table"] == 0
