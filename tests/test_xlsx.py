"""core/xlsx.py — SpreadsheetML cell extraction vs honest containers."""

import hashlib
import io
import zipfile

from pdf_spark.core.xlsx import xlsx_cells

_WB = (
    '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.'
    'org/spreadsheetml/2006/main"><sheets>{sheets}</sheets></workbook>'
)


def _xlsx(sheet_xml, shared=None, sheets=('Data',)):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "xl/workbook.xml",
            _WB.format(
                sheets="".join(
                    f'<sheet name="{n}" sheetId="{i+1}" r:id="rId{i+1}"/>'
                    for i, n in enumerate(sheets)
                )
            ),
        )
        if shared is not None:
            z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()


def test_shared_strings_and_numbers():
    shared = (
        '<sst count="2"><si><t>alpha</t></si>'
        "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    )
    sheet = (
        "<worksheet><sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1"><v>42.5</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    m = xlsx_cells(_xlsx(sheet, shared))
    assert m["is_xlsx"] == 1
    assert m["n_rows"] == 2 and m["n_cells"] == 3
    canon = "A1=alpha\x1fB1=42.5\x1fA2=rich"
    assert m["cells_md5"] == hashlib.md5(canon.encode()).hexdigest()


def test_inline_str_formula_cache_and_empty_cell():
    sheet = (
        "<worksheet><sheetData>"
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>in&amp;line</t></is></c>'
        '<c r="B1" t="str"><f>A1&amp;"x"</f><v>cached</v></c>'
        '<c r="C1"/>'
        "</row></sheetData></worksheet>"
    )
    m = xlsx_cells(_xlsx(sheet))
    assert m["n_cells"] == 2
    canon = "A1=in&line\x1fB1=cached"
    assert m["cells_md5"] == hashlib.md5(canon.encode()).hexdigest()


def test_sheet_inventory():
    sheet = "<worksheet><sheetData/></worksheet>"
    m = xlsx_cells(_xlsx(sheet, sheets=("First", "Second", "Third")))
    assert m["n_sheets"] == 3 and m["sheet_name"] == "First"
    assert m["n_rows"] == 0 and m["n_cells"] == 0


def test_not_xlsx_routes_nulls():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", b"<w:document/>")
    for blob in (buf.getvalue(), b"not a zip"):
        m = xlsx_cells(blob)
        assert m["is_xlsx"] == 0 and m["cells_md5"] is None
