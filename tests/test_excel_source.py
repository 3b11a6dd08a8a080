"""Pure-stdlib xlsx reader (sources.files.read_excel) — reference
get_excel parity (src/ETL-NPL-Pipeline.py:48) without openpyxl.

The fixture builds a genuine OOXML workbook with zipfile: shared
strings, inline strings, ints, floats, and a blank cell — the cell
types a real config sheet contains.
"""

from __future__ import annotations

import zipfile

import pytest

from etl_npl_pipeline_spark.sources.files import parse_xlsx, read_excel

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="macro" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>quarter</t></si><si><t>gdp</t></si><si><t>note</t></si>
</sst>"""

# header row via shared strings; data mixes numeric, inline string,
# and a blank (missing) cell in C3
_SHEET = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c>
</row>
<row r="2">
<c r="A2" t="inlineStr"><is><t>1Q2024</t></is></c><c r="B2"><v>1234.5</v></c>
<c r="C2" t="inlineStr"><is><t>prelim</t></is></c>
</row>
<row r="3">
<c r="A3" t="inlineStr"><is><t>2Q2024</t></is></c><c r="B3"><v>1300</v></c>
</row>
</sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "macro.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/sharedStrings.xml", _SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET)
    return str(p)


def test_parse_xlsx_rows(xlsx_path):
    rows = parse_xlsx(xlsx_path)
    assert rows[0] == ["quarter", "gdp", "note"]
    assert rows[1] == ["1Q2024", 1234.5, "prelim"]
    assert rows[2] == ["2Q2024", 1300, None]


def test_read_excel_dataframe(xlsx_path, spark):
    df = read_excel(spark, xlsx_path)
    assert df.columns == ["quarter", "gdp", "note"]
    got = {r.quarter: (r.gdp, r.note) for r in df.collect()}
    # mixed int/float gdp column unifies to double
    assert got == {"1Q2024": (1234.5, "prelim"), "2Q2024": (1300.0, None)}
    assert dict(df.dtypes)["gdp"] == "double"


def test_read_excel_by_sheet_name(xlsx_path, spark):
    df = read_excel(spark, xlsx_path, sheet_name="macro")
    assert df.count() == 2

_SHEET_HEADER_ONLY = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
</row>
</sheetData>
</worksheet>"""

# note column: every data row leaves C blank -> all-None column
_SHEET_ALL_NONE_COL = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c>
</row>
<row r="2">
<c r="A2" t="inlineStr"><is><t>1Q2024</t></is></c><c r="B2"><v>1</v></c>
</row>
<row r="3">
<c r="A3" t="inlineStr"><is><t>2Q2024</t></is></c><c r="B3"><v>2</v></c>
</row>
</sheetData>
</worksheet>"""


def _write_xlsx(tmp_path, sheet_xml, name):
    p = tmp_path / name
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", _CT)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/sharedStrings.xml", _SHARED)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return str(p)


def test_read_excel_header_only_raises_clear_error(tmp_path, spark):
    p = _write_xlsx(tmp_path, _SHEET_HEADER_ONLY, "hdr.xlsx")
    with pytest.raises(ValueError, match="no data"):
        read_excel(spark, p)


def test_read_excel_all_none_column_is_string(tmp_path, spark):
    p = _write_xlsx(tmp_path, _SHEET_ALL_NONE_COL, "none.xlsx")
    df = read_excel(spark, p)
    assert dict(df.dtypes) == {
        "quarter": "string", "gdp": "bigint", "note": "string"
    }
    assert [r.note for r in df.collect()] == [None, None]
