"""File sources — reference parity for get_csv / get_excel
(src/ETL-NPL-Pipeline.py:34, :48).

CSV reads are native Spark (splittable, parallel, schema-able).
Excel has no JVM reader in this container, so .xlsx is parsed on the
driver with a pure-stdlib reader (zipfile + ElementTree over the
OOXML parts) — correct for config-sized sheets (the reference's use
case: small macro tables), not for bulk data. Bulk data belongs in
parquet/CSV; a driver-side parse of a 100 GB sheet would be wrong at
any implementation quality.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV → DataFrame (ref get_csv). An explicit schema skips the
    inference pass — at scale, inference is a full extra read."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines ingest that QUARANTINES malformed lines instead of
    dropping (DROPMALFORMED) or aborting (FAILFAST): Spark's
    PERMISSIVE mode routes any unparseable line's raw text into
    ``corrupt_col`` and nulls the data columns — the same
    dead-letter contract as the media decoder's corrupt/unreadable
    kind. At web-corpus scale some fraction of every crawl is
    malformed; the pipeline must count and route it, never die on
    it or silently shrink.

    Filter ``corrupt_col IS NULL`` for the clean side and
    ``IS NOT NULL`` for the dead-letter side; both come from the
    ONE scan.

    Implementation: text scan + ``from_json`` expression rather than
    the JSON file source — Spark disallows queries that reference
    only the file source's internal corrupt column (the common
    ``filter(corrupt.isNotNull()).count()`` dead-letter audit would
    throw AnalysisException), while the expression form has no such
    restriction and the text scan is the same single pass.
    """
    full_schema = f"{schema}, {corrupt_col} STRING"
    return (
        spark.read.text(path)
        .select(
            F.from_json(
                "value",
                full_schema,
                {
                    "mode": "PERMISSIVE",
                    "columnNameOfCorruptRecord": corrupt_col,
                },
            ).alias("_d")
        )
        .select("_d.*")
    )


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC12' → 54 (0-based column index)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _sheet_paths(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part names in workbook order (via the rels part)."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    targets = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{rel_ns}Relationship")
    }
    paths = []
    for sh in wb.iter(f"{_NS}sheet"):
        target = targets.get(sh.get(f"{_REL_NS}id"), "")
        if target and not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        paths.append(target)
    return paths


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(raw).iter(f"{_NS}si"):
        # concatenate all text runs (<t> under <si> or rich <r> runs)
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(cell, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    # numeric: int when exact, else float
    txt = v.text
    if re.fullmatch(r"-?\d+", txt):
        return int(txt)
    return float(txt)


def parse_xlsx(path: str, sheet_name: str | int = 0) -> list[list]:
    """Rows of one worksheet as Python values (pure stdlib)."""
    with zipfile.ZipFile(path) as zf:
        if isinstance(sheet_name, int):
            sheet_path = _sheet_paths(zf)[sheet_name]
        else:
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
            names = [s.get("name") for s in wb.iter(f"{_NS}sheet")]
            sheet_path = _sheet_paths(zf)[names.index(sheet_name)]
        shared = _shared_strings(zf)
        rows: list[list] = []
        width = 0
        for row in ET.fromstring(zf.read(sheet_path)).iter(f"{_NS}row"):
            vals: list = []
            for cell in row.iter(f"{_NS}c"):
                ci = _col_index(cell.get("r", ""))
                if ci < 0:
                    ci = len(vals)
                while len(vals) <= ci:
                    vals.append(None)
                vals[ci] = _cell_value(cell, shared)
            width = max(width, len(vals))
            rows.append(vals)
    for r in rows:
        while len(r) < width:
            r.append(None)
    return rows


def read_excel(
    spark: SparkSession, path: str, sheet_name: str | int = 0
) -> DataFrame:
    """Excel sheet → DataFrame (ref get_excel src:48). First row is
    the header. Column types are unified bottom-up (all-int → long,
    numeric → double, else string) so Spark gets a stable schema."""
    rows = parse_xlsx(path, sheet_name)
    if not rows:
        raise ValueError(f"empty workbook: {path}")
    header = [str(h) if h is not None else f"col_{i}" for i, h in enumerate(rows[0])]
    data = rows[1:]
    if not data:
        raise ValueError(
            f"sheet {sheet_name!r} in {path} has a header but no data "
            "rows; Spark cannot build a DataFrame from zero rows with "
            "an inferred schema"
        )

    def unify(col_vals):
        present = [v for v in col_vals if v is not None]
        if present and all(isinstance(v, bool) for v in present):
            return (lambda v: v), BooleanType()
        if present and all(
            isinstance(v, int) and not isinstance(v, bool) for v in present
        ):
            return (lambda v: v), LongType()
        if present and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in present
        ):
            return (lambda v: float(v) if v is not None else None), DoubleType()
        # all-None columns land here: explicit StringType — inference
        # over a NoneType-only column would fail
        return (lambda v: str(v) if v is not None else None), StringType()

    unified = [unify([r[i] for r in data]) for i in range(len(header))]
    casts = [c for c, _ in unified]
    schema = StructType(
        [StructField(h, t, True) for h, (_, t) in zip(header, unified)]
    )
    norm = [
        tuple(casts[i](r[i]) for i in range(len(header))) for r in data
    ]
    return spark.createDataFrame(norm, schema)


# --- OOXML writer (stdlib) ----------------------------------------

_XLSX_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_XLSX_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _xlsx_col_name(i: int) -> str:
    name = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def write_xlsx(rows: list[list], path: str, sheet_name: str = "data") -> str:
    """Write rows (first row = header) as a minimal but genuine
    OOXML workbook — stdlib zipfile + hand-built XML, the write twin
    of ``parse_xlsx``. Strings go as ``inlineStr`` cells (no
    sharedStrings table needed), ints/floats as numeric cells,
    booleans as ``b`` cells, None as omitted cells.

    Driver-side by design: Excel is an EXCHANGE format for small
    reference tables (the reference's workbooks are a few hundred
    rows, src:48); bulk data belongs in parquet. The bounded use is
    the point, not a limitation to engineer around."""
    from xml.sax.saxutils import escape

    def cell_xml(r: int, c: int, v) -> str:
        ref = f"{_xlsx_col_name(c)}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'
        )

    body = "".join(
        f'<row r="{ri + 1}">'
        + "".join(cell_xml(ri, ci, v) for ci, v in enumerate(row))
        + "</row>"
        for ri, row in enumerate(rows)
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CT)
        zf.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
