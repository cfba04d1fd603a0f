"""Minimal stdlib .xlsx writer/reader — no openpyxl dependency.

An .xlsx file is a ZIP of SpreadsheetML XML parts (ECMA-376 / ISO 29500,
public spec). This module implements exactly the subset the pipeline
needs — one sheet of string cells — so the mapping rendition
(reference postprocessor.py:79-91) and the validator's xlsx scan
(reference validator.py:27-34) run on REAL workbook bytes in any
container:

* ``write_xlsx``: inline-string cells (``t="inlineStr"``), fixed zip
  timestamps → byte-deterministic output, readable by Excel/openpyxl/
  pandas.
* ``read_xlsx``: namespace-agnostic parse of the first worksheet;
  handles inline strings, shared strings (what Excel and openpyxl
  actually emit), and plain ``<v>`` values, honoring ``r="B3"``-style
  cell references so sparse rows keep their column positions.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_letters(idx: int) -> str:
    """0-based column index → A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _ref_col(ref: str) -> int | None:
    """'B3' → 1; None when the reference has no letter part."""
    m = re.match(r"([A-Z]+)\d*$", ref)
    if not m:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(rows: list[tuple[str, ...]] | list[list[str]]) -> bytes:
    """One-sheet workbook of string cells. Deterministic bytes: fixed
    zip timestamps and entry order, so identical rows always produce
    identical files (the corpus hash checks depend on this)."""
    body = []
    for ri, row in enumerate(rows, start=1):
        cells = "".join(
            f'<c r="{_col_letters(ci)}{ri}" t="inlineStr">'
            f"<is><t xml:space=\"preserve\">{escape(str(v))}</t></is></c>"
            for ci, v in enumerate(row)
        )
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData>"
        "</worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in [
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("xl/workbook.xml", _WORKBOOK),
            ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
            ("xl/worksheets/sheet1.xml", sheet),
        ]:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, data)
    return buf.getvalue()


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _si_text(si: ET.Element) -> str:
    """A sharedStrings <si> is either one <t> or rich-text runs of
    <r><t>...</t></r> — concatenate every descendant <t>."""
    return "".join(
        t.text or "" for t in si.iter() if _strip_ns(t.tag) == "t"
    )


def read_xlsx(data: bytes) -> list[list[str]]:
    """First worksheet → rows of strings (missing cells → '')."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                _si_text(si) for si in root if _strip_ns(si.tag) == "si"
            ]
        sheet_name = next(
            n for n in sorted(names)
            if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
        )
        root = ET.fromstring(z.read(sheet_name))

    rows: list[list[str]] = []
    for row in (el for el in root.iter() if _strip_ns(el.tag) == "row"):
        out: list[str] = []
        next_col = 0
        for cell in (el for el in row if _strip_ns(el.tag) == "c"):
            col = _ref_col(cell.get("r", "")) if cell.get("r") else None
            col = next_col if col is None else col
            while len(out) < col:
                out.append("")
            ctype = cell.get("t", "n")
            val = ""
            for child in cell:
                tag = _strip_ns(child.tag)
                if tag == "is":
                    val = _si_text(child)
                elif tag == "v":
                    raw = child.text or ""
                    val = shared[int(raw)] if ctype == "s" else raw
            out.append(val)
            next_col = col + 1
        rows.append(out)
    return rows
