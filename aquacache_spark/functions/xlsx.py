"""Minimal pure-stdlib xlsx cell extractor.

No Excel codec ships in this container (openpyxl/xlrd absent), but an
.xlsx file is a zip of SpreadsheetML XML parts — enough of the format
is parsed here (sheet catalog + rels, sharedStrings, inline strings,
numbers, booleans) to read data workbooks like the reference's snow
templates (R/readSnowWorkbook.R:20). Formatting-only features (styles,
merged-cell spans, formulas' expressions) are ignored; for formula
cells the cached ``<v>`` result is returned, which is what a data
reader wants.

Workbooks are small driver-side ingest artifacts; a *directory* of
them distributes by mapping this kernel over paths inside
``mapInPandas`` (see sources/snow_workbook.py).
"""

from __future__ import annotations

import re
import zipfile
from datetime import date, timedelta
from xml.etree import ElementTree

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")

EXCEL_EPOCH = date(1899, 12, 30)  # serial 1 == 1900-01-01 (Lotus convention)


def col_to_num(letters: str) -> int:
    """'A' -> 1, 'B' -> 2, ..., 'AA' -> 27."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n


def serial_to_date(serial: float) -> date:
    """Excel date serial -> date (1900 date system)."""
    return EXCEL_EPOCH + timedelta(days=int(serial))


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text(elem) -> str:
    return "".join(t for t in elem.itertext())


def read_xlsx_cells(path: str) -> dict[str, dict[tuple[int, int], object]]:
    """Parse a workbook into {sheet_name: {(row, col): value}} (1-based).

    Values: float/int for numeric cells, str for shared/inline/cached
    strings, bool for booleans. Empty cells are absent.
    """
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())

        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_text(si) for si in root if _local(si.tag) == "si"]

        # sheet name -> worksheet part, via workbook.xml + its rels
        rels: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in names:
            rroot = ElementTree.fromstring(z.read("xl/_rels/workbook.xml.rels"))
            for rel in rroot:
                target = rel.get("Target", "").lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                rels[rel.get("Id", "")] = target
        wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
        sheets: dict[str, str] = {}
        for elem in wb.iter():
            if _local(elem.tag) != "sheet":
                continue
            rid = next(
                (v for k, v in elem.attrib.items() if _local(k) == "id"), None
            )
            part = rels.get(rid, f"xl/worksheets/sheet{len(sheets) + 1}.xml")
            sheets[elem.get("name", f"Sheet{len(sheets) + 1}")] = part

        out: dict[str, dict[tuple[int, int], object]] = {}
        for sheet_name, part in sheets.items():
            cells: dict[tuple[int, int], object] = {}
            if part in names:
                sroot = ElementTree.fromstring(z.read(part))
                for c in sroot.iter():
                    if _local(c.tag) != "c":
                        continue
                    ref = c.get("r", "")
                    m = _CELL_REF.match(ref)
                    if not m:
                        continue
                    rc = (int(m.group(2)), col_to_num(m.group(1)))
                    ctype = c.get("t", "n")
                    v_elem = next(
                        (ch for ch in c if _local(ch.tag) == "v"), None
                    )
                    is_elem = next(
                        (ch for ch in c if _local(ch.tag) == "is"), None
                    )
                    if ctype == "inlineStr" and is_elem is not None:
                        cells[rc] = _text(is_elem)
                    elif v_elem is None or v_elem.text is None:
                        continue
                    elif ctype == "s":
                        cells[rc] = shared[int(v_elem.text)]
                    elif ctype == "b":
                        cells[rc] = v_elem.text.strip() == "1"
                    elif ctype in ("str", "e", "d"):
                        # "e" = error literal (#DIV/0!, #N/A); "d" = ISO-8601
                        # date string. Keep both as text so a single bad cell
                        # cannot abort the workbook parse.
                        cells[rc] = v_elem.text
                    else:
                        try:
                            num = float(v_elem.text)
                        except ValueError:
                            cells[rc] = v_elem.text
                            continue
                        cells[rc] = int(num) if num.is_integer() else num
            out[sheet_name] = cells
    return out
