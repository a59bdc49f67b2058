"""Dependency-free minimal xlsx reader (zip + XML) for the reference's
transaction extracts.

The container has no openpyxl, but an xlsx workbook is a zip of XML
parts; the extracts use one sheet, shared strings, and numeric cells
(dates as Excel serial numbers). This reads exactly that subset —
enough to run the reference's own sample data through the engine
(python_scripts/insert_from_excel.py:22 equivalent), not a general
xlsx implementation.
"""

from __future__ import annotations

import datetime as dt
import re
import zipfile
from xml.etree import ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_EPOCH = dt.datetime(1899, 12, 30)  # Excel serial day 0


def excel_serial_to_datetime(serial: float) -> dt.datetime:
    # round to whole seconds — Excel serials carry float noise well
    # below the extracts' 1-second resolution
    return _EPOCH + dt.timedelta(seconds=round(serial * 86400))


def read_xlsx_rows(path: str) -> list[list]:
    """All rows of sheet1 as lists of str (shared/inline strings) or
    float (numeric cells); None for empty cells."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or ""
                                      for t in si.iter(
                                          f"{{{_NS['m']}}}t")))
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = []
        for row in sheet.iter(f"{{{_NS['m']}}}row"):
            cells: dict[int, object] = {}
            for c in row.findall("m:c", _NS):
                ref = c.get("r", "A1")
                col = 0
                for ch in ref:
                    if ch.isalpha():
                        col = col * 26 + (ord(ch.upper()) - 64)
                    else:
                        break
                v = c.find("m:v", _NS)
                if v is None or v.text is None:
                    continue
                ctype = c.get("t", "n")
                if ctype == "s":
                    cells[col - 1] = shared[int(v.text)]
                elif ctype == "str":
                    cells[col - 1] = v.text
                else:
                    cells[col - 1] = float(v.text)
            if cells:
                width = max(cells) + 1
                rows.append([cells.get(i) for i in range(width)])
        return rows
