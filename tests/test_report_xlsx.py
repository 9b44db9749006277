"""Structural validation of the in-repo .xlsx writer (report/xlsx.py) and
the ZY-3 embedded-thumbnail report layout (report/tables.py).

No Excel engine exists in this image, so validation parses the OOXML parts
directly: zip integrity, XML well-formedness, cell values, image anchors,
and relationship wiring — the same structure openpyxl/Excel reads.
"""

import xml.etree.ElementTree as ET
import zipfile

import numpy as np
import pandas as pd
import pytest

from onet_tpu.report.xlsx import Workbook, col_letter
from onet_tpu.report.tables import save_zy3_excel_report

MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
DRAW_NS = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"


def _parse(z, name):
    return ET.fromstring(z.read(name))


def test_col_letter():
    assert [col_letter(i) for i in (1, 2, 26, 27, 52, 703)] == \
        ["A", "B", "Z", "AA", "AZ", "AAA"]


def test_basic_workbook_structure(tmp_path):
    wb = Workbook()
    ws = wb.add_sheet("data")
    ws.write_row(1, ["id", "acc", "ok"])
    ws.write_row(2, ["img_001", 0.925, True])
    ws.cell(3, 2, 7)
    path = wb.save(str(tmp_path / "t.xlsx"))

    with zipfile.ZipFile(path) as z:
        assert z.testzip() is None
        names = set(z.namelist())
        for part in ("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                     "xl/_rels/workbook.xml.rels", "xl/styles.xml",
                     "xl/worksheets/sheet1.xml"):
            assert part in names, part
        # every XML part parses
        for nm in names:
            if nm.endswith(".xml") or nm.endswith(".rels"):
                _parse(z, nm)
        sheet = _parse(z, "xl/worksheets/sheet1.xml")
        cells = {c.get("r"): c for row in sheet.iter(f"{MAIN_NS}row")
                 for c in row.iter(f"{MAIN_NS}c")}
        assert cells["A1"].get("t") == "inlineStr"
        assert cells["A1"].find(f"{MAIN_NS}is/{MAIN_NS}t").text == "id"
        assert cells["B2"].find(f"{MAIN_NS}v").text == "0.925"
        assert cells["C2"].get("t") == "b"
        assert cells["B3"].find(f"{MAIN_NS}v").text == "7"
        wbx = _parse(z, "xl/workbook.xml")
        sheets = list(wbx.iter(f"{MAIN_NS}sheet"))
        assert [s.get("name") for s in sheets] == ["data"]


def test_embedded_images_and_rels(tmp_path):
    rng = np.random.default_rng(0)
    wb = Workbook()
    ws = wb.add_sheet("imgs")
    ws.cell(1, 1, "x")
    ws.add_image(rng.random((24, 24, 3)), 2, 9, 50, 50)
    ws.add_image(rng.random((24, 24)), 2, 10, 50, 50)
    path = wb.save(str(tmp_path / "im.xlsx"))

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "xl/drawings/drawing1.xml" in names
        assert "xl/media/image1.png" in names and "xl/media/image2.png" in names
        assert z.read("xl/media/image1.png")[:8] == b"\x89PNG\r\n\x1a\n"
        drawing = _parse(z, "xl/drawings/drawing1.xml")
        anchors = list(drawing.iter(f"{DRAW_NS}oneCellAnchor"))
        assert len(anchors) == 2
        # anchored at 0-based (row=1, col=8) i.e. cell I2
        frm = anchors[0].find(f"{DRAW_NS}from")
        assert frm.find(f"{DRAW_NS}col").text == "8"
        assert frm.find(f"{DRAW_NS}row").text == "1"
        ext = anchors[0].find(f"{DRAW_NS}ext")
        assert ext.get("cx") == str(50 * 9525)
        # sheet -> drawing -> media relationship chain
        srels = _parse(z, "xl/worksheets/_rels/sheet1.xml.rels")
        targets = [r.get("Target") for r in srels]
        assert "../drawings/drawing1.xml" in targets
        drels = _parse(z, "xl/drawings/_rels/drawing1.xml.rels")
        media = sorted(r.get("Target") for r in drels)
        assert media == ["../media/image1.png", "../media/image2.png"]
        # drawing referenced from the sheet xml
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
        assert "<drawing" in sheet


def test_zy3_report_layout(tmp_path):
    """Reference layout: thumbnails rgb/label/pred/vt/vd in columns I-M
    (uti_zy3_test_20240123.py:573-583), metric columns first."""
    rng = np.random.default_rng(1)
    rows = []
    for i in range(3):
        rows.append({
            "img_id": f"id_{i}", "acc": 0.9 + i / 100, "miou": 0.8,
            "group": i % 3,
            "rgb": rng.random((16, 16, 3)),
            "label": rng.random((16, 16)) > 0.5,
            "pred": rng.random((16, 16)) > 0.5,
            "vt": rng.random((16, 16)),
            "vd": rng.random((16, 16)),
        })
    summary = pd.DataFrame([{"group": "normal_cloud", "acc": 0.91}])
    path = save_zy3_excel_report(str(tmp_path / "zy3.xlsx"), rows, summary)

    with zipfile.ZipFile(path) as z:
        sheet = _parse(z, "xl/worksheets/sheet1.xml")
        cells = {c.get("r"): c for row in sheet.iter(f"{MAIN_NS}row")
                 for c in row.iter(f"{MAIN_NS}c")}
        # header row: metrics then image column heads at I..M
        assert cells["A1"].find(f"{MAIN_NS}is/{MAIN_NS}t").text == "img_id"
        for col, name in zip("IJKLM", ["rgb", "label", "pred", "vt", "vd"]):
            assert cells[f"{col}1"].find(f"{MAIN_NS}is/{MAIN_NS}t").text == name
        drawing = _parse(z, "xl/drawings/drawing1.xml")
        anchors = list(drawing.iter(f"{DRAW_NS}oneCellAnchor"))
        assert len(anchors) == 15  # 3 rows x 5 thumbnails
        # 15 embedded PNGs present
        media = [n for n in z.namelist() if n.startswith("xl/media/")]
        assert len(media) == 15
        # summary sheet exists
        wbx = _parse(z, "xl/workbook.xml")
        assert [s.get("name") for s in wbx.iter(f"{MAIN_NS}sheet")] == \
            ["Sheet1", "summary"]
