"""S5/K3/K4 + S8-xlsx: stdlib OOXML reader/writer.

Read parity is checked against the reference's own fixture workbook
(``/root/reference/tests/project/mock/test2.xlsx`` — read-only input),
whose 5-sheet layout is the pydatajson catalog form (SURVEY §2.1-S5).
"""

from __future__ import annotations

import pytest

from series_tiempo_ar_scraping_spark.sources.xlsx import (
    iter_cells,
    read_sheets,
    read_xlsx_catalog,
    write_xlsx,
)

REF_XLSX = "/root/reference/tests/project/mock/test2.xlsx"


def test_read_sheets_reference_fixture():
    sheets = read_sheets(REF_XLSX)
    assert set(sheets) == {"catalog", "dataset", "distribution", "field", "theme"}
    assert len(sheets["dataset"]) == 2
    assert len(sheets["distribution"]) == 3
    assert len(sheets["field"]) == 22
    cat = sheets["catalog"][0]
    assert cat["catalog_identifier"] == "example_catalog1"
    # shared strings with accents decode correctly
    assert "Macroecon" in cat["catalog_title"]


def test_iter_cells_shape():
    cells = list(iter_cells(REF_XLSX))
    # (sheet, row, col, value) with 1-based rows and letter columns
    sheets = {c[0] for c in cells}
    assert "field" in sheets
    assert all(isinstance(r, int) and r >= 1 for _, r, _, _ in cells)
    assert any(c == "A" for _, _, c, _ in cells)


def test_read_xlsx_catalog_normalized(spark):
    frames = read_xlsx_catalog(spark, REF_XLSX)
    assert frames["catalogs"].count() == 1
    assert frames["datasets"].count() == 2
    assert frames["distributions"].count() == 3
    assert frames["fields"].count() == 22
    # same column contract as the JSON reader
    for col in ("catalog_id", "dataset_id", "distribution_id",
                "scrapingFileURL", "scrapingFileSheet"):
        assert col in frames["distributions"].columns
    ti = frames["fields"].filter("specialType = 'time_index'")
    assert ti.count() == 3  # one per distribution
    # keyword/theme split to arrays
    row = frames["datasets"].orderBy("dataset_id").first()
    assert isinstance(row.theme, list)


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "out.xlsx")
    write_xlsx(
        path,
        {
            "report": (
                ["id", "name", "score"],
                [(1, "aé<b>&", 0.5), (2, None, 3)],
            ),
            "empty": (["x"], []),
        },
    )
    sheets = read_sheets(path)
    assert set(sheets) == {"report", "empty"}
    rows = sheets["report"]
    assert rows[0]["id"] == "1"
    assert rows[0]["name"] == "aé<b>&"  # XML escaping round-trips
    assert rows[0]["score"] == "0.5"
    assert "name" not in rows[1]  # nulls absent, not empty strings
    assert sheets["empty"] == []


def test_extract_cells_xlsx(spark):
    from series_tiempo_ar_scraping_spark.sources.cells import extract_cells

    cells = extract_cells(spark, [REF_XLSX]).cache()
    assert cells.filter("sheet = 'catalog' and row = 1 and col = 'A'")
    first = cells.filter(
        "sheet = 'catalog' and row = 1 and col = 'A'"
    ).first()
    assert first.value == "catalog_identifier"
    assert cells.count() > 100


def test_pipeline_runs_from_xlsx_catalog(spark, tmp_path):
    """EP2 over the xlsx catalog form: plan + validate, no data fetch."""
    from series_tiempo_ar_scraping_spark.plans.pipeline import CatalogPipeline

    pipe = CatalogPipeline(
        spark,
        catalog_path=REF_XLSX,
        catalog_id="example_catalog1",
        output_dir=str(tmp_path),
        file_resolver=lambda ref: None,  # no data files in this fixture
    )
    frames = pipe.plan()
    assert frames["distributions"].count() == 3
    assert "method" in frames["distributions"].columns


def test_write_xlsx_catalog_roundtrip(spark, tmp_path):
    """K3: normalized frames → catalog.xlsx → S5 read-back."""
    from series_tiempo_ar_scraping_spark.sinks.metadata import (
        write_xlsx_catalog,
    )

    frames = read_xlsx_catalog(spark, REF_XLSX)
    out = str(tmp_path / "catalog.xlsx")
    write_xlsx_catalog(frames, out)
    back = read_sheets(out)
    assert set(back) >= {"catalog", "dataset", "distribution", "field"}
    assert len(back["distribution"]) == 3
    assert len(back["field"]) == 22


def test_absolute_rel_targets_and_quoted_sheet_names(tmp_path):
    """OOXML corners: a relationship target given as an absolute part
    name must resolve (no 'xl/xl/' mangling), and a sheet name with a
    double quote must round-trip (quoteattr, not escape)."""
    import zipfile

    from series_tiempo_ar_scraping_spark.sources.xlsx import (
        iter_cells,
        write_xlsx,
    )

    p = str(tmp_path / "quoted.xlsx")
    write_xlsx(p, {'My "Q1" Data': (["col1"], [["hello"]])})
    cells = list(iter_cells(p))
    assert cells and all(c[0] == 'My "Q1" Data' for c in cells)
    assert any(c[3] == "hello" for c in cells)

    # rewrite the rels with an ABSOLUTE target (legal OOXML)
    src = zipfile.ZipFile(p)
    out = str(tmp_path / "abs_target.xlsx")
    with zipfile.ZipFile(out, "w") as zf:
        for item in src.infolist():
            data = src.read(item.filename)
            if item.filename == "xl/_rels/workbook.xml.rels":
                data = data.replace(
                    b'Target="worksheets/', b'Target="/xl/worksheets/'
                )
                assert b'Target="/xl/worksheets/' in data
            zf.writestr(item, data)
    src.close()
    assert list(iter_cells(out)) == cells
