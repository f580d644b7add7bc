"""Spark 4 Python DataSource for workbook cells (sources/datasource.py)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def registered(spark):
    from series_tiempo_ar_scraping_spark.sources.datasource import (
        register_workbook_cells,
    )

    register_workbook_cells(spark)
    return spark


def test_reads_jsonl_fixture(registered):
    df = (
        registered.read.format("workbook_cells")
        .load("tests/fixtures/files/wb1.jsonl")
    )
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["file", "sheet", "row", "col", "value"]
    assert all(r.file == "wb1.jsonl" for r in rows)


def test_reads_generated_xlsx_with_glob(registered, tmp_path):
    from series_tiempo_ar_scraping_spark.sources.xlsx import write_xlsx

    for i in range(3):
        write_xlsx(
            str(tmp_path / f"wb{i}.xlsx"),
            {"s1": (["a", "b"], [(f"v{i}", i), ("x", 7)])},
        )
    df = (
        registered.read.format("workbook_cells")
        .load(str(tmp_path / "*.xlsx"))
    )
    # one partition per file
    assert df.rdd.getNumPartitions() == 3
    got = {(r.file, r.sheet, r.row, r.col): r.value for r in df.collect()}
    # header row + two data rows per file, 2 cols each
    assert len(got) == 3 * 6
    assert got[("wb0.xlsx", "s1", 2, "A")] == "v0"
    assert got[("wb2.xlsx", "s1", 1, "B")] == "b"


def test_same_cells_as_mapinpandas_path(registered, tmp_path):
    """The DataSource and the internal mapInPandas extraction agree."""
    from series_tiempo_ar_scraping_spark.sources.cells import extract_cells
    from series_tiempo_ar_scraping_spark.sources.xlsx import write_xlsx

    p = str(tmp_path / "wb.xlsx")
    write_xlsx(p, {"hoja": (["h1"], [("dato",), (3.5,)])})
    via_ds = {
        tuple(r)
        for r in registered.read.format("workbook_cells").load(p).collect()
    }
    via_mip = {tuple(r) for r in extract_cells(registered, [p]).collect()}
    assert via_ds == via_mip


def test_datasource_reads_xls(spark, tmp_path):
    """The Python DataSource handles legacy BIFF8 partitions too."""
    from series_tiempo_ar_scraping_spark.sources.datasource import (
        register_workbook_cells,
    )
    from series_tiempo_ar_scraping_spark.sources.xls import write_xls_cells

    path = str(tmp_path / "legacy.xls")
    write_xls_cells(
        path,
        [("hoja", 1, 1, "Periodo"), ("hoja", 2, 1, "2024-01-01"),
         ("hoja", 2, 2, 7.25)],
    )
    register_workbook_cells(spark)
    rows = (
        spark.read.format("workbook_cells").load(path).orderBy("row", "col")
    ).collect()
    assert [(r.sheet, r.row, r.col, r.value) for r in rows] == [
        ("hoja", 1, "A", "Periodo"),
        ("hoja", 2, "A", "2024-01-01"),
        ("hoja", 2, "B", "7.25"),
    ]
