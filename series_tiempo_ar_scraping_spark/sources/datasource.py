"""Spark 4 Python DataSource for workbook cells: ``spark.read.format(
"workbook_cells")``.

The mapInPandas extraction (``sources/cells.py``) is the pipeline's
internal path; this wraps the same stdlib OOXML parser in the *user-facing*
Spark 4 ``DataSource`` API so workbook grids mount like any other source:

    from series_tiempo_ar_scraping_spark.sources.datasource import (
        register_workbook_cells,
    )
    register_workbook_cells(spark)
    cells = spark.read.format("workbook_cells").load("/data/*.xlsx")

Design (SURVEY §2.1-S8): one ``InputPartition`` per workbook file — the
planner ships each file to one task, the executor parses it exactly once
(the reference's open-once cache, ``base.py:574-587``, as partition
planning), and a million workbooks spread over however many cores exist.
Glob expansion happens driver-side at planning; no data moves through the
driver. Supports ``.xlsx`` (stdlib zip+XML) and the ``.jsonl`` cells
fixture format.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

CELLS_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("sheet", StringType()),
        StructField("row", IntegerType()),
        StructField("col", StringType()),
        StructField("value", StringType()),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WorkbookCellsReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path") or options.get("paths")
        if not path:
            raise ValueError("workbook_cells: .load(path) is required")
        self._paths = sorted(_glob.glob(path)) if any(
            ch in path for ch in "*?["
        ) else [path]
        if not self._paths:
            raise FileNotFoundError(f"workbook_cells: no files match {path}")

    def partitions(self):
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition):
        path = partition.path
        fname = os.path.basename(path)
        if path.endswith(".jsonl"):
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    # mirror the workbook readers' cell semantics: null/
                    # empty values are ABSENT cells (dropped, never the
                    # string 'None'), and a structurally malformed line
                    # is skipped rather than killing the task (V7)
                    try:
                        rec = json.loads(line)
                        value = rec["value"]
                        if value is None or value == "":
                            continue
                        yield (
                            fname,
                            rec["sheet"],
                            int(rec["row"]),
                            rec["col"],
                            str(value),
                        )
                    except (KeyError, ValueError, TypeError):
                        continue
        elif path.endswith(".xlsx"):
            from series_tiempo_ar_scraping_spark.sources.xlsx import iter_cells

            for sheet, row, col, value in iter_cells(path):
                yield (fname, sheet, row, col, value)
        elif path.endswith(".xls"):
            from series_tiempo_ar_scraping_spark.sources.xls import (
                iter_cells_xls,
            )

            for sheet, row, col, value in iter_cells_xls(path):
                yield (fname, sheet, row, col, value)
        else:
            raise NotImplementedError(
                f"workbook_cells: unsupported format {path}"
            )


class WorkbookCellsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "workbook_cells"

    def schema(self) -> StructType:
        return CELLS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return WorkbookCellsReader(self.options)


def register_workbook_cells(spark) -> None:
    """Register the DataSource on a session (idempotent per session).

    Executors must be able to import this package for .xlsx partitions
    (``ensure_package_on_executors``) — same requirement as every
    pandas-UDF island.
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(spark)
    spark.dataSource.register(WorkbookCellsDataSource)
