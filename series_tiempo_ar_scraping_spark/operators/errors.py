"""Error-channel combinators (V7, SURVEY §4 custom-work item 3).

The reference wraps each distribution in try/except and continues, storing
status+note+traceback in a report row (``base.py:198-207``, report init
``base.py:105-114``). Under lazy distributed execution exceptions can't be
per-record control flow, so every stage here returns a ``StageResult``:
``data`` (OK rows) and ``errors`` (status/note rows). Nothing throws
per-record; a bad record at 100 TB must cost one error row, not a task.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from series_tiempo_ar_scraping_spark.config import (
    STATUS_ERROR,
    STATUS_OK,
    STATUS_WARNING,
)

# Distribution report schema — column parity with the reference's report
# rows (``base.py:105-114``, frame build ``base.py:886-915``).
REPORT_SCHEMA = T.StructType(
    [
        T.StructField("dataset_identifier", T.StringType()),
        T.StructField("distribution_identifier", T.StringType()),
        T.StructField("distribution_status", T.StringType()),
        T.StructField("distribution_note", T.StringType()),
        T.StructField("distribution_traceback", T.StringType()),
        T.StructField("distribution_source", T.StringType()),
        T.StructField("distribution_sheet", T.StringType()),
        T.StructField("time_index_coord", T.StringType()),
    ]
)


@dataclass
class StageResult:
    """(data, errors) pair every pipeline stage returns."""

    data: DataFrame
    errors: DataFrame

    def union_errors(self, other: DataFrame) -> "StageResult":
        return StageResult(self.data, self.errors.unionByName(other, allowMissingColumns=True))


def empty_report(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], REPORT_SCHEMA)


def ok_result(data: DataFrame) -> StageResult:
    return StageResult(data, empty_report(data.sparkSession))


def split_by(df: DataFrame, bad_condition, note_col=None, status: str = STATUS_ERROR) -> tuple[DataFrame, DataFrame]:
    """Route rows failing ``bad_condition`` to an error frame.

    Returns ``(ok_rows, bad_rows_with_status)``. ``note_col`` is an optional
    Column expression describing the failure.
    """
    bad = df.filter(bad_condition).withColumn("status", F.lit(status))
    if note_col is not None:
        bad = bad.withColumn("note", note_col)
    ok = df.filter(~F.coalesce(bad_condition, F.lit(False)))
    return ok, bad


__all__ = [
    "REPORT_SCHEMA",
    "StageResult",
    "empty_report",
    "ok_result",
    "split_by",
    "STATUS_ERROR",
    "STATUS_OK",
    "STATUS_WARNING",
]
