"""Aggregations / indicators (SURVEY §2.5: A1-A7) and the status sort (O1).

All hash aggregations with automatic partial (map-side) + final combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.functions.scalars import status_sort_key


def distinct_source_urls(distributions: DataFrame, url_col: str = "scrapingFileURL") -> DataFrame:
    """A1 — distinct download sources before fetching (``base.py:546-572``)."""
    return (
        distributions.filter(F.col(url_col).isNotNull())
        .select(url_col)
        .distinct()
    )


def count_by_status(reports: DataFrame, status_col: str) -> DataFrame:
    """A3 — counts by status (``base.py:978-992``)."""
    return reports.groupBy(status_col).agg(F.count("*").alias("n"))


def ok_percentage(reports: DataFrame, status_col: str, ok_value: str = "OK") -> DataFrame:
    """A4 — ``round(ok/total*100, 3)``, zero-division → 0
    (``base.py:994-1005``)."""
    return reports.agg(
        F.coalesce(
            F.round(
                100.0
                * F.sum(F.when(F.col(status_col) == ok_value, 1).otherwise(0))
                / F.count("*"),
                3,
            ),
            F.lit(0.0),
        ).alias("ok_pct")
    )


def catalog_indicators(dataset_reports: DataFrame, distribution_reports: DataFrame) -> DataFrame:
    """A5 — the 7-metric indicator record (``base.py:1007-1018``):
    datasets / datasets_ok / datasets_error / distributions /
    distributions_ok / distributions_error / distributions_percentage.

    One aggregation pass per report frame (conditional sums), then a single
    cross of two 1-row frames — no wide shuffle.
    """
    ds = dataset_reports.agg(
        F.count("*").alias("datasets"),
        F.sum(F.when(F.col("dataset_status") == "OK", 1).otherwise(0)).alias(
            "datasets_ok"
        ),
        F.sum(F.when(F.col("dataset_status") == "ERROR", 1).otherwise(0)).alias(
            "datasets_error"
        ),
    )
    dist = distribution_reports.agg(
        F.count("*").alias("distributions"),
        F.sum(
            F.when(F.col("distribution_status") == "OK", 1).otherwise(0)
        ).alias("distributions_ok"),
        F.sum(
            F.when(F.col("distribution_status") == "ERROR", 1).otherwise(0)
        ).alias("distributions_error"),
    )
    return ds.crossJoin(dist).withColumn(
        "distributions_percentage",
        F.coalesce(
            F.round(
                100.0 * F.col("distributions_ok") / F.col("distributions"), 3
            ),
            F.lit(0.0),
        ),
    )


def sort_reports_by_status(reports: DataFrame, status_col: str = "distribution_status") -> DataFrame:
    """O1 — categorical sort ERROR < WARNING < OK (``base.py:903-913``),
    with identifier tiebreak for determinism (the reference's intra-group
    order is pandas-stable-sort incidental; SURVEY §7 hard part (c))."""
    return reports.orderBy(
        status_sort_key(F.col(status_col)), F.col("distribution_identifier")
    )
