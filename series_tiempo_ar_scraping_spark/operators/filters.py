"""Filters / projections / routing (SURVEY §2.3: F1-F8).

All are plain Catalyst filter/join expressions — pushdown-able, prune-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.config import (
    EXCEL_EXTENSIONS,
    METHOD_CSV,
    METHOD_EXCEL,
    METHOD_TXT,
    METHOD_UNKNOWN,
    TXT_EXTENSIONS,
)
from series_tiempo_ar_scraping_spark.functions.scalars import (
    file_extension,
    strip_spaces,
)


def harvestable_datasets(datasets: DataFrame, dataset_errors: DataFrame) -> DataFrame:
    """F1 — keep metadata-valid datasets (``base.py:455-463`` →
    pydatajson ``generate_harvestable_catalogs(harvest='valid')``).

    Anti-join against the error set; broadcast the (small) error frame so
    no shuffle of the dataset frame is needed.
    """
    errs = dataset_errors.select("dataset_id").distinct()
    return datasets.join(F.broadcast(errs), on="dataset_id", how="left_anti")


def time_series_distributions(distributions: DataFrame, fields: DataFrame) -> DataFrame:
    """F2 — distributions having a ``time_index`` field
    (``base.py:478-487,519-528`` → ``get_distributions(only_time_series=True)``).

    Semi-join on distribution_id.
    """
    ts_fields = (
        fields.filter(F.col("specialType") == "time_index")
        .select("distribution_id")
        .distinct()
    )
    return distributions.join(
        F.broadcast(ts_fields), on="distribution_id", how="left_semi"
    )


def filter_distribution_id(df: DataFrame, distribution_id: str | None) -> DataFrame:
    """F3 — CLI ``--distribution-id-filter`` (``base.py:483-486``,
    ``main.py:62-66``); no-op when None."""
    if distribution_id is None:
        return df
    return df.filter(F.col("distribution_id") == F.lit(distribution_id))


def filter_catalog_id(df: DataFrame, catalog_id: str | None) -> DataFrame:
    """F4 — CLI ``--catalog-id-filter`` (``base.py:1088-1090``,
    ``main.py:57-61``)."""
    if catalog_id is None:
        return df
    return df.filter(F.col("catalog_id") == F.lit(catalog_id))


def with_method(distributions: DataFrame) -> DataFrame:
    """F5 — scraping-method routing column (``base.py:123-153`` routing +
    series-tiempo-ar ``get_ts_distributions_by_method`` at
    ``base.py:539-572``): ``downloadURL`` present → csv; else by
    ``scrapingFileURL`` extension txt → txt, xls/xlsx → excel.
    """
    ext = file_extension(F.col("scrapingFileURL"))
    return distributions.withColumn(
        "method",
        F.when(F.col("downloadURL").isNotNull(), METHOD_CSV)
        .when(ext.isin(*TXT_EXTENSIONS), METHOD_TXT)
        .when(ext.isin(*EXCEL_EXTENSIONS), METHOD_EXCEL)
        .otherwise(METHOD_UNKNOWN),
    )


def value_fields(fields: DataFrame) -> DataFrame:
    """F6 — non-time-index fields (``processors.py:167-198``)."""
    return fields.filter(
        F.col("specialType").isNull() | (F.col("specialType") != "time_index")
    )


def time_index_fields(fields: DataFrame) -> DataFrame:
    """F6 — exactly the time-index field(s) (``processors.py:167-198``)."""
    return fields.filter(F.col("specialType") == "time_index")


def filter_by_status(reports: DataFrame, status: str, status_col: str) -> DataFrame:
    """F7 — status filter for indicator counts (``base.py:978-992``)."""
    return reports.filter(F.col(status_col) == F.lit(status))


def clean_field_keyspace(fields: DataFrame) -> DataFrame:
    """F8 — strip spaces from every field title / id (``base.py:940-948``)."""
    return fields.withColumn("title", strip_spaces(F.col("title"))).withColumn(
        "field_id", strip_spaces(F.col("field_id"))
    )
