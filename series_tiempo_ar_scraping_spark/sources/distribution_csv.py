"""S6/S7 — direct-download CSV / TXT distribution readers → long form.

The reference's CSVReader fetches ``downloadURL``, parses the CSV, and sets
``indice_tiempo`` as a datetime index (``processors.py:30-48``); the TXT
path parses a delimited text file (``processors.py:51-80``, series-tiempo-ar
``load_ts_distribution``). Both converge on the same wide frame contract
(SURVEY EP3 narrow waist). Here both are one reader: ``spark.read.csv``
with a configurable delimiter, melted to the canonical long form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.functions.scalars import missing_to_null

TIME_INDEX = "indice_tiempo"


def read_wide_csv(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """Read a standardized wide distribution file (first column
    ``indice_tiempo``, one column per series title)."""
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def melt_wide(wide: DataFrame, catalog_id: str, dataset_id: str, distribution_id: str) -> DataFrame:
    """Wide → canonical long observations via ``stack`` (JVM-side unpivot;
    the inverse of the sink-side pivot — SURVEY §1.3 long-form mapping).

    Values pass through the missing-token cleanse (X8) so direct-download
    files get the same null semantics as scraped ones.
    """
    series_cols = [c for c in wide.columns if c != TIME_INDEX]
    if not series_cols:
        raise ValueError(f"no series columns in wide frame: {wide.columns}")
    pairs = ", ".join(f"'{c}', `{c}`" for c in series_cols)
    long = wide.select(
        F.to_date(F.col(TIME_INDEX)).alias("ts"),
        F.expr(
            f"stack({len(series_cols)}, {pairs}) as (series_title, raw_value)"
        ),
    )
    return long.select(
        F.lit(catalog_id).alias("catalog_id"),
        F.lit(dataset_id).alias("dataset_id"),
        F.lit(distribution_id).alias("distribution_id"),
        F.col("series_title").alias("series_id"),
        "series_title",
        "ts",
        missing_to_null(F.col("raw_value")).alias("value"),
    )


def read_distribution_csv(
    spark: SparkSession,
    path: str,
    catalog_id: str,
    dataset_id: str,
    distribution_id: str,
    sep: str = ",",
) -> DataFrame:
    """S6 (sep=',') / S7 (sep='|' or '\\t' for fixed-delimiter TXT) → long."""
    return melt_wide(
        read_wide_csv(spark, path, sep), catalog_id, dataset_id, distribution_id
    )
