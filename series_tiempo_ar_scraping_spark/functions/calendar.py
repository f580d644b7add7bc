"""Frequency / calendar arithmetic (SURVEY §4 custom-work item 2).

The reference delegates frequency conformity to series-tiempo-ar's
validators (invoked at ``base.py:251-264``); here the same semantics are
Catalyst expressions over the long-form observations table:

- a period is identified by its **start date** (``indice_tiempo`` contract,
  ``base.py:272-276``);
- the expected next timestamp for a series of frequency code ``Y/S/Q/M`` is
  ``add_months(ts, months)``; for ``D`` it is ``date_add(ts, 1)``;
- gap detection / monotonicity are window expressions over
  ``Window.partitionBy(series_id).orderBy(ts)``.

Window-over-series partitions scale: series counts are large (millions) and
per-series row counts bounded (one obs per period), so the shuffle is
well-distributed and no single partition explodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.config import FREQ_CODE_MONTHS


def expected_next_ts(ts: Column, freq_code: Column) -> Column:
    """Next period start for a frequency code (Y/S/Q/M/D)."""
    expr = F.when(freq_code == "D", F.date_add(ts, 1))
    for code, months in FREQ_CODE_MONTHS.items():
        expr = expr.when(freq_code == code, F.add_months(ts, months))
    return expr


def period_start(ts: Column, freq_code: Column) -> Column:
    """Truncate a date to its period start for the given frequency code.

    Semester truncation has no built-in: month → 1 or 7.
    """
    return (
        F.when(freq_code == "Y", F.date_trunc("year", ts).cast("date"))
        .when(
            freq_code == "S",
            F.make_date(
                F.year(ts), F.when(F.month(ts) <= 6, 1).otherwise(7), F.lit(1)
            ),
        )
        .when(freq_code == "Q", F.date_trunc("quarter", ts).cast("date"))
        .when(freq_code == "M", F.date_trunc("month", ts).cast("date"))
        .otherwise(ts)
    )


_SERIES_KEY = ["catalog_id", "dataset_id", "distribution_id", "series_id"]


def series_window(obs: DataFrame | None = None) -> Window:
    """Per-series window over the FULL identity key. ``series_id`` alone
    is the column title on the CSV/TXT routes — NOT unique across
    distributions — so partitioning only by it would interleave two
    distributions' same-titled columns into one window and fire false
    duplicate/out-of-order/gap flags on valid data. When a frame is
    passed, only its present key columns are used (test frames may carry
    a bare series_id)."""
    if obs is None:
        keys = _SERIES_KEY
    else:
        keys = [k for k in _SERIES_KEY if k in obs.columns]
    return Window.partitionBy(*keys).orderBy("ts")


def with_series_checks(obs: DataFrame, freq_code_col: str = "freq_code") -> DataFrame:
    """Annotate a long observations frame with per-row validation flags
    (V4 semantics — series-tiempo-ar ``validate_distribution`` invoked at
    ``base.py:251-264``):

    - ``is_duplicate_ts``: same (series_id, ts) seen before (index must be
      duplicate-free);
    - ``is_out_of_order``: lag(ts) >= ts (index must be strictly increasing
      — always false after an orderBy window, kept for raw-ingest frames);
    - ``has_gap``: lag-based spacing differs from declared frequency.
    """
    w = series_window(obs)
    prev_ts = F.lag("ts").over(w)
    return (
        obs.withColumn("prev_ts", prev_ts)
        .withColumn(
            "is_duplicate_ts",
            F.coalesce(F.col("prev_ts") == F.col("ts"), F.lit(False)),
        )
        .withColumn(
            "is_out_of_order",
            F.coalesce(F.col("prev_ts") > F.col("ts"), F.lit(False)),
        )
        .withColumn(
            "has_gap",
            F.coalesce(
                (~F.col("is_duplicate_ts"))
                & (
                    expected_next_ts(F.col("prev_ts"), F.col(freq_code_col))
                    != F.col("ts")
                ),
                F.lit(False),
            ),
        )
        .drop("prev_ts")
    )


def gapfill_daily(df: DataFrame, key_cols: list[str], ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """Fill missing days per key with 0.0 between each key's min and max day.

    Built from ``sequence()`` + ``explode`` + left join — fully JVM-side.
    The per-key sequence stays bounded (one row per day of that key's span),
    and the join is an equi-join on (key, ts) so AQE/sort-merge handles
    scale; no driver-side iteration.
    """
    spans = df.groupBy(*key_cols).agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    )
    calendar = spans.select(
        *key_cols,
        F.explode(
            F.sequence("_min_ts", "_max_ts", F.expr("interval 1 day"))
        ).alias(ts_col),
    )
    agg = df.groupBy(*key_cols, ts_col).agg(F.sum(value_col).alias(value_col))
    return calendar.join(agg, on=[*key_cols, ts_col], how="left").withColumn(
        value_col, F.coalesce(F.col(value_col), F.lit(0.0))
    )
