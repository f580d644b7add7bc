"""Consumer read API over the observations store.

The reference ecosystem serves its scraped series to downstream
consumers (the series-tiempo API/explorer read the published CSVs; see
reference ``base.py:266-279`` for the published artifact). This module
is that consumption surface re-expressed against the engine's long-form
parquet store (``sinks/csv_wide.py:write_observations_parquet``): every
accessor is a thin declarative wrapper whose filters land in the scan —
catalog/frequency predicates prune partitions (directory skips),
series-id predicates push into parquet row-group stats (the store sorts
by ``(series_id, ts)`` within partitions exactly so these reads skip
non-matching row groups), and time bounds push down as min/max filters.
No accessor ever collects or loops driver-side; each returns a
DataFrame the caller composes further.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_observations(spark: SparkSession, store: str) -> DataFrame:
    """Open the long-form observations store (partition columns
    ``catalog_id`` / ``freq_code`` come back as regular columns)."""
    return spark.read.parquet(store)


def get_series(
    spark: SparkSession,
    store: str,
    series_ids: list[str] | str,
    start=None,
    end=None,
    catalog_id: str | None = None,
) -> DataFrame:
    """Fetch observations for one or more series, optionally bounded in
    time and restricted to a catalog.

    The filter order is the pruning story: ``catalog_id`` is a partition
    column (directory skip), ``series_id`` hits row-group min/max stats
    (the store is sorted by series within partitions), and the ts bounds
    are plain pushed filters. All three reach the scan — asserted in
    tests/test_api.py."""
    if isinstance(series_ids, str):
        series_ids = [series_ids]
    df = read_observations(spark, store)
    if catalog_id is not None:
        df = df.filter(F.col("catalog_id") == catalog_id)
    df = df.filter(F.col("series_id").isin(series_ids))
    if start is not None:
        df = df.filter(F.col("ts") >= F.lit(start))
    if end is not None:
        df = df.filter(F.col("ts") < F.lit(end))
    return df.orderBy("series_id", "ts")


def series_summary(spark: SparkSession, store: str,
                   catalog_id: str | None = None) -> DataFrame:
    """Per-series inventory: observation count, time extent, value range
    — the `/series` listing endpoint's backing query. One partial-agg
    shuffle. Series identifiers are CATALOG-scoped in the reference data
    model, so the grouping key always includes ``catalog_id`` — without
    it a multi-catalog store would silently merge same-named series
    (the defect class the CSV sink had in round 3)."""
    df = read_observations(spark, store)
    if catalog_id is not None:
        df = df.filter(F.col("catalog_id") == catalog_id)
    return df.groupBy("catalog_id", "series_id").agg(
        F.count("*").alias("n_obs"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def resample(df: DataFrame, freq: str = "month",
             how: str = "avg") -> DataFrame:
    """Downsample observations to a coarser calendar frequency —
    the API's `collapse` parameter. ``freq`` is any `date_trunc` unit;
    ``how`` ∈ {avg, sum, min, max, last}. `last` is the end-of-period
    convention, deterministic under timestamp ties (max_by on a
    (ts, value) struct — the larger value wins a tied ts instead of an
    arbitrary one). The key includes ``catalog_id`` when the frame
    carries it (series ids are catalog-scoped). One hash aggregate."""
    aggs = {
        "avg": F.avg("value"),
        "sum": F.sum("value"),
        "min": F.min("value"),
        "max": F.max("value"),
        "last": F.max_by("value", F.struct("ts", "value")),
    }
    if how not in aggs:
        raise ValueError(f"unknown how={how!r}; expected one of {sorted(aggs)}")
    keys = (["catalog_id"] if "catalog_id" in df.columns else []) + [
        "series_id"
    ]
    return (
        df.groupBy(*keys, F.date_trunc(freq, "ts").alias("period"))
        .agg(aggs[how].alias("value"), F.count("*").alias("n_source_obs"))
    )
