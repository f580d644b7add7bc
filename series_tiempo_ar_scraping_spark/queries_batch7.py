"""Batch-7 queries: physical layout & scan-pruning techniques.

Data-skipping is the scale lever the logical plan can't see: at 100 TB a
well-clustered layout turns a two-dimensional predicate into a file-list
prune before a single byte is scanned. These entries make the layout
math itself hash-checkable — the Z-value (Morton) computation is pure
bit arithmetic, so DuckDB can verify every cell assignment — while the
write-path effects (per-file footer spans, dynamic partition pruning,
runtime bloom filters) are pinned by tests/test_layout.py, which
measures real parquet footers and physical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.operators.layout import (
    ZBITS,
    interleave_bits_sql,
    with_zvalue,
)
from series_tiempo_ar_scraping_spark.queries import load_table, register

# bucket = top 10 bits of the 32-bit Z-value -> at most 1024 buckets
_BUCKET_SHIFT = 2 * ZBITS - 10

_ZSQL = interleave_bits_sql("zx", "zy", ZBITS)


@register(
    "zorder_bucket_stats",
    oracle=f"""
    WITH base AS (
      SELECT o_totalprice AS price,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS dday
      FROM orders
    ),
    bounds AS (
      SELECT MIN(price) AS minp, MAX(price) AS maxp,
             MIN(dday) AS mind, MAX(dday) AS maxd
      FROM base
    ),
    grid AS (
      SELECT price, dday,
             CASE WHEN maxp = minp THEN 0 ELSE CAST(FLOOR(
               (price - minp) * {float(2 ** ZBITS - 1)} / (maxp - minp)
             ) AS BIGINT) END AS zx,
             CASE WHEN maxd = mind THEN 0 ELSE CAST(FLOOR(
               (CAST(dday AS DOUBLE) - CAST(mind AS DOUBLE))
               * {float(2 ** ZBITS - 1)}
               / (CAST(maxd AS DOUBLE) - CAST(mind AS DOUBLE))
             ) AS BIGINT) END AS zy
      FROM base CROSS JOIN bounds
    ),
    zed AS (SELECT price, dday, ({_ZSQL}) AS zv FROM grid)
    SELECT zv >> {_BUCKET_SHIFT} AS zbucket,
           COUNT(*) AS n,
           CAST(MIN(price) AS DOUBLE) AS min_price,
           CAST(MAX(price) AS DOUBLE) AS max_price,
           MIN(dday) AS min_day,
           MAX(dday) AS max_day
    FROM zed GROUP BY 1
    """,
)
def zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order cell assignment, hash-oracled: scale (o_totalprice,
    orderdate-days) onto a 2^16 grid, Morton-interleave the bits with
    pure Catalyst shift/mask expressions, and report per-Z-bucket counts
    and the min/max footprint of each dimension — exactly the zone-map
    content a clustered file would carry. The min-max bounds come from
    ONE 1-row aggregate broadcast back (no window over the fact table);
    everything else is a map-side expression plus one bounded-cardinality
    hash aggregate (≤1024 buckets), so the shuffle is independent of the
    input size. The write-path twin (`write_zordered`) range-partitions
    on this value; tests/test_layout.py proves the resulting parquet
    footers have tight per-file spans in BOTH dimensions."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_totalprice").alias("price"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("dday"),
    )
    zed = with_zvalue(base, F.col("price"), F.col("dday").cast("double"))
    return zed.groupBy(
        F.shiftright(F.col("zv"), _BUCKET_SHIFT).alias("zbucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("price").cast("double").alias("min_price"),
        F.max("price").cast("double").alias("max_price"),
        F.min("dday").alias("min_day"),
        F.max("dday").alias("max_day"),
    )
