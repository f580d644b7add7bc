"""Batch-5 queries: stream-stream interval join, vectorized pandas-UDAF
aggregation, single-window 2D skyline, and JSON property extraction.

SURVEY context: §2.11 motivates the streaming layer (the reference is
batch-only) — ``streaming_click_purchase_join`` adds the one streaming
operator class the engine didn't yet exercise, a watermarked
stream-stream join. §2.12 notes the UDF surface is pandas-UDF based;
``weighted_avg_discount_udaf`` pins the *grouped-aggregate* variant
(Arrow-batched UDAF) with a hash-matching SQL oracle. §1.2: the
reference's metadata model is nested JSON (data.json) — the JSON
extraction entry exercises the same semi-structured path on the data
plane (`events.props`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.queries import (
    det_round,
    load_table,
    register,
)


@register(
    "streaming_click_purchase_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    """,
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: every (purchase, click)
    pair for the same user where the click landed in the 30 minutes before
    the purchase — run through two readStream sources and hash-matching
    the batch SQL oracle. The watermark + time-range condition is what
    bounds join state on a real cluster: each side buffers only rows
    within watermark + interval of the stream clock, so state is
    O(rate × window), not O(history). The equi-key (user_id) shuffles both
    streams to the same tasks; the range predicate prunes within the
    buffer. The reference has no streaming at all (SURVEY §2.11)."""
    from series_tiempo_ar_scraping_spark.streaming.events import (
        read_events_stream_native,
    )

    p = (
        read_events_stream_native(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    c = (
        read_events_stream_native(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    name = "stream_click_purchase_join"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.table(name).localCheckpoint()
    q.stop()
    return result


@register(
    "weighted_avg_discount_udaf",
    oracle="""
    SELECT l_suppkey,
           CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
           / (100.0 * CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE))
             AS wavg_discount,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_suppkey
    """,
)
def weighted_avg_discount_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average discount per supplier via a *grouped
    aggregate* pandas UDF — the Arrow-batched UDAF surface (SURVEY §2.12).
    The kernel works in scaled int64 (discount × 100 is exact: the fixture
    carries 2-decimal discounts), so partial sums are order-independent and
    the single final IEEE division reproduces the oracle bit-exactly —
    the determinism discipline (queries.py docstring) applied to a Python
    aggregation. Plan shape: shuffle on l_suppkey, one Arrow batch per
    group — fine for the ~10k-supplier key space; a 100 TB run with
    billions of groups would pre-combine with a built-in sum pair instead
    (this entry exists to pin the UDAF machinery, not to replace one)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # Series -> scalar type hints select the GROUPED_AGG pandas UDF
    # variant; set them as live objects because this module uses postponed
    # annotations (PEP 563), which the UDF-type inference can't resolve.
    def _wavg(discount, quantity):
        di = np.rint(discount.to_numpy() * 100.0).astype(np.int64)
        qi = np.rint(quantity.to_numpy()).astype(np.int64)
        num = int((di * qi).sum())
        den = int(qi.sum())
        return float(num) / (100.0 * float(den))

    _wavg.__annotations__ = {
        "discount": pd.Series,
        "quantity": pd.Series,
        "return": float,
    }
    wavg = pandas_udf(_wavg, "double")

    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg(), so the row count is a pandas UDAF too.
    def _nrows(quantity):
        return len(quantity)

    _nrows.__annotations__ = {"quantity": pd.Series, "return": int}
    nrows = pandas_udf(_nrows, "long")

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        wavg("l_discount", "l_quantity").alias("wavg_discount"),
        nrows("l_quantity").alias("n_lines"),
    )


@register(
    "skyline_orders_pareto",
    oracle="""
    WITH d AS (
      SELECT o_orderkey, o_orderdate, o_totalprice,
             date_diff('day', DATE '1992-01-01', o_orderdate) AS dday
      FROM orders
    ),
    m AS (
      SELECT o_orderkey, o_orderdate, o_totalprice,
             MAX(o_totalprice) OVER (
               ORDER BY dday DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_newer
      FROM d
    )
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM m
    WHERE best_newer IS NULL OR o_totalprice > best_newer
    """,
)
def skyline_orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline (Pareto frontier): orders not dominated on
    (newer o_orderdate, higher o_totalprice) — an order survives iff no
    strictly-newer order has ≥ its price. The naive formulation is an
    O(n²) NOT EXISTS self-join; in 2D one running-max window over the
    date-descending order answers it exactly: ``best_newer`` is the max
    price among strictly newer orders (RANGE .. 1 PRECEDING on the
    day-number key makes date ties non-dominating, matching the strict
    inequality). One sort shuffle, no join — the only scalable skyline
    shape. Single global window: at 100 TB, pre-filter with per-partition
    skylines (a map-side candidate prune) before the global pass."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias("dday"),
    )
    w = (
        Window.orderBy(F.col("dday").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    m = d.select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.max("o_totalprice").over(w).alias("best_newer"),
    )
    return m.filter(
        F.col("best_newer").isNull() | (F.col("o_totalprice") > F.col("best_newer"))
    ).drop("best_newer")


@register(
    "json_props_bucket_stats",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(22,4))) AS DOUBLE) AS sum_value
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1, 2
    """,
)
def json_props_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction on the data plane: parse the JSON
    ``props`` payload with a declared schema (``from_json`` — typed,
    vectorized, no Python), bucket the extracted key, aggregate. The
    reference's whole metadata layer is nested JSON navigated in Python
    (SURVEY §1.2); this is the same capability as a declarative columnar
    expression. Schema-on-read with an explicit StructType means malformed
    rows go NULL instead of failing the job — the V7 error-channel stance
    applied to JSON."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.filter(F.col("props").isNotNull()).select(
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
        "event_type",
        "value",
    )
    return parsed.groupBy(
        (F.floor(F.col("k") / 10)).alias("k_bucket"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(22,4)")).cast("double").alias("sum_value"),
    )
