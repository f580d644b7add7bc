"""Streaming Count-Min-Sketch: per-window frequency cells.

The streaming twin of ``queries_batch10.cms_frequent_terms``: the sketch
is a (window, i, bucket) grouped count — a plain windowed streaming
aggregate, so Spark's incremental state IS the sketch, the per-trigger
partial counts merge by cellwise addition (exactly the CMS merge
operation), and append-mode emission finalizes a window's cells once the
watermark passes. The md5-seeded hash family is the repo's cross-engine-
stable one, so the batch lane of the same function is hash-oracled
(``cms_cells_hourly`` in queries_batch11).

100 TB posture: the state per window is bounded by D×W cells regardless
of term cardinality — where an exact per-term windowed count's state
grows with the vocabulary. Cells from different windows, days, or
clusters merge by addition, so a fleet of independent streaming jobs can
sketch disjoint shards and the union sketch is one cellwise sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.operators.dedup import hash64_seeded

CMS_D = 4
CMS_W = 64


def cms_cells(
    events: DataFrame,
    d: int = CMS_D,
    w: int = CMS_W,
    term: Column | None = None,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """CMS cells per event-time window: (window_start, i, bucket, c).

    Works identically on static and streaming frames (the repo's
    streaming convention, see ``events.tumbling_counts``): the grouping
    key keeps the FULL window column so the event-time metadata
    survives for append mode; the bucket projection happens after the
    aggregate."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    t = term if term is not None else F.col("event_type")
    probes = F.posexplode(
        F.array(
            *[(hash64_seeded(t, i) % w).cast("long") for i in range(d)]
        )
    )
    keyed = src.select("ts", probes.alias("i", "bucket"))
    return (
        keyed.groupBy(F.window("ts", window_len).alias("_w"), "i", "bucket")
        .agg(F.count("*").alias("c"))
        .select(
            F.col("_w.start").alias("window_start"), "i", "bucket", "c"
        )
    )


HLL_M = 64
HLL_RMAX = 55  # = 61 - log2(HLL_M): one above any natural rank


def hll_est_scale(m: int = HLL_M) -> float:
    """``alpha_m * m^2 * 2^60`` — the numerator of the raw HLL estimate
    when registers are summed as exact ints ``2^(60-r)``. Standard alpha
    table (Flajolet et al. 2007); computed in ONE fixed op order so the
    identical double reaches both engines (Spark literal and DuckDB
    ``repr`` literal). Single source for the batch calibration entry and
    the set-operation estimator."""
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return (alpha * m * m) * float(2**60)


def hll_bucket_rho(t: Column, m: int = HLL_M) -> tuple[Column, Column]:
    """Shared HLL geometry: (bucket, rho) columns for a term column.
    ``m`` must be a power of two; the bucket takes the LOW log2(m) hash
    bits and the rank comes from the REMAINING bits (trailing-zeros+1,
    clamped to 61-log2(m), which also covers the h2==0 case) — deriving
    both from ``m`` keeps any non-default geometry consistent instead
    of silently sharing bits between bucket and rank. The ONE spelling
    of the rank contract, reused by the batch calibration entry."""
    bits = m.bit_length() - 1
    if m != 1 << bits:
        raise ValueError("HLL register count m must be a power of two")
    rmax = 61 - bits
    h = hash64_seeded(t, 0)
    h2 = F.shiftright(h, bits)
    rho = (
        F.when(h2 == 0, F.lit(rmax))
        .otherwise(
            F.least(
                F.bit_count((h2.bitwiseAND(-h2)) - 1) + F.lit(1),
                F.lit(rmax),
            )
        )
        .cast("long")
    )
    return (h % m).alias("bucket"), rho.alias("rho")


def hll_registers(
    events: DataFrame,
    m: int = HLL_M,
    term: Column | None = None,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming HyperLogLog registers per event-time window:
    (window_start, bucket, r). The cardinality twin of ``cms_cells`` —
    the register is a windowed grouped MAX, which is exactly the HLL
    merge operation, so Spark's incremental state IS the sketch and
    shard sketches union by register-wise max. Same rank function as
    the batch calibration entry (trailing-zeros+1 of the post-bucket
    hash bits). State per window: at most ``m`` rows regardless of
    stream cardinality."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    t = term if term is not None else F.col("user_id").cast("string")
    bucket, rho = hll_bucket_rho(t, m)
    keyed = src.select("ts", bucket, rho)
    return (
        keyed.groupBy(F.window("ts", window_len).alias("_w"), "bucket")
        .agg(F.max("rho").alias("r"))
        .select(F.col("_w.start").alias("window_start"), "bucket", "r")
    )


BITMAP_W = 63  # 63-bit words: 1 << bit stays positive on both engines


def bitmap_words(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming EXACT-distinct state per event-time window:
    (window_start, word, bits) where ``bits`` is the bit_or of
    ``1 << (user_id % 63)`` within word ``user_id DIV 63`` — the exact
    twin of ``hll_registers``: bit_or is both the incremental state
    update AND the shard/window merge, state is |users|/63 words per
    window (vs HLL's fixed m cells), and any window's distinct count
    is SUM(bit_count(bits)) with no rescan. Same function runs batch
    and streaming (the repo's sketch-pair convention)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    keyed = src.select(
        "ts",
        F.expr(f"user_id DIV {BITMAP_W}").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {BITMAP_W}"
            " AS INT))"
        ).alias("bit"),
    )
    return (
        keyed.groupBy(F.window("ts", window_len).alias("_w"), "word")
        .agg(F.bit_or("bit").alias("bits"))
        .select(F.col("_w.start").alias("window_start"), "word", "bits")
    )
