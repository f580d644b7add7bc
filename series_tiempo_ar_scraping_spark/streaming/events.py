"""Structured Streaming over the events table (SURVEY §2.11).

The reference is batch-only; this layer treats "new observations for
existing series" as an append stream (TESTDATA's ``events`` is the
fixture). Same DataFrame expressions as the batch queries — the point of
Structured Streaming — plus watermarks for late data and exactly-once-ish
dedup on event ids.

Batch/stream parity: ``tumbling_counts(df)`` accepts either a static or a
streaming frame; tests run it both ways and compare (availableNow trigger
drains the parquet source into a memory sink).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, dir_path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


EVENTS_SCHEMA_NANOS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # INT64 TIMESTAMP(NANOS) as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_ts_field(sf_dir: str):
    """Probe the parquet footer for the actual logical type of ``ts``.

    File-stream sources require an explicit schema, and the fixture's
    ``ts`` column has changed physical type across testdata generations
    (INT64 TIMESTAMP(NANOS) → timestamp[us] NTZ) — assuming either one
    silently corrupts timestamps 1000×. One cheap footer read settles it.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir.rstrip("/"), "events.parquet")
    if os.path.isdir(path):
        inner = [p for p in sorted(os.listdir(path)) if p.endswith(".parquet")]
        if not inner:
            raise FileNotFoundError(
                f"{path} is a directory with no part files — interrupted "
                "write? the stream reader needs at least one footer to "
                "probe the ts physical type"
            )
        path = os.path.join(path, inner[0])
    return pa.types, pq.read_schema(path).field("ts").type


def read_events_stream_native(spark: SparkSession, sf_dir: str,
                              max_files_per_trigger: int = 1) -> DataFrame:
    """Stream straight off the driver-generated ``events.parquet``.

    The ``ts`` logical type is probed from the footer (see
    ``_events_ts_field``) instead of hard-coded; the file-stream source
    requires a *directory* basePath — the trailing glob makes Spark treat
    ``sf_dir`` as the base while matching only the events file. Output
    ``ts`` always matches the batch ``load_table`` type so batch/stream
    parity holds.
    """
    glob_path = sf_dir.rstrip("/") + "/events.parquet*"
    pa_types, ts_type = _events_ts_field(sf_dir)
    if pa_types.is_integer(ts_type):
        # Legacy INT64 TIMESTAMP(NANOS): read nanos as long, truncate to µs
        # exactly like load_table (and DuckDB's ns→µs truncation).
        # SESSION-SCOPED side effect, deliberately not restored: the
        # legacy conf must still be set when the stream EXECUTES (reads
        # are lazy), so it stays for the session. Mixed-generation
        # sessions don't occur in practice (one fixture generation per
        # harness run); the non-nanos branch below resets it defensively.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA_NANOS)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(glob_path)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Real timestamp logical type. tz-naive parquet → TIMESTAMP_NTZ, but
    # watermarks demand TIMESTAMP_LTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    # — read at the file's own type, then cast: under the engine's pinned
    # UTC session timezone the NTZ→LTZ cast is instant-preserving, so
    # windows/gaps agree with the batch oracles bit-for-bit.
    # defensive reset: a prior nanos-generation call in this session must
    # not leak the legacy long-read mode into a real-timestamp fixture
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark_ts = (
        T.TimestampType() if getattr(ts_type, "tz", None) else T.TimestampNTZType()
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", spark_ts),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(glob_path)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-ish ingest: drop duplicate event_ids within the
    watermark horizon. MUST be ``dropDuplicatesWithinWatermark`` — plain
    ``dropDuplicates(['event_id'])`` only evicts state when the
    event-time column is part of the dedup key, so it would accumulate
    one state entry per distinct event_id forever (the exact OOM this
    operator exists to prevent)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def tumbling_counts(events: DataFrame, window_len: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Windowed aggregation with late-data tolerance; works identically on
    static and streaming frames."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    # group by the FULL window column (projecting .start inside the key
    # strips the event-time/watermark metadata, which forbids append-mode
    # output); the bucket projection happens after the aggregate.
    return (
        src.groupBy(F.window("ts", window_len).alias("_w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(22,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("_w.start").alias("bucket"), "event_type", "n", "sum_value"
        )
    )


def run_to_memory(stream_df: DataFrame, query_name: str,
                  output_mode: str = "complete") -> None:
    """Drain an availableNow pass into an in-memory table (test harness).

    ``output_mode`` defaults to complete (the aggregate-query case);
    pass ``"append"`` for non-aggregate streams such as ``dedup_events``
    output — complete mode is rejected for those."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
