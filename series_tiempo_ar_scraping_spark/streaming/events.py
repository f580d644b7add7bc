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


def read_events_stream_native(spark: SparkSession, sf_dir: str,
                              max_files_per_trigger: int = 1) -> DataFrame:
    """Stream straight off the driver-generated ``events.parquet``.

    Two gotchas handled here: the file carries INT64 TIMESTAMP(NANOS)
    (read nanos as long, truncate to µs exactly like ``load_table``), and
    the file-stream source requires a *directory* basePath — the trailing
    glob makes Spark treat ``sf_dir`` as the base while matching only the
    events file.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA_NANOS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir.rstrip("/") + "/events.parquet*")
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-ish ingest: drop duplicate event_ids within the
    watermark horizon (state is bounded by the watermark — unbounded
    dedup state would OOM a real cluster)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def tumbling_counts(events: DataFrame, window_len: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Windowed aggregation with late-data tolerance; works identically on
    static and streaming frames."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", window_len).start.alias("bucket"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(22,4)")).cast("double").alias("sum_value"),
    )


def run_to_memory(stream_df: DataFrame, query_name: str) -> None:
    """Drain an availableNow pass into an in-memory table (test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
