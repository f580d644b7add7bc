"""Streaming sinks (SURVEY §2.11 — the write half of the stream layer).

The reference is batch-only; its sink contract is "standardized files
under the output tree" (K1/K2, ``base.py:266-279``). The streaming
analogue: continuous appends into the partitioned-parquet observations
store (the engine's scale sink, ``sinks/csv_wide.py:
write_observations_parquet``) driven by ``foreachBatch`` — each
microbatch is one idempotent batch write, and the checkpoint makes
restarts exactly-once at batch granularity (a replayed batch id is
skipped, not re-written).

``foreachBatch`` over a plain ``writeStream.parquet`` because the batch
hook can (a) partition-by like the batch sink, (b) run arbitrary batch
logic per microbatch (merge/dedup/compaction) — the shape a real
ingestion pipeline needs at 100 TB, where the sink does small-file
compaction and partition routing, not blind appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_append_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_cols: list[str] | None = None,
    query_name: str = "stream_append_parquet",
):
    """Drain a stream into a partitioned parquet dataset via
    ``foreachBatch`` + ``availableNow`` (one idempotent append per
    microbatch, checkpointed batch ids). Returns the finished query.
    """
    parts = partition_cols or []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("append")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(path)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
