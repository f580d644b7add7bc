"""Streaming sinks (SURVEY §2.11 — the write half of the stream layer).

The reference is batch-only; its sink contract is "standardized files
under the output tree" (K1/K2, ``base.py:266-279``). The streaming
analogue: continuous appends into the partitioned-parquet observations
store (the engine's scale sink, ``sinks/csv_wide.py:
write_observations_parquet``) driven by ``foreachBatch`` — each
microbatch is one idempotent batch write (overwrite of its own
``batch_id=N`` directory), so a batch replayed after a crash between
the write and the checkpoint commit rewrites the same directory
instead of duplicating rows: exactly-once at batch granularity.

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
    ``foreachBatch`` + ``availableNow``. Returns the finished query.

    Idempotence: a blind ``mode("append")`` in ``foreachBatch`` is only
    at-least-once — a crash after the append but before the checkpoint
    commit replays the batch and duplicates rows. Here every microbatch
    OVERWRITES its own ``batch_id=N`` subdirectory, so a replay rewrites
    the same files and the guarantee is exactly-once at batch
    granularity. ``batch_id`` surfaces as a partition column on read;
    downstream compaction can fold it away
    (``sinks.csv_wide.compact_observations_parquet``).
    """
    import os

    parts = partition_cols or []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(os.path.join(path, f"batch_id={batch_id}"))

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
