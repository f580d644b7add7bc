#!/usr/bin/env python3
"""Streaming-lane throughput bench (VERDICT r9 #5).

The stateful streaming operators are correctness-proven (hash-matched
against batch SQL, crash-recovery pytest) but were excluded from
bench.py — the batch lanes had measured claims, the streaming lane had
none. This times each streaming operator at $SPARK_GRAFT_SF_DIR
(default sf0.1) reading natively off events.parquet (no staging I/O in
the timed window) through an availableNow memory-sink pass, and
reports rows-ingested/second.

Appends ONE record to BENCH_HISTORY.jsonl tagged bench_set=streaming —
the existing bench_set filter keeps it out of the batch lineage that
tools/bench_regression.py compares.

Usage: python tools/bench_streaming.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from series_tiempo_ar_scraping_spark.session import get_spark  # noqa: E402
from series_tiempo_ar_scraping_spark.streaming import events as SE  # noqa: E402
from series_tiempo_ar_scraping_spark.streaming.stateful import (  # noqa: E402
    funnel_stream,
    sessionize_stream,
)


def _drain(stream_df, name: str, mode: str) -> float:
    """Start → awaitTermination wall time for one availableNow pass."""
    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from bench import _cpu_stat  # steal telemetry (r11)

    stat0 = _cpu_stat()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    n_rows = spark.read.parquet(
        sf_dir.rstrip("/") + "/events.parquet"
    ).count()

    def native():
        return SE.read_events_stream_native(spark, sf_dir)

    # each operator: (name, stream builder, output mode)
    ops = [
        (
            "tumbling_counts",
            lambda: SE.tumbling_counts(native()),
            "complete",
        ),
        (
            "watermarked_dedup",
            lambda: SE.dedup_events(native()),
            "append",
        ),
        (
            "sessionize_stream",
            lambda: sessionize_stream(native()),
            "append",
        ),
        (
            "funnel_stream",
            lambda: funnel_stream(native()),
            "append",
        ),
        (
            "lww_upsert",
            lambda: (
                native()
                .select(
                    "user_id",
                    "event_type",
                    (
                        F.expr(
                            "timestampdiff(SECOND,"
                            " TIMESTAMP '1970-01-01 00:00:00',"
                            " date_trunc('second', ts))"
                        ).cast("long")
                        * 1000000
                        + F.col("event_id")
                    ).alias("packed"),
                )
                .groupBy("user_id")
                .agg(
                    F.count("*").alias("n_events"),
                    F.max_by("event_type", F.col("packed")).alias(
                        "last_event_type"
                    ),
                )
            ),
            "complete",
        ),
    ]

    results = {}
    for i, (name, build, mode) in enumerate(ops):
        sec = _drain(build(), f"bench_stream_{i}_{name}", mode)
        results[name] = {
            "sec": sec,
            "rows_in": n_rows,
            "rows_per_sec": round(n_rows / sec) if sec > 0 else None,
        }
        print(f"BENCH_DETAIL streaming {name}: {sec}s "
              f"({results[name]['rows_per_sec']} rows/s)")

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    record = {
        "ts": round(time.time(), 3),
        "sf": sf_val,
        "bench_set": "streaming",
        "streaming": results,
        "n_input_rows": n_rows,
    }
    stat1 = _cpu_stat()
    if stat0 and stat1 and stat1[1] > stat0[1]:
        # hypervisor-steal share over the run (see bench.py): a record
        # with steal_pct >~1 rode a contended host and should not be
        # used as a regression baseline
        record["steal_pct"] = round(
            100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2
        )
    hist = os.path.join(REPO, "BENCH_HISTORY.jsonl")
    with open(hist, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps({
        "metric": "streaming_ops_rows_per_sec",
        "sf": sf_val,
        "ops": {k: v["rows_per_sec"] for k, v in results.items()},
        "unit": "rows/sec",
    }))


if __name__ == "__main__":
    main()
