"""applyInPandasWithState sessionization (streaming/stateful.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("append").parquet(path)


def test_sessionize_stream_gap_and_timeout(spark, tmp_path):
    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.stateful import (
        sessionize_stream,
    )

    src = str(tmp_path / "events_src")
    # user 1: two sessions split by a >30min gap; user 2: one session.
    _write_batch(
        spark,
        src,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:10:00", 1, "view", 1.0, "{}"),
            (3, "2024-01-01 11:30:00", 1, "click", 1.0, "{}"),  # new session
            (4, "2024-01-01 10:05:00", 2, "click", 1.0, "{}"),
        ],
    )
    # A late second file pushes the watermark far forward so the open
    # sessions hit their event-time timeout and flush.
    _write_batch(
        spark,
        src,
        [(9, "2024-01-02 00:00:00", 99, "click", 1.0, "{}")],
    )

    stream = SE.read_events_stream(spark, src, max_files_per_trigger=1)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.user_id, str(r.session_start), str(r.session_end)): r.n_events
        for r in spark.table("sessions_test").collect()
    }
    q.stop()

    # user 1 session A: 10:00-10:10 (2 events), closed by the 11:30 event
    assert rows[(1, "2024-01-01 10:00:00", "2024-01-01 10:10:00")] == 2
    # user 1 session B + user 2's session flush via event-time timeout
    assert rows[(1, "2024-01-01 11:30:00", "2024-01-01 11:30:00")] == 1
    assert rows[(2, "2024-01-01 10:05:00", "2024-01-01 10:05:00")] == 1


def test_session_fn_pure():
    """The state-transition function is testable without a stream."""
    from series_tiempo_ar_scraping_spark.streaming.stateful import _session_fn

    class FakeState:
        def __init__(self):
            self.hasTimedOut = False
            self.exists = False
            self._v = None
            self.removed = False
            self.timeout_ms = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)
            self.exists = True

        def remove(self):
            self.removed = True
            self.exists = False

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

    fn = _session_fn(30)
    st = FakeState()
    ts = pd.Series(pd.to_datetime([
        "2024-01-01 10:00:00", "2024-01-01 10:10:00", "2024-01-01 12:00:00"
    ]))
    out = list(fn((7,), iter([pd.DataFrame({"ts": ts})]), st))
    # one closed session emitted; the 12:00 event stays open in state
    assert len(out) == 1 and len(out[0]) == 1
    assert out[0].iloc[0]["n_events"] == 2
    assert st.exists and st._v[2] == 1
    assert st.timeout_ms is not None


def test_foreach_batch_parquet_sink_exactly_once(spark, tmp_path, sf_dir):
    """K-side of §2.11: foreachBatch appends each microbatch into the
    partitioned parquet store; a restart against the same checkpoint
    replays nothing (batch ids are committed), so row counts are stable."""
    from series_tiempo_ar_scraping_spark.session import load_table
    from series_tiempo_ar_scraping_spark.streaming.events import (
        read_events_stream_native,
    )
    from series_tiempo_ar_scraping_spark.streaming.sinks import (
        stream_append_parquet,
    )

    out = str(tmp_path / "obs_stream")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream_native(
        spark, sf_dir, max_files_per_trigger=1
    ).select("event_id", "ts", "user_id", "event_type", "value")
    stream_append_parquet(
        stream, out, ckpt, partition_cols=["event_type"]
    )
    got = spark.read.parquet(out)
    want = load_table(spark, sf_dir, "events").count()
    assert got.count() == want
    # idempotent layout: one batch_id=N dir per microbatch, with
    # event_type partition routing inside it
    import os

    batch_dirs = [d for d in os.listdir(out) if d.startswith("batch_id=")]
    assert batch_dirs
    assert any(
        d.startswith("event_type=")
        for d in os.listdir(os.path.join(out, batch_dirs[0]))
    )
    # a replayed batch overwrites its own directory instead of appending:
    # re-running the first batch's write must not change total rows
    # (materialize first — can't overwrite a path while reading it)
    replay = spark.createDataFrame(
        spark.read.parquet(os.path.join(out, batch_dirs[0])).collect()
    )
    replay.write.mode("overwrite").partitionBy("event_type").parquet(
        os.path.join(out, batch_dirs[0])
    )
    assert spark.read.parquet(out).count() == want

    # restart with the same checkpoint: no new data -> no new rows
    stream2 = read_events_stream_native(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    stream_append_parquet(stream2, out, ckpt, partition_cols=["event_type"])
    assert spark.read.parquet(out).count() == want


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """The watermark contract, observed end to end: after the first
    microbatch advances the watermark past a window's end, that window
    is emitted (append mode) and a later-arriving row for it is DROPPED
    — bounded state means late data beyond the horizon is sacrificed,
    by design. Two single-file microbatches with forced mtime order."""
    import os
    import time

    from pyspark.sql import functions as F

    from series_tiempo_ar_scraping_spark.streaming import events as SE

    d = str(tmp_path / "late_src")
    os.makedirs(d)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sub = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, name + ".parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = time.time() - 1000
    # batch 1: one 10:30 event + a 13:30 event that pushes the watermark
    # (2h delay) to 11:30 — past the [10:00, 11:00) window end.
    write_file("b1", [
        (1, "2024-01-01 10:30:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 13:30:00", 1, "click", 1.0, "{}"),
    ], t0)
    # batch 2: on-time row. The watermark ADVANCES one trigger behind the
    # data (it is computed from the previous batch's max event time), so
    # this intermediate batch is what makes 11:30 effective for batch 3.
    write_file("b2", [
        (3, "2024-01-01 13:40:00", 1, "click", 1.0, "{}"),
    ], t0 + 100)
    # batch 3: a LATE 10:40 row for the long-closed window, plus a fresh
    # 14:00 row whose window stays open (never emitted in append mode).
    write_file("b3", [
        (4, "2024-01-01 10:40:00", 1, "click", 1.0, "{}"),
        (5, "2024-01-01 14:00:00", 1, "click", 1.0, "{}"),
    ], t0 + 200)

    agg = SE.tumbling_counts(
        SE.read_events_stream(spark, d, max_files_per_trigger=1)
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("late_test").collect()
    # exactly the closed 10:00 window, with ONLY the on-time row counted
    assert len(rows) == 1, rows
    assert rows[0].bucket.hour == 10 and rows[0].n == 1, rows


def test_session_fn_late_event_does_not_corrupt_session_start():
    """An allowed-late event far before the open session must become its
    own closed session; one within the gap of session_start extends the
    session backward. Neither may be silently absorbed via last_ts."""
    from series_tiempo_ar_scraping_spark.streaming.stateful import _session_fn

    class FakeState:
        hasTimedOut = False
        exists = True

        def __init__(self, tup):
            self._v = tup

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def setTimeoutTimestamp(self, ms):
            pass

    fn = _session_fn(30)

    def us(s):
        return int(pd.Timestamp(s).value // 1_000)

    # open session 12:00-12:10; late 11:15 is > gap before start
    st = FakeState((us("2024-01-01 12:00:00"), us("2024-01-01 12:10:00"), 3))
    ts = pd.Series(pd.to_datetime(["2024-01-01 11:15:00"]))
    out = list(fn((7,), iter([pd.DataFrame({"ts": ts})]), st))
    assert len(out) == 1 and len(out[0]) == 1
    r = out[0].iloc[0]
    assert str(r["session_start"]) == "2024-01-01 11:15:00"
    assert r["n_events"] == 1
    assert st._v[0] == us("2024-01-01 12:00:00")  # open session untouched

    # late 11:45 is within the 30-min gap of 12:00 -> extends backward
    st2 = FakeState((us("2024-01-01 12:00:00"), us("2024-01-01 12:10:00"), 3))
    ts2 = pd.Series(pd.to_datetime(["2024-01-01 11:45:00"]))
    out2 = list(fn((7,), iter([pd.DataFrame({"ts": ts2})]), st2))
    assert out2 == []  # nothing closes
    assert st2._v[0] == us("2024-01-01 11:45:00")  # start extended
    assert st2._v[2] == 4


def test_cms_cells_stream_merges_to_batch_sketch(spark, tmp_path):
    """The CMS merge property, end to end: streaming the source as two
    single-file microbatches (incremental cellwise state) produces
    EXACTLY the cells of one batch pass over the union — the property
    that lets a fleet sketch disjoint shards and sum the sketches."""
    import os
    import time

    from pyspark.sql import functions as F

    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.sketch import cms_cells

    d = str(tmp_path / "cms_src")
    os.makedirs(d)
    t0 = time.time() - 1000
    rows1 = [
        (i, f"2024-01-01 10:{i % 60:02d}:00", i, f"term{i % 7}", 1.0, "{}")
        for i in range(40)
    ]
    rows2 = [
        (100 + i, f"2024-01-01 11:{i % 60:02d}:00", i, f"term{i % 5}",
         1.0, "{}")
        for i in range(30)
    ]
    for name, rows, mt in (("b1", rows1, t0), ("b2", rows2, t0 + 100)):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sub = str(tmp_path / name)
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, name + ".parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (mt, mt))

    streamed = cms_cells(
        SE.read_events_stream(spark, d, max_files_per_trigger=1)
    )
    q = (
        streamed.writeStream.format("memory")
        .queryName("cms_merge_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.window_start, r.i, r.bucket, r.c)
        for r in spark.table("cms_merge_test").collect()
    )
    want = sorted(
        (r.window_start, r.i, r.bucket, r.c)
        for r in cms_cells(spark.read.parquet(d)).collect()
    )
    assert got == want and len(want) > 0
    # sketch state is bounded: at most D x W cells per window
    from series_tiempo_ar_scraping_spark.streaming.sketch import CMS_D, CMS_W
    per_window = {}
    for ws, i, b, c in want:
        per_window[ws] = per_window.get(ws, 0) + 1
    assert all(n <= CMS_D * CMS_W for n in per_window.values())


def test_cms_cells_append_mode_finalizes_closed_windows(spark, tmp_path):
    """Append-mode contract for the streaming sketch: once the watermark
    passes a window's end, that window's cells are EMITTED and match the
    batch sketch of its on-time rows — pinning that cms_cells keeps the
    event-time metadata (grouping by the full window column) that
    append mode requires."""
    import os
    import time

    from pyspark.sql import functions as F

    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.sketch import cms_cells

    d = str(tmp_path / "cms_app_src")
    os.makedirs(d)
    t0 = time.time() - 1000

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sub = str(tmp_path / ("s_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, name + ".parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (mtime, mtime))

    in_window = [
        (i, "2024-01-01 10:15:00", i, f"term{i % 5}", 1.0, "{}")
        for i in range(20)
    ]
    # 13:30 pushes the watermark (2h) to 11:30, past the 10:00 window
    write_file("b1", in_window + [
        (99, "2024-01-01 13:30:00", 1, "later", 1.0, "{}")
    ], t0)
    # watermark advances one trigger behind the data: this batch makes
    # 11:30 effective, closing [10:00, 11:00)
    write_file("b2", [
        (100, "2024-01-01 13:40:00", 1, "later", 1.0, "{}")
    ], t0 + 100)

    streamed = cms_cells(
        SE.read_events_stream(spark, d, max_files_per_trigger=1)
    )
    q = (
        streamed.writeStream.format("memory")
        .queryName("cms_append_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.window_start, r.i, r.bucket, r.c)
        for r in spark.table("cms_append_test").collect()
    )
    # exactly the closed 10:00 window; the 13:00 window stays open
    assert got and all(ws.hour == 10 for ws, _, _, _ in got)
    static = spark.createDataFrame(
        in_window,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = sorted(
        (r.window_start, r.i, r.bucket, r.c)
        for r in cms_cells(static).collect()
    )
    assert got == want


def test_hll_registers_stream_merges_to_batch_sketch(spark, tmp_path):
    """Register-wise MAX is the HLL merge: streaming two microbatches
    produces exactly the batch registers of the union."""
    import os
    import time

    from pyspark.sql import functions as F

    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.sketch import (
        hll_registers,
    )

    d = str(tmp_path / "hll_src")
    os.makedirs(d)
    t0 = time.time() - 1000
    batches = [
        [(i, f"2024-01-01 10:{i % 60:02d}:00", 1000 + i, "click", 1.0,
          "{}") for i in range(50)],
        [(100 + i, f"2024-01-01 10:{i % 60:02d}:00", 2000 + i, "view",
          1.0, "{}") for i in range(50)],
    ]
    for idx, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sub = str(tmp_path / f"hs_{idx}")
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"b{idx}.parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (t0 + idx * 100, t0 + idx * 100))

    streamed = hll_registers(
        SE.read_events_stream(spark, d, max_files_per_trigger=1)
    )
    q = (
        streamed.writeStream.format("memory")
        .queryName("hll_merge_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.window_start, r.bucket, r.r)
        for r in spark.table("hll_merge_test").collect()
    )
    want = sorted(
        (r.window_start, r.bucket, r.r)
        for r in hll_registers(spark.read.parquet(d)).collect()
    )
    assert got == want and len(want) > 0
    from series_tiempo_ar_scraping_spark.streaming.sketch import HLL_M
    assert len(want) <= HLL_M  # bounded state: at most m registers


def test_hll_bucket_rho_geometry_derives_from_m(spark):
    """The review-found defect, pinned: bucket and rank must not share
    hash bits for ANY power-of-two m. For m in {32, 64, 128}: buckets
    stay in [0, m), ranks in [1, 61-log2(m)], and the rank of a value
    must be computable from the post-bucket bits only (verified against
    a pure-Python recomputation of the same md5 contract)."""
    import hashlib

    import pytest

    from pyspark.sql import functions as F

    from series_tiempo_ar_scraping_spark.streaming.sketch import (
        hll_bucket_rho,
    )

    df = spark.createDataFrame(
        [(str(i),) for i in range(200)], "v string"
    )
    for m in (32, 64, 128):
        bits = m.bit_length() - 1
        rmax = 61 - bits
        bucket, rho = hll_bucket_rho(F.col("v"), m)
        rows = df.select("v", bucket, rho).collect()
        for r in rows:
            h = int(hashlib.md5(f"0|{r.v}".encode()).hexdigest()[:15], 16)
            assert r.bucket == h % m
            h2 = h >> bits
            want = rmax if h2 == 0 else min((h2 & -h2).bit_length(), rmax)
            assert r.rho == want, (m, r.v, r.rho, want)
            assert 0 <= r.bucket < m and 1 <= r.rho <= rmax
    with pytest.raises(ValueError, match="power of two"):
        hll_bucket_rho(F.col("v"), 48)


def test_bitmap_words_stream_merges_to_batch_and_counts_exactly(
    spark, tmp_path
):
    """bit_or is the bitmap merge: streaming two microbatches produces
    exactly the batch words of the union, and SUM(bit_count(bits))
    over a window equals the true COUNT(DISTINCT user) — the EXACT
    counterpart of the HLL register test."""
    import os
    import time

    from pyspark.sql import functions as F

    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.sketch import (
        bitmap_words,
    )

    d = str(tmp_path / "bm_src")
    os.makedirs(d)
    t0 = time.time() - 1000
    batches = [
        [(i, f"2024-01-01 10:{i % 60:02d}:00", 1000 + (i % 70), "click",
          1.0, "{}") for i in range(50)],
        [(100 + i, f"2024-01-01 10:{i % 60:02d}:00", 1040 + (i % 70),
          "view", 1.0, "{}") for i in range(50)],
    ]
    for idx, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sub = str(tmp_path / f"bs_{idx}")
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"b{idx}.parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (t0 + idx * 100, t0 + idx * 100))

    streamed = bitmap_words(
        SE.read_events_stream(spark, d, max_files_per_trigger=1)
    )
    q = (
        streamed.writeStream.format("memory")
        .queryName("bm_merge_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.window_start, r.word, r.bits)
        for r in spark.table("bm_merge_test").collect()
    )
    union = spark.read.parquet(d)
    want = sorted(
        (r.window_start, r.word, r.bits)
        for r in bitmap_words(union).collect()
    )
    assert got == want and len(want) > 0
    # exactness: popcount sum == true distinct per window
    counted = (
        bitmap_words(union)
        .groupBy("window_start")
        .agg(F.sum(F.bit_count("bits")).alias("n"))
        .collect()
    )
    truth = {
        r.window_start: r.n
        for r in union.select(
            F.date_trunc("hour", "ts").alias("window_start"), "user_id"
        )
        .groupBy("window_start")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in counted:
        assert r.n == truth[r.window_start]


def test_sessionize_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Failure-recovery contract (VERDICT r7 #3): a stateful streaming
    query CRASHES mid-stream — after its sink wrote a microbatch but
    BEFORE the checkpoint committed the offset (the worst replay case) —
    and a restart from the same checkpoint dir must (a) replay the
    uncommitted batch idempotently, (b) restore the open-session state
    spanning the crash, and (c) end with the sink equal to the batch
    semantics of the full input, every session exactly once."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.stateful import (
        sessionize_stream,
    )

    src = str(tmp_path / "events_src")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")

    # f1: user 1 opens a session (2 events), user 2 opens a session.
    _write_batch(
        spark,
        src,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:10:00", 1, "view", 1.0, "{}"),
            (3, "2024-01-01 10:05:00", 2, "click", 1.0, "{}"),
        ],
    )
    # f2: user 1's session CONTINUES (gap < 30 min) — this is the batch
    # whose commit the crash will lose, so recovery must stitch these
    # events onto the restored open session, not start a new one.
    _write_batch(
        spark,
        src,
        [
            (4, "2024-01-01 10:20:00", 1, "click", 1.0, "{}"),
            (5, "2024-01-01 10:25:00", 1, "purchase", 5.0, "{}"),
        ],
    )

    def make_writer(crash_on: int | None):
        def write_batch(batch_df, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"batch_id={batch_id}")
            )
            if crash_on is not None and batch_id == crash_on:
                raise RuntimeError("injected crash after sink write")

        return write_batch

    def run(crash_on: int | None) -> None:
        stream = SE.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            sessionize_stream(stream)
            .writeStream.foreachBatch(make_writer(crash_on))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Run 1: batch 0 (f1) commits; batch 1 (f2) writes its sink dir,
    # then the "process" dies before the checkpoint commit.
    try:
        run(crash_on=1)
        raise AssertionError("injected crash did not surface")
    except StreamingQueryException:
        pass

    # f3: far-future event pushes the watermark past every open session
    # so event-time timeout flushes them after the restart.
    _write_batch(
        spark,
        src,
        [(9, "2024-01-02 00:00:00", 99, "click", 1.0, "{}")],
    )

    # Run 2: same checkpoint. Batch 1 is REPLAYED (it never committed),
    # overwriting its own batch_id=1 dir — idempotent; then f3 advances
    # the watermark and the timeout closes users 1 and 2.
    run(crash_on=None)

    got = [
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.read.parquet(out).collect()
    ]
    # exactly once: no (user, session_start) appears twice across the
    # whole sink, even though batch 1 executed twice
    keys = [(u, s) for u, s, _, _ in got]
    assert len(keys) == len(set(keys)), got
    # batch semantics of the full input (30-min gap sessionization):
    # user 1 = ONE session 10:00-10:25 x4 events (stitched across the
    # crash boundary), user 2 = singleton. user 99's session is still
    # open in state — correctly absent.
    assert set(got) == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:25:00", 4),
        (2, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1),
    }, got


def test_cms_cells_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Recovery contract for the WINDOWED-AGGREGATE state kind (the
    sessionizer test covers applyInPandasWithState): the crash lands in
    the exact batch that closes a window and emits its sketch cells —
    sink written, offset uncommitted. The restart must replay that
    batch from the committed window state, overwrite the same sink dir
    (idempotent), and the final sink must equal the batch sketch of the
    closed window's rows, every cell exactly once."""
    import os
    import time

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.sketch import cms_cells

    d = str(tmp_path / "cms_rec_src")
    out = str(tmp_path / "cms_rec_out")
    ckpt = str(tmp_path / "cms_rec_ckpt")
    os.makedirs(d)
    t0 = time.time() - 1000

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sub = str(tmp_path / ("s_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, name + ".parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (mtime, mtime))

    in_window = [
        (i, "2024-01-01 10:15:00", i, f"term{i % 5}", 1.0, "{}")
        for i in range(20)
    ]
    # batch 0: sketch state for [10:00, 11:00) + the watermark pusher
    write_file("b1", in_window + [
        (99, "2024-01-01 13:30:00", 1, "later", 1.0, "{}")
    ], t0)
    # batch 1: makes the 11:30 watermark effective -> CLOSES the 10:00
    # window and emits its cells — the batch the crash hits
    write_file("b2", [
        (100, "2024-01-01 13:40:00", 1, "later", 1.0, "{}")
    ], t0 + 100)

    def run(crash_on):
        def write_batch(batch_df, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(out, f"batch_id={batch_id}")
            )
            if crash_on is not None and batch_id == crash_on:
                raise RuntimeError("injected crash after sink write")

        q = (
            cms_cells(SE.read_events_stream(spark, d, max_files_per_trigger=1))
            .writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run(crash_on=1)
        raise AssertionError("injected crash did not surface")
    except StreamingQueryException:
        pass

    # more input after the crash; the replayed batch must still see
    # only its original file set (the offset WAL pins it)
    write_file("b3", [
        (101, "2024-01-01 13:50:00", 1, "later", 1.0, "{}")
    ], t0 + 200)
    run(crash_on=None)

    got = sorted(
        (r.window_start, r.i, r.bucket, r.c)
        for r in spark.read.parquet(out).collect()
    )
    static = spark.createDataFrame(
        in_window,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = sorted(
        (r.window_start, r.i, r.bucket, r.c)
        for r in cms_cells(static).collect()
    )
    assert got == want  # exactly once: no cell duplicated by the replay


def test_funnel_ttl_purges_idle_state(spark, tmp_path):
    """The funnel tracker's event-time TTL (ADVICE r9: NoTimeout left
    one state entry per user forever). With a short TTL, a funnel idle
    past it is PURGED: the user's later purchase meets fresh state and
    completes nothing. With the default (7-day) TTL the same input
    completes the funnel — proving the purge, not the watermark, is
    what changed the outcome."""
    from series_tiempo_ar_scraping_spark.streaming import events as SE
    from series_tiempo_ar_scraping_spark.streaming.stateful import (
        funnel_stream,
    )

    def drive(src: str, name: str, **kw):
        stream = SE.read_events_stream(
            spark, src, max_files_per_trigger=1
        )
        q = (
            funnel_stream(stream, **kw)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name).collect()

    for i, (name, kw, want) in enumerate(
        [
            # r11: ttl must exceed the watermark delay (enforced), so
            # the short-TTL case shrinks the watermark alongside it
            (
                "funnel_ttl_short",
                {"ttl_minutes": 60, "watermark": "30 minutes"},
                0,
            ),
            ("funnel_ttl_default", {}, 1),
        ]
    ):
        src = str(tmp_path / f"src{i}")
        # f1: user 1 reaches stage 2 (view+click), idle afterwards
        _write_batch(
            spark,
            src,
            [
                (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
                (2, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
            ],
        )
        # f2: watermark pusher (far future, other user)
        _write_batch(
            spark,
            src,
            [(3, "2024-01-02 00:00:00", 50, "view", 1.0, "{}")],
        )
        # f3: a batch WITHOUT user-1 data whose starting watermark is
        # past user 1's last event + short TTL -> timeout fires here
        _write_batch(
            spark,
            src,
            [(4, "2024-01-03 00:00:00", 51, "view", 1.0, "{}")],
        )
        # f4: user 1 finally purchases (admitted: past the watermark)
        _write_batch(
            spark,
            src,
            [(5, "2024-01-03 12:00:00", 1, "purchase", 1.0, "{}")],
        )
        got = drive(src, name, **kw)
        assert len(got) == want, (name, got)
        if want == 1:
            assert got[0].user_id == 1
            assert str(got[0].purchase_ts) == "2024-01-03 12:00:00"


def test_funnel_ttl_below_watermark_rejected(spark):
    """ADVICE r10: a TTL at or below the watermark delay can purge a
    tombstone while the watermark still admits events (re-emitting a
    completed funnel) or produce a timeout timestamp below the current
    watermark (runtime IllegalArgumentException). funnel_stream must
    reject the configuration at plan-build time."""
    import pytest

    from series_tiempo_ar_scraping_spark.streaming.stateful import (
        _duration_seconds,
        funnel_stream,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("timestamp as ts", "value as user_id",
                    "value as event_id", "'view' as event_type")
    )
    # at the boundary (ttl == delay) and below it: both rejected
    for ttl, wm in [(60, "1 hour"), (30, "1 hour"), (59, "59 minutes")]:
        with pytest.raises(ValueError, match="must exceed the watermark"):
            funnel_stream(stream, ttl_minutes=ttl, watermark=wm)
    # strictly above: accepted (plan builds)
    funnel_stream(stream, ttl_minutes=61, watermark="1 hour")
    # the parser handles compound intervals and rejects garbage
    assert _duration_seconds("1 hour 30 minutes") == 5400.0
    assert _duration_seconds("2 days") == 172800.0
    with pytest.raises(ValueError, match="unparseable"):
        _duration_seconds("soon")
    # residue rejection (ADVICE r11): a partially parseable string must
    # raise (naming the unrecognized token), not silently drop it —
    # "1 hour 30 minuts" parsing as 3600 s would defeat the
    # fail-at-plan-build guarantee
    with pytest.raises(ValueError, match="minuts"):
        _duration_seconds("1 hour 30 minuts")
    # month/year are deliberately excluded (no fixed second length)
    with pytest.raises(ValueError, match="unparseable"):
        _duration_seconds("3 months")
    # a negative duration used to parse as its absolute value (the
    # sign was unmatched residue, silently dropped); now it raises
    with pytest.raises(ValueError, match="unparseable|-"):
        _duration_seconds("-5 hours")
