"""The cold-band regression policy (SCALE.md) as an executable check."""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import bench_regression as BR  # noqa: E402


def _rec(queries, cold):
    return {"sf": 0.1, "queries": queries, "queries_cold": cold}


def test_cold_jitter_alone_is_not_flagged():
    # cold 2.3x but warm steady: single-sample cold jitter, not a plan bug
    old = _rec({"q": 1.0}, {"q": 1.0})
    new = _rec({"q": 1.02}, {"q": 2.3})
    assert BR.compare(old, new) == []
    # the corroboration gate itself: cold 3.0x — PAST the 2.4x cold
    # threshold — must still not flag while warm is steady (this is the
    # branch that distinguishes the AND-policy from flag-any-cold-move)
    new = _rec({"q": 1.0}, {"q": 3.0})
    assert BR.compare(old, new) == []


def test_warm_move_alone_is_not_flagged():
    old = _rec({"q": 1.0}, {"q": 1.0})
    new = _rec({"q": 1.6}, {"q": 1.5})
    assert BR.compare(old, new) == []


def test_corroborated_regression_is_flagged():
    old = _rec({"q": 1.0, "r": 2.0}, {"q": 1.0, "r": 3.0})
    new = _rec({"q": 1.5, "r": 2.0}, {"q": 2.9, "r": 3.1})
    flags = BR.compare(old, new)
    assert [f["query"] for f in flags] == ["q"]
    assert flags[0]["cold_ratio"] == 2.9
    assert flags[0]["warm_ratio"] == 1.5


def test_new_queries_and_missing_lanes_are_skipped():
    old = _rec({"q": 1.0}, {"q": 1.0})
    new = _rec({"q": 1.0, "brand_new": 9.9}, {"q": 1.0, "brand_new": 9.9})
    assert BR.compare(old, new) == []


def test_load_records_orders_by_real_chronology(tmp_path):
    """Round artifacts and history appends interleave by REAL time
    (file mtime vs the record's own ts — ADVICE r7): a history entry
    appended after the round artifact sorts newer..."""
    import time

    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"parsed": _rec({"q": 1.0}, {"q": 1.0})})
    )
    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps({"parsed": None})  # the r6 decapitation: skipped
    )
    hist = _rec({"q": 1.4}, {"q": 2.9})
    hist["ts"] = time.time() + 3600  # appended after the round artifact
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        "not json\n" + json.dumps(hist) + "\n"
    )
    records = BR.load_records(repo=str(tmp_path))
    assert len(records) == 2
    assert records[0]["queries"] == {"q": 1.0}
    assert records[1]["queries"] == {"q": 1.4}
    flags = BR.compare(records[0], records[1])
    assert len(flags) == 1


def test_round_artifact_newer_than_history_sorts_last(tmp_path):
    """...and a round artifact written AFTER the last history append is
    the newest record — the mis-ordering the old 10_000+ts key caused."""
    import os
    import time

    hist = _rec({"q": 1.4}, {"q": 2.9})
    hist["ts"] = time.time() - 3600  # appended an hour ago
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(json.dumps(hist) + "\n")
    art = tmp_path / "BENCH_r07.json"
    art.write_text(json.dumps({"parsed": _rec({"q": 1.0}, {"q": 1.0})}))
    os.utime(art)  # driver wrote it just now
    records = BR.load_records(repo=str(tmp_path))
    assert len(records) == 2
    assert records[0]["queries"] == {"q": 1.4}  # history is OLDER
    assert records[1]["queries"] == {"q": 1.0}  # round artifact newest


def test_embedded_ts_beats_checkout_mtime(tmp_path):
    """A fresh clone re-dates every BENCH_r*.json to checkout time; the
    artifact's EMBEDDED written-at ts (bench.py emits it since r9) must
    win over mtime so an old round artifact never sorts newer than
    history appends made after it (ADVICE r8)."""
    import os
    import time

    old_round = _rec({"q": 1.0}, {"q": 1.0})
    old_round["ts"] = time.time() - 7200  # really written two hours ago
    art = tmp_path / "BENCH_r08.json"
    art.write_text(json.dumps({"parsed": old_round}))
    os.utime(art)  # "checkout": mtime says NOW
    hist = _rec({"q": 1.4}, {"q": 2.9})
    hist["ts"] = time.time() - 3600  # appended an hour ago
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(json.dumps(hist) + "\n")
    records = BR.load_records(repo=str(tmp_path))
    assert len(records) == 2
    assert records[0]["queries"] == {"q": 1.0}  # artifact is OLDER
    assert records[1]["queries"] == {"q": 1.4}  # history append newest


def test_wrong_sf_records_excluded(tmp_path):
    rec = _rec({"q": 1.0}, {"q": 1.0})
    rec["sf"] = 0.01
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(json.dumps(rec) + "\n")
    assert BR.load_records(repo=str(tmp_path)) == []


def test_flags_annotated_with_jvm_context_and_lane():
    """Cross-round flags carry the context the verdict (r9 #2) asked
    for: did the record size change, and how far did the query's lane
    move? Same-context flags say so too (False / 0)."""
    old = _rec({"q": 1.0, "r": 1.0}, {"q": 1.0, "r": 1.0})
    old["lane"] = {"q": 5, "r": 6}
    new = _rec({"q": 1.5, "r": 1.0, "s": 1.0},
               {"q": 2.9, "r": 1.0, "s": 1.0})
    new["lane"] = {"q": 5, "r": 6, "s": 7}
    flags = BR.compare(old, new)
    assert len(flags) == 1
    assert flags[0]["jvm_context_changed"] is True
    assert flags[0]["lane_delta"] == 0
    # same-size records: context unchanged
    new2 = _rec({"q": 1.5, "r": 1.0}, {"q": 2.9, "r": 1.0})
    flags2 = BR.compare(old, new2)
    assert flags2[0]["jvm_context_changed"] is False


def test_rerun_confirm_kills_lane_noise(monkeypatch, tmp_path):
    """--rerun keeps a flag only when a FRESH JVM still violates the
    thresholds vs the old record; a fresh time inside the band means
    the original flag was shared-JVM lane noise."""
    old = _rec({"q": 1.0, "p": 1.0}, {"q": 1.0, "p": 1.0})
    new = _rec({"q": 1.5, "p": 1.5}, {"q": 2.9, "p": 2.9})
    flags = BR.compare(old, new)
    assert {f["query"] for f in flags} == {"q", "p"}

    fresh = {
        "sf": 0.1,
        # q: fresh-JVM time back inside the band -> lane noise.
        # p: still 2.9x cold / 1.5x warm -> a real regression.
        "queries": {"q": 1.05, "p": 1.5},
        "queries_cold": {"q": 1.1, "p": 2.9},
    }

    class FakeProc:
        stdout = "BENCH_DETAIL " + json.dumps(fresh) + "\n{}\n"
        stderr = ""

    monkeypatch.setattr(
        BR.subprocess, "run", lambda *a, **k: FakeProc()
    )
    confirmed = BR.rerun_confirm(flags, old, 0.1)
    assert [f["query"] for f in confirmed] == ["p"]
    assert confirmed[0]["rerun"] == "confirmed"
    noise = [f for f in flags if f["query"] == "q"][0]
    assert noise["rerun"] == "lane_noise"


def test_rerun_calibration_kills_deep_lane_false_confirm(monkeypatch):
    """The r10 false-confirm, reproduced: a sub-second deep-lane query
    (old in-lane cold 0.5s) re-timed in a fresh JVM reads ~5x slower
    from pure environment floor — pre-r11 that 'confirmed' the flag.
    With lane-neighbor references timed in the SAME fresh JVM showing
    the SAME floor, the calibrated ratio falls back in band ->
    lane_noise. A suspect whose slowdown EXCEEDS the reference floor
    still confirms."""
    lane = {"s": 200, "t": 201, "n1": 199, "n2": 202, "n3": 198, "q": 0}
    old = _rec(
        {"s": 0.3, "t": 0.3, "n1": 0.3, "n2": 0.3, "n3": 0.3, "q": 1.0},
        {"s": 0.5, "t": 0.5, "n1": 0.5, "n2": 0.5, "n3": 0.5, "q": 8.0},
    )
    old["lane"] = lane
    new = _rec(
        {"s": 0.6, "t": 0.6, "n1": 0.3, "n2": 0.3, "n3": 0.3, "q": 1.0},
        {"s": 1.6, "t": 1.6, "n1": 0.5, "n2": 0.5, "n3": 0.5, "q": 8.0},
    )
    new["lane"] = lane
    flags = BR.compare(old, new)
    assert {f["query"] for f in flags} == {"s", "t"}

    # fresh JVM: the untouched neighbors read the ~5x cold / 1.5x warm
    # environment floor; s reads the same floor (false flag), t reads
    # 4x MORE than the floor (a real plan regression)
    fresh = {
        "sf": 0.1,
        "queries": {"s": 0.45, "t": 1.9, "n1": 0.45, "n2": 0.46, "n3": 0.44},
        "queries_cold": {"s": 2.6, "t": 10.0, "n1": 2.5, "n2": 2.7, "n3": 2.4},
    }
    seen_only = {}

    class FakeProc:
        stdout = "BENCH_DETAIL " + json.dumps(fresh) + "\n{}\n"
        stderr = ""

    def fake_run(*a, **k):
        seen_only["v"] = (k.get("env") or {}).get("SPARK_GRAFT_BENCH_ONLY")
        return FakeProc()

    monkeypatch.setattr(BR.subprocess, "run", fake_run)
    confirmed = BR.rerun_confirm(flags, old, 0.1, new=new)
    # references chosen = the nearest lane neighbors, timed in the run
    assert set(seen_only["v"].split(",")) == {"n1", "n2", "n3", "s", "t"}
    assert [f["query"] for f in confirmed] == ["t"]
    s_flag = [f for f in flags if f["query"] == "s"][0]
    assert s_flag["rerun"] == "lane_noise"
    assert s_flag["rerun_cal_cold"] == 5.0  # the measured floor
    assert s_flag["cold_fresh_ratio_adj"] < 2.4
    t_flag = confirmed[0]
    assert t_flag["rerun"] == "confirmed"
    assert t_flag["cold_fresh_ratio_adj"] > 2.4


def test_rerun_calibration_never_amplifies(monkeypatch):
    """A fresh JVM that is FASTER than the old in-lane context (refs
    ratio < 1) must not inflate suspects into confirmation: the
    calibration factor clamps at 1.0."""
    lane = {"s": 10, "n1": 9, "n2": 11, "n3": 12}
    old = _rec(
        {"s": 1.0, "n1": 1.0, "n2": 1.0, "n3": 1.0},
        {"s": 1.0, "n1": 1.0, "n2": 1.0, "n3": 1.0},
    )
    old["lane"] = lane
    new = _rec(
        {"s": 1.5, "n1": 1.0, "n2": 1.0, "n3": 1.0},
        {"s": 2.9, "n1": 1.0, "n2": 1.0, "n3": 1.0},
    )
    new["lane"] = lane
    flags = BR.compare(old, new)
    fresh = {
        "sf": 0.1,
        # refs come back HALF the old time; suspect just in band
        "queries": {"s": 1.2, "n1": 0.5, "n2": 0.5, "n3": 0.5},
        "queries_cold": {"s": 2.0, "n1": 0.5, "n2": 0.5, "n3": 0.5},
    }

    class FakeProc:
        stdout = "BENCH_DETAIL " + json.dumps(fresh) + "\n{}\n"
        stderr = ""

    monkeypatch.setattr(BR.subprocess, "run", lambda *a, **k: FakeProc())
    confirmed = BR.rerun_confirm(flags, old, 0.1, new=new)
    # uncalibrated: cold 2.0x (< 2.4) -> lane_noise; with a <1 factor
    # it would read 4.0x and falsely confirm
    assert confirmed == []
    assert flags[0]["rerun_cal_cold"] == 1.0


def test_rerun_respects_caller_sf_dir(monkeypatch):
    """ADVICE r10: rerun_confirm must not clobber a caller-provided
    SPARK_GRAFT_SF_DIR — on a non-standard layout the hardcoded
    /root/testdata path would bench a different (or missing) dataset
    and every flag would degrade to rerun=failed."""
    old = _rec({"q": 1.0}, {"q": 1.0})
    new = _rec({"q": 1.5}, {"q": 2.9})
    seen_env = {}

    class FakeProc:
        stdout = (
            "BENCH_DETAIL "
            + json.dumps(
                {"sf": 0.1, "queries": {"q": 1.0}, "queries_cold": {"q": 1.0}}
            )
            + "\n{}\n"
        )
        stderr = ""

    def fake_run(*a, **k):
        seen_env.update(k.get("env") or {})
        return FakeProc()

    monkeypatch.setattr(BR.subprocess, "run", fake_run)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/elsewhere/sfX")
    BR.rerun_confirm(BR.compare(old, new), old, 0.1)
    assert seen_env["SPARK_GRAFT_SF_DIR"] == "/elsewhere/sfX"
    # without a caller dir: the standard layout is the default
    seen_env.clear()
    monkeypatch.delenv("SPARK_GRAFT_SF_DIR")
    BR.rerun_confirm(BR.compare(old, new), old, 0.1)
    assert seen_env["SPARK_GRAFT_SF_DIR"] == "/root/testdata/sf0.1"


def test_only_mode_warms_the_fresh_jvm():
    """VERDICT r10 #1 pinned at the mechanism level: in only-mode
    bench.py must (a) select a non-empty lane-head warmup disjoint
    from the suspects, and (b) take min-of-2 in the warm lane — a bare
    JVM otherwise charges its one-time init to the suspect and every
    sub-second query 'confirms' as a regression. Module-level config is
    checked via a fresh import under the env var (no Spark boot)."""
    import importlib

    saved = dict(os.environ)
    sys.modules.pop("bench", None)
    os.environ["SPARK_GRAFT_BENCH_ONLY"] = (
        "langid_confusion_matrix,q01_pricing_summary"
    )
    # build_output appends a history line: keep it OUT of the real
    # lineage file
    os.environ["SPARK_GRAFT_BENCH_HISTORY"] = os.devnull
    try:
        sys.path.insert(0, os.path.dirname(BR.REPO + "/"))
        import bench  # noqa: F401

        bench = importlib.reload(bench)
        assert bench.BENCH_QUERIES == [
            "q01_pricing_summary", "langid_confusion_matrix"
        ]
        assert len(bench.BENCH_WARMUP) == 5
        # warmup is the standard lane-head MINUS anything under test
        assert "q01_pricing_summary" not in bench.BENCH_WARMUP
        assert bench.BENCH_WARMUP == [
            n for n in bench.BENCH_QUERIES_R2
            if n != "q01_pricing_summary"
        ][:5]
        # the warmup list travels in the record (self-documenting)
        out = bench.build_output({"q01_pricing_summary": 1.0}, {}, "0.1")
        assert out["n_queries"] == 1
    finally:
        os.environ.clear()
        os.environ.update(saved)
        sys.modules.pop("bench", None)


def test_full_run_has_no_warmup():
    """The full-bench path must be untouched by the only-mode warmup:
    BENCH_WARMUP stays empty, so no untimed executions shift the lane
    map."""
    import importlib

    saved = dict(os.environ)
    os.environ.pop("SPARK_GRAFT_BENCH_ONLY", None)
    os.environ.pop("SPARK_GRAFT_BENCH_SET", None)
    sys.modules.pop("bench", None)
    try:
        import bench

        bench = importlib.reload(bench)
        assert bench.BENCH_WARMUP == []
        assert len(bench.BENCH_QUERIES) > 200
    finally:
        os.environ.clear()
        os.environ.update(saved)
        sys.modules.pop("bench", None)


def test_steal_contaminated_records_excluded_from_lineage(tmp_path):
    """r11: a record whose run lost >1% of CPU to hypervisor steal
    (steal_pct from /proc/stat deltas) is timing-contaminated — the
    measured episode inflated a cold lane 3.4x at guest loadavg 0.5 —
    and must not be selected for lineage comparison. Pre-r11 records
    without the field pass through."""
    recs = [
        {"ts": 1.0, "sf": 0.1, "queries": {"q": 1.0},
         "queries_cold": {"q": 1.0}},                      # pre-r11
        {"ts": 2.0, "sf": 0.1, "queries": {"q": 3.0},
         "queries_cold": {"q": 9.0}, "steal_pct": 7.5},    # stolen
        {"ts": 3.0, "sf": 0.1, "queries": {"q": 1.02},
         "queries_cold": {"q": 1.1}, "steal_pct": 0.2},    # clean
    ]
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in recs)
    )
    got = BR.load_records(repo=str(tmp_path), sf=0.1)
    assert [r["ts"] for r in got] == [1.0, 3.0]
    # newest-two compare therefore sees clean-vs-clean: no flags
    assert BR.compare(got[-2], got[-1]) == []


def test_contaminated_rerun_keeps_flags_annotated(monkeypatch):
    """A rerun whose own record shows steal_pct > 1 rode a contended
    host: it can neither confirm nor dismiss, so flags survive with
    rerun=contaminated (fail-safe) instead of being adjudicated on
    garbage timings."""
    old = _rec({"q": 1.0}, {"q": 1.0})
    new = _rec({"q": 1.5}, {"q": 2.9})
    flags = BR.compare(old, new)
    fresh = {
        "sf": 0.1,
        "queries": {"q": 1.0},
        "queries_cold": {"q": 1.0},
        "steal_pct": 6.4,
    }

    class FakeProc:
        stdout = "BENCH_DETAIL " + json.dumps(fresh) + "\n{}\n"
        stderr = ""

    monkeypatch.setattr(BR.subprocess, "run", lambda *a, **k: FakeProc())
    confirmed = BR.rerun_confirm(flags, old, 0.1, new=new)
    assert [f["rerun"] for f in confirmed] == ["contaminated"]
    assert confirmed[0]["rerun_steal_pct"] == 6.4


def test_streaming_regression_flags_large_drops(tmp_path):
    """VERDICT r10 #6: a >40% rows/s drop per streaming operator
    between the two newest streaming records is flagged; smaller
    moves (the two r10 records agree within ~13%) are environment
    noise and pass."""

    def srec(ts, ops):
        return {
            "ts": ts,
            "sf": 0.1,
            "bench_set": "streaming",
            "streaming": {
                op: {"rows_per_sec": rps, "rows_in": 100000}
                for op, rps in ops.items()
            },
        }

    old = srec(1.0, {"tumbling": 20000, "funnel": 30000, "lww": 50000})
    new = srec(
        2.0,
        {
            "tumbling": 12200,   # -39%: inside the band
            "funnel": 17000,     # -43%: flagged
            "lww": 51000,        # faster: fine
            "new_op": 1,         # no old baseline: skipped
        },
    )
    flags = BR.compare_streaming(old, new)
    assert [f["op"] for f in flags] == ["funnel"]
    assert flags[0]["drop"] == 0.433

    # the loader picks streaming records only, ordered by ts
    hist = tmp_path / "BENCH_HISTORY.jsonl"
    batch = {"ts": 1.5, "sf": 0.1, "queries": {"q": 1.0},
             "queries_cold": {"q": 1.0}}
    hist.write_text(
        json.dumps(new) + "\n" + json.dumps(batch) + "\n"
        + json.dumps(old) + "\n"
    )
    recs = BR.load_streaming_records(repo=str(tmp_path), sf=0.1)
    assert [r["ts"] for r in recs] == [1.0, 2.0]


def test_round_record_resolves_via_history(tmp_path):
    """A round artifact (summary-only) resolves to its per-query
    history line: by embedded ts when present, by totals otherwise."""
    rec_a = _rec({"q": 1.0}, {"q": 1.0})
    rec_a.update({"ts": 1000.0, "n_queries": 1, "value_ext": 1.0})
    rec_b = _rec({"q": 2.0}, {"q": 2.0})
    rec_b.update({"ts": 2000.0, "n_queries": 1, "value_ext": 2.0})
    (tmp_path / "BENCH_HISTORY.jsonl").write_text(
        json.dumps(rec_a) + "\n" + json.dumps(rec_b) + "\n"
    )
    # r9-style artifact: embedded ts
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "ts": 2000.0}})
    )
    got = BR._round_record(7, 0.1, repo=str(tmp_path))
    assert got and got["queries"] == {"q": 2.0}
    # pre-r9 artifact: no ts, match on totals
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps(
            {"parsed": {"sf": 0.1, "n_queries": 1, "value_ext": 1.0}}
        )
    )
    got = BR._round_record(5, 0.1, repo=str(tmp_path))
    assert got and got["queries"] == {"q": 1.0}
