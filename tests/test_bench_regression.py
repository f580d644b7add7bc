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
