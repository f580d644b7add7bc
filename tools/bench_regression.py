#!/usr/bin/env python3
"""Per-query cold-band regression check (SCALE.md "Bench methodology").

Policy made executable: the cold lane is single-sample (a query is only
cold once per JVM) and carries a documented ±20% run-to-run band, so a
cold move alone is noise. A query is FLAGGED only when its cold time
moved beyond 2× the band-adjusted previous value AND its warm
(min-of-two, cache-hot) time moved too — warm corroboration is what
separates a plan regression from cold-lane jitter.

Cross-round comparability (VERDICT r9 #2): per-query times from
different rounds ride different JVM contexts — the set grows, so a
query's wall-clock lane position and the driver's class/GC pressure
both move even when its plan did not (the r8→r9 phantom drift:
nine untouched queries read 1.5–3.2× slower purely from 259-vs-186
shared-JVM load). Two mechanisms make the check survive that:

- every flag is annotated with ``jvm_context_changed`` (record sizes
  differ) and the per-query ``lane`` delta when both records carry
  the lane map bench.py now writes;
- ``--rerun`` re-times every flagged query in ONE fresh JVM
  (``SPARK_GRAFT_BENCH_ONLY``, tagged out of the lineage) and keeps a
  flag only if the fresh-JVM time still violates the thresholds
  against the OLD record — lane noise dies there, plan regressions
  survive. The fresh JVM is warmed with the standard lane-head and an
  untimed cache materialization first (VERDICT r10 #1: a bare JVM's
  ~15 s one-time init false-confirmed every sub-second suspect).

Sources, newest-last: per-round driver artifacts ``BENCH_r*.json``
(records whose ``parsed`` carries per-query dicts) and the append-only
``BENCH_HISTORY.jsonl`` that bench.py writes (always carries them).
By default the two most recent records at the target SF are compared;
``--old-round N --new-round M`` selects specific round artifacts for
cross-round diffs (e.g. ``--old-round 8 --new-round 9``).

Exit status: 1 when any query is flagged (usable as a gate), else 0.

Usage:
    python tools/bench_regression.py [SF] [--old-round N]
        [--new-round M] [--rerun]
    python tools/bench_regression.py --streaming [SF]
        # compares the two newest bench_set=streaming records and
        # flags any operator whose rows/s dropped >40% (VERDICT r10 #6)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COLD_BAND = 1.2  # documented ±20% cold-lane variance
COLD_FACTOR = 2.0  # "moved >2x outside the band"
WARM_FACTOR = 1.25  # warm corroboration threshold
# records whose run lost more than this share of CPU to hypervisor
# steal (bench.py records steal_pct from /proc/stat deltas since r11)
# are timing-contaminated and excluded from lineage comparison — the
# r11 diagnosis measured a 3.4x cold-lane inflation at guest loadavg
# 0.5 from exactly this
STEAL_MAX_PCT = 1.0


def load_records(repo: str = REPO, sf: float = 0.1) -> list[dict]:
    """All per-query bench records at ``sf`` with both lanes present,
    in chronological order (driver rounds, then history entries)."""
    records: list[tuple[float, dict]] = []
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m is None:  # e.g. BENCH_retry.json matching the glob
            continue
        try:
            doc = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        parsed = doc.get("parsed") if isinstance(doc, dict) else None
        if (
            parsed
            and parsed.get("sf") == sf
            and parsed.get("queries")
            and parsed.get("queries_cold")
        ):
            # real chronology (ADVICE r7/r8): prefer the written-at
            # timestamp EMBEDDED in the artifact (bench.py emits "ts"
            # since r9) — file mtime is reset by every fresh clone/CI
            # checkout, which would sort ALL round artifacts newer than
            # every history append.  mtime is only the legacy fallback
            # for pre-r9 artifacts that lack the field.
            ts = parsed.get("ts")
            if not isinstance(ts, (int, float)):
                try:
                    ts = os.path.getmtime(path)
                except OSError:
                    ts = float(m.group(1))  # degraded: round number only
            records.append((ts, parsed))
    hist = os.path.join(repo, "BENCH_HISTORY.jsonl")
    if os.path.exists(hist):
        for line in open(hist):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if (
                rec.get("sf") == sf
                and rec.get("queries")
                and rec.get("queries_cold")
                # isolation runs (bench_set=r2set) time a deliberate
                # subset under different JVM load — not lineage records
                and not rec.get("bench_set")
                # steal-contaminated runs are not lineage either
                # (pre-r11 records lack the field and pass through)
                and (rec.get("steal_pct") or 0) <= STEAL_MAX_PCT
            ):
                # history records carry their own append timestamp —
                # directly comparable with the artifacts' file mtimes
                records.append((rec.get("ts", 0), rec))
    records.sort(key=lambda t: t[0])
    return [r for _, r in records]


def compare(old: dict, new: dict) -> list[dict]:
    """Flag queries whose cold AND warm moved per the policy above.
    Each flag is annotated with the JVM-context delta when the records
    carry it (different set sizes / lane positions mean the times rode
    different shared-JVM loads — cross-round comparisons must treat
    such flags as SUSPECT until a fresh-JVM rerun confirms them)."""
    flags = []
    n_old = len(old.get("queries_cold") or {})
    n_new = len(new.get("queries_cold") or {})
    context_changed = n_old != n_new
    lane_old = old.get("lane") or {}
    lane_new = new.get("lane") or {}
    for name, cold_new in new["queries_cold"].items():
        cold_old = old["queries_cold"].get(name)
        warm_new = new["queries"].get(name)
        warm_old = old["queries"].get(name)
        if not all(
            isinstance(v, (int, float)) and v > 0
            for v in (cold_old, cold_new, warm_old, warm_new)
        ):
            continue  # new query or missing lane: nothing to compare
        cold_ratio = cold_new / cold_old
        warm_ratio = warm_new / warm_old
        if cold_ratio > COLD_FACTOR * COLD_BAND and warm_ratio > WARM_FACTOR:
            flag = {
                "query": name,
                "cold_old": cold_old,
                "cold_new": cold_new,
                "cold_ratio": round(cold_ratio, 2),
                "warm_old": warm_old,
                "warm_new": warm_new,
                "warm_ratio": round(warm_ratio, 2),
                "jvm_context_changed": context_changed,
            }
            if name in lane_old and name in lane_new:
                flag["lane_delta"] = lane_new[name] - lane_old[name]
            flags.append(flag)
    flags.sort(key=lambda f: -f["cold_ratio"])
    return flags


# fallback reference pool when the old record carries no lane map
# (pre-r9): the frozen-set head, always present in every record
_R2_HEAD_REFERENCES = [
    "q01_pricing_summary",
    "q03_revenue_topk",
    "q05_region_revenue",
    "semi_orders_with_big_lineitem",
    "align_daily_activity",
]


def _pick_references(
    flags: list[dict], old: dict, new: dict, k: int = 3
) -> list[str]:
    """Reference queries for fresh-JVM calibration: un-flagged entries
    whose OLD in-lane times rode the same JVM context as the suspects
    — their fresh/old ratio measures the bare-vs-in-lane floor, not a
    plan change. Nearest lane-neighbors of the flagged queries when the
    old record carries a lane map (they shared the suspect's deep-lane
    context); the frozen-set head otherwise. A reference must have both
    lanes in BOTH records (membership in the new record doubles as
    proof the name still exists in the current catalog)."""
    flagged = {f["query"] for f in flags}

    def usable(name: str) -> bool:
        return all(
            isinstance(rec.get(lane, {}).get(name), (int, float))
            and rec[lane][name] > 0
            for rec in (old, new)
            for lane in ("queries", "queries_cold")
        )

    lane_old = old.get("lane") or {}
    flag_lanes = [lane_old[q] for q in flagged if q in lane_old]
    if lane_old and flag_lanes:
        cands = sorted(
            (min(abs(ln - fl) for fl in flag_lanes), name)
            for name, ln in lane_old.items()
            if name not in flagged and usable(name)
        )
        return [name for _, name in cands[:k]]
    return [
        r for r in _R2_HEAD_REFERENCES if r not in flagged and usable(r)
    ][:k]


def rerun_confirm(
    flags: list[dict], old: dict, sf: float, repo: str = REPO,
    new: dict | None = None,
) -> list[dict]:
    """Re-time every flagged query in ONE fresh JVM and keep only the
    flags the fresh run still confirms against the OLD record. The
    rerun record is tagged bench_set=only, so it never enters the
    lineage.

    Fresh-vs-in-lane comparability (VERDICT r10 #1 — the
    langid_confusion_matrix false-confirm; a bare JVM charges ~15 s of
    one-time init to whatever runs first, so every sub-second suspect
    'confirmed' regardless of its plan) is handled by two mechanisms:

    - the fresh JVM is WARMED before timing (bench.py only-mode runs
      the standard lane-head untimed before the cold lane,
      materializes the table cache untimed before the warm lane, and
      reports warm as min-of-2);
    - the run also times REFERENCE queries — the suspects' own lane
      neighbors from the old record, untouched entries whose old times
      rode the same deep-lane JVM context — and divides each suspect's
      fresh/old ratio by the references' median fresh/old ratio. What
      a 5-query warmup cannot reproduce (a 200-query-warm JIT and page
      cache), the references measure directly; the residual ratio is
      the plan's, and the ordinary thresholds adjudicate it. The
      calibration factor is clamped to >= 1 so it can only forgive
      fresh-JVM overhead, never excuse a genuine slowdown."""
    if not flags:
        return flags
    names = [f["query"] for f in flags]
    refs = _pick_references(flags, old, new or {"queries": {}, "queries_cold": {}})
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(refs + names)
    # respect a caller-provided fixture dir (ADVICE r10): only default
    # to the standard testdata layout when the caller set nothing. A
    # caller dir whose sf suffix contradicts the records' sf would
    # adjudicate flags against the wrong dataset — surface that.
    env.setdefault("SPARK_GRAFT_SF_DIR", f"/root/testdata/sf{sf:g}")
    tail = env["SPARK_GRAFT_SF_DIR"].rstrip("/").rsplit("sf", 1)[-1]
    if tail != f"{sf:g}":
        print(
            f"bench_regression: WARNING rerun dir {env['SPARK_GRAFT_SF_DIR']}"
            f" does not look like sf{sf:g}; fresh times may not be"
            " comparable to the records under comparison",
            file=sys.stderr,
        )
    env.pop("SPARK_GRAFT_BENCH_SKIP_COLD", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
    )
    detail = None
    for line in proc.stdout.splitlines():
        if line.startswith("BENCH_DETAIL ") and '"queries"' in line:
            try:
                detail = json.loads(line[len("BENCH_DETAIL "):])
            except json.JSONDecodeError:
                continue
    if not detail:  # rerun failed: keep the flags, note why
        for f in flags:
            f["rerun"] = "failed"
        return flags
    if (detail.get("steal_pct") or 0) > STEAL_MAX_PCT:
        # the rerun itself rode a contended host: its times can neither
        # confirm nor dismiss — keep the flags (fail-safe) annotated
        for f in flags:
            f["rerun"] = "contaminated"
            f["rerun_steal_pct"] = detail["steal_pct"]
        return flags
    # calibration: median fresh/old ratio over the references, per
    # lane. >1 means the fresh JVM is slower than the old in-lane
    # context for UNTOUCHED queries — pure environment, divided out of
    # every suspect. Clamped to >=1: a fresh JVM that happens to be
    # FASTER must not inflate suspects into confirmation.
    def _median(vals: list[float]) -> float:
        vals = sorted(vals)
        n = len(vals)
        return (vals[n // 2] + vals[(n - 1) // 2]) / 2 if vals else 1.0

    cal_cold = cal_warm = 1.0
    refs_used = []
    for r in refs:
        cf = (detail.get("queries_cold") or {}).get(r)
        wf = (detail.get("queries") or {}).get(r)
        co, wo = old["queries_cold"].get(r), old["queries"].get(r)
        if all(isinstance(v, (int, float)) and v > 0 for v in (cf, wf, co, wo)):
            refs_used.append((r, cf / co, wf / wo))
    if refs_used:
        cal_cold = max(1.0, _median([rc for _, rc, _ in refs_used]))
        cal_warm = max(1.0, _median([rw for _, _, rw in refs_used]))
    confirmed = []
    for f in flags:
        name = f["query"]
        cold_fresh = (detail.get("queries_cold") or {}).get(name)
        warm_fresh = (detail.get("queries") or {}).get(name)
        cold_old = old["queries_cold"].get(name)
        warm_old = old["queries"].get(name)
        if not all(
            isinstance(v, (int, float)) and v > 0
            for v in (cold_fresh, warm_fresh, cold_old, warm_old)
        ):
            f["rerun"] = "missing"
            confirmed.append(f)
            continue
        f["cold_fresh"] = cold_fresh
        f["warm_fresh"] = warm_fresh
        f["rerun_refs"] = [r for r, _, _ in refs_used]
        f["rerun_cal_cold"] = round(cal_cold, 2)
        f["rerun_cal_warm"] = round(cal_warm, 2)
        adj_cold = cold_fresh / cold_old / cal_cold
        adj_warm = warm_fresh / warm_old / cal_warm
        f["cold_fresh_ratio_adj"] = round(adj_cold, 2)
        f["warm_fresh_ratio_adj"] = round(adj_warm, 2)
        if adj_cold > COLD_FACTOR * COLD_BAND and adj_warm > WARM_FACTOR:
            f["rerun"] = "confirmed"
            confirmed.append(f)
        else:
            f["rerun"] = "lane_noise"
    return confirmed


# streaming lane: rows/s per stateful operator, measured by
# tools/bench_streaming.py. The two newest records agree within ~13%
# (measured r10), so a >40% per-operator drop is outside environment
# noise and flags a state-machine/shuffle regression (VERDICT r10 #6).
STREAM_DROP = 0.40


def load_streaming_records(repo: str = REPO, sf: float = 0.1) -> list[dict]:
    """bench_set=streaming history records at ``sf``, oldest first."""
    hist = os.path.join(repo, "BENCH_HISTORY.jsonl")
    records = []
    if os.path.exists(hist):
        for line in open(hist):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if (
                rec.get("bench_set") == "streaming"
                and rec.get("sf") == sf
                and rec.get("streaming")
                and (rec.get("steal_pct") or 0) <= STEAL_MAX_PCT
            ):
                records.append(rec)
    records.sort(key=lambda r: r.get("ts", 0))
    return records


def compare_streaming(old: dict, new: dict) -> list[dict]:
    """Flag operators whose rows/s dropped more than STREAM_DROP
    between two streaming records."""
    flags = []
    for op, d in (new.get("streaming") or {}).items():
        o = (old.get("streaming") or {}).get(op)
        if not o:
            continue
        r_new, r_old = d.get("rows_per_sec"), o.get("rows_per_sec")
        if not all(
            isinstance(v, (int, float)) and v > 0 for v in (r_new, r_old)
        ):
            continue
        if r_new < (1.0 - STREAM_DROP) * r_old:
            flags.append(
                {
                    "op": op,
                    "rows_per_sec_old": r_old,
                    "rows_per_sec_new": r_new,
                    "drop": round(1.0 - r_new / r_old, 3),
                }
            )
    flags.sort(key=lambda f: -f["drop"])
    return flags


def streaming_main(sf: float, repo: str = REPO) -> int:
    records = load_streaming_records(repo, sf)
    if len(records) < 2:
        print(
            json.dumps(
                {
                    "status": "insufficient_data",
                    "lane": "streaming",
                    "records": len(records),
                    "sf": sf,
                }
            )
        )
        return 0
    flags = compare_streaming(records[-2], records[-1])
    print(
        json.dumps(
            {
                "status": "flagged" if flags else "ok",
                "lane": "streaming",
                "sf": sf,
                "n_ops": len(records[-1].get("streaming") or {}),
                "flags": flags,
            }
        )
    )
    return 1 if flags else 0


def _round_record(n: int, sf: float, repo: str = REPO) -> dict | None:
    """Resolve round N's bench run to its PER-QUERY history record.

    The driver artifact ``BENCH_rNN.json`` carries only the compact
    summary (the driver captures the final stdout line); the per-query
    dicts live in the history line that same bench run appended. Match
    by the embedded ``ts`` (exact for r9+ artifacts), falling back to
    (n_queries, value_ext) totals for pre-r9 artifacts without one."""
    path = os.path.join(repo, f"BENCH_r{n:02d}.json")
    try:
        doc = json.load(open(path))
    except (OSError, json.JSONDecodeError):
        return None
    parsed = doc.get("parsed") if isinstance(doc, dict) else None
    if not parsed or parsed.get("sf") != sf:
        return None
    hist = os.path.join(repo, "BENCH_HISTORY.jsonl")
    if not os.path.exists(hist):
        return None
    art_ts = parsed.get("ts")
    best = None
    for line in open(hist):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if not (
            rec.get("sf") == sf
            and rec.get("queries")
            and rec.get("queries_cold")
            and not rec.get("bench_set")
        ):
            continue
        if isinstance(art_ts, (int, float)):
            if abs(rec.get("ts", 0) - art_ts) < 120:
                return rec
        elif rec.get("n_queries") == parsed.get("n_queries") and abs(
            (rec.get("value_ext") or 0) - (parsed.get("value_ext") or 0)
        ) < 0.01:
            best = rec  # keep scanning: newest matching line wins
    return best


def main() -> int:
    args = sys.argv[1:]
    rerun = "--rerun" in args
    args = [a for a in args if a != "--rerun"]
    if "--streaming" in args:
        args.remove("--streaming")
        return streaming_main(float(args[0]) if args else 0.1)
    old_round = new_round = None
    if "--old-round" in args:
        i = args.index("--old-round")
        old_round = int(args[i + 1])
        del args[i : i + 2]
    if "--new-round" in args:
        i = args.index("--new-round")
        new_round = int(args[i + 1])
        del args[i : i + 2]
    sf = float(args[0]) if args else 0.1

    if old_round is not None or new_round is not None:
        old = _round_record(old_round, sf) if old_round else None
        new = _round_record(new_round, sf) if new_round else None
        if not old or not new:
            print(
                json.dumps(
                    {
                        "status": "missing_round_record",
                        "old_round": old_round,
                        "new_round": new_round,
                        "sf": sf,
                    }
                )
            )
            return 0
    else:
        records = load_records(sf=sf)
        if len(records) < 2:
            print(
                json.dumps(
                    {
                        "status": "insufficient_data",
                        "records": len(records),
                        "sf": sf,
                    }
                )
            )
            return 0
        old, new = records[-2], records[-1]
    flags = compare(old, new)
    rerun_ran = False
    if rerun and flags:
        flags = rerun_confirm(flags, old, sf, new=new)
        rerun_ran = True
    print(
        json.dumps(
            {
                "status": "flagged" if flags else "ok",
                "sf": sf,
                "n_compared": len(
                    set(new["queries_cold"]) & set(old["queries_cold"])
                ),
                "rerun": rerun_ran,
                "flags": flags,
            }
        )
    )
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
