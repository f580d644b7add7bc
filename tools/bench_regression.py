#!/usr/bin/env python3
"""Per-query cold-band regression check (SCALE.md "Bench methodology").

Policy made executable: the cold lane is single-sample (a query is only
cold once per JVM) and carries a documented ±20% run-to-run band, so a
cold move alone is noise. A query is FLAGGED only when its cold time
moved beyond 2× the band-adjusted previous value AND its warm
(min-of-two, cache-hot) time moved too — warm corroboration is what
separates a plan regression from cold-lane jitter.

Sources, newest-last: per-round driver artifacts ``BENCH_r*.json``
(records whose ``parsed`` carries per-query dicts) and the append-only
``BENCH_HISTORY.jsonl`` that bench.py writes (always carries them).
The two most recent records at the target SF are compared.

Exit status: 1 when any query is flagged (usable as a gate), else 0.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COLD_BAND = 1.2  # documented ±20% cold-lane variance
COLD_FACTOR = 2.0  # "moved >2x outside the band"
WARM_FACTOR = 1.25  # warm corroboration threshold


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
            ):
                # history records carry their own append timestamp —
                # directly comparable with the artifacts' file mtimes
                records.append((rec.get("ts", 0), rec))
    records.sort(key=lambda t: t[0])
    return [r for _, r in records]


def compare(old: dict, new: dict) -> list[dict]:
    """Flag queries whose cold AND warm moved per the policy above."""
    flags = []
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
            flags.append(
                {
                    "query": name,
                    "cold_old": cold_old,
                    "cold_new": cold_new,
                    "cold_ratio": round(cold_ratio, 2),
                    "warm_old": warm_old,
                    "warm_new": warm_new,
                    "warm_ratio": round(warm_ratio, 2),
                }
            )
    flags.sort(key=lambda f: -f["cold_ratio"])
    return flags


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
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
    print(
        json.dumps(
            {
                "status": "flagged" if flags else "ok",
                "sf": sf,
                "n_compared": len(
                    set(new["queries_cold"]) & set(old["queries_cold"])
                ),
                "flags": flags,
            }
        )
    )
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
