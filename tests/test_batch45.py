"""Batch-45 semantics: invariants ABOVE the hash oracles (the
same-bug-both-engines guard, per tests/test_semantics_batch14.py)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.queries import QUERIES, load_table

SF = "/root/testdata/sf0.001"


def test_maxmin_allocation_is_maxmin_fair(spark):
    """The textbook properties: total allocation fits the budget and
    is within (n − #satisfied) of it; every unsatisfied source sits
    exactly at the water level; no satisfied source exceeds any
    unsatisfied one's allocation; the iterative progressive-filling
    reference reproduces the same allocations."""
    rows = QUERIES["maxmin_fair_allocation"](spark, SF).collect()
    assert rows
    demands = {r.source: r.demand for r in rows}
    cap = sum(demands.values()) // 2
    total = sum(r.allocation for r in rows)
    assert total <= cap
    n_unsat = sum(1 for r in rows if not r.fully_satisfied)
    assert cap - total < max(n_unsat, 1)
    levels = {r.water_level for r in rows}
    assert len(levels) == 1
    (water,) = levels
    for r in rows:
        if r.fully_satisfied:
            assert r.allocation == r.demand <= water
        else:
            assert r.allocation == water < r.demand
    # iterative progressive filling (the textbook loop) agrees
    remaining = cap
    alloc = {s: 0 for s in demands}
    active = set(demands)
    while active and remaining >= len(active):
        share = remaining // len(active)
        done = set()
        for s in sorted(active):
            give = min(share, demands[s] - alloc[s])
            alloc[s] += give
            remaining -= give
            if alloc[s] >= demands[s]:
                done.add(s)
        if not done and share == 0:
            break
        active -= done
        if not done:
            break
    for r in rows:
        # the closed form and the loop agree up to integer slack of
        # one rounding unit per source
        assert abs(r.allocation - alloc[r.source]) <= 1


def test_burn_rate_policy(spark):
    """Burn columns recompute from hourly counts; the page flag is
    exactly the two-window conjunction; a page implies the fast
    window alone would have fired."""
    rows = sorted(
        QUERIES["slo_burn_rate_alerts"](spark, SF).collect(),
        key=lambda r: r.hour,
    )
    assert rows
    s_err, s_n = [], []
    for i, r in enumerate(rows):
        s_err.append(r.n_err)
        s_n.append(r.n)
        rate = r.n_err * 1_000_000 // r.n
        e6 = sum(s_err[max(0, i - 5): i + 1])
        n6 = sum(s_n[max(0, i - 5): i + 1])
        rate6 = e6 * 1_000_000 // n6
        assert r.burn_1h_micro == rate * 1_000_000 // 150_000
        assert r.burn_6h_micro == rate6 * 1_000_000 // 150_000
        expect_page = (
            1
            if r.burn_1h_micro >= 2_000_000
            and r.burn_6h_micro >= 1_000_000
            else 0
        )
        assert r.page == expect_page
        if r.page:
            assert r.burn_1h_micro >= 2_000_000


def test_session_gap_sweep_monotone_and_recomputes(spark):
    """Session counts recompute from per-user diffs and are MONOTONE
    DECREASING in the gap (a boundary at 60m is one at 30m and 10m);
    events-per-session grows with the gap."""
    rows = {
        r.gap_minutes: r
        for r in QUERIES["session_gap_sweep"](spark, SF).collect()
    }
    assert set(rows) == {10, 30, 60}
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_u = defaultdict(list)
    for e in ev:
        by_u[e.user_id].append((e.ts, e.event_id))
    n_events = len(ev)
    for g, r in rows.items():
        bound_us = g * 60_000_000
        n_sessions = 0
        for evs in by_u.values():
            evs.sort()
            n_sessions += 1
            for (a, _), (b, _) in zip(evs, evs[1:]):
                if (b - a).total_seconds() * 1_000_000 > bound_us:
                    n_sessions += 1
        assert r.n_sessions == n_sessions
        assert (
            r.events_per_session_micro
            == n_events * 1_000_000 // n_sessions
        )
    assert rows[10].n_sessions >= rows[30].n_sessions >= rows[60].n_sessions
    assert (
        rows[10].events_per_session_micro
        <= rows[30].events_per_session_micro
        <= rows[60].events_per_session_micro
    )
