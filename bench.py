#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "value_cold": total_sec,
"queries_cold": {...}}.

Two lanes (see SCALE.md "Bench methodology"):
- value/queries — steady-state: hot-table cache, warm codegen,
  min(first, second) per query. The declared headline.
- value_cold/queries_cold — cold: no table cache, first run in the
  session, pays parquet scan + codegen compile. Single-sample by
  construction (a query is only cold once per JVM), so it carries a
  ±20% run-to-run variance band — see SCALE.md. Exists so a plan
  regression can't hide behind the warm cache. Skip with
  SPARK_GRAFT_BENCH_SKIP_COLD=1 during iteration.

The r2-era 29-query set is frozen as BENCH_QUERIES_R2; its subtotals are
reported as value_r2set / value_cold_r2set for round-over-round lineage.
The headline value/value_cold cover the extended set (r2 + post-r2 heavy
queries) as of round 6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from series_tiempo_ar_scraping_spark.queries import QUERIES  # noqa: E402
from series_tiempo_ar_scraping_spark.session import get_spark  # noqa: E402

# Heavier, representative subset — full catalog correctness is the gate's
# job; bench tracks throughput of the scan/shuffle/window/join heavy paths.
# BENCH_QUERIES_R2 is the original 29-query set, FROZEN for round-over-round
# lineage (r2-r5 totals were computed over exactly this list; the JSON line
# reports its subtotal as value_r2set / value_cold_r2set).
BENCH_QUERIES_R2 = [
    "q01_pricing_summary",
    "q03_revenue_topk",
    "q05_region_revenue",
    "semi_orders_with_big_lineitem",
    "align_daily_activity",
    "series_gap_check",
    "rolling_value_avg",
    "tumbling_hourly_counts",
    "resample_gapfill_daily",
    "asof_last_click_before_purchase",
    "pivot_monthly_region_revenue",
    "sessionize_events",
    "text_stats",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "window_rank_suite",
    "range_join_purchase_context",
    "cube_status_priority",
    "dedup_embedding_cosine",
    "ivf_ann_topk",
    "multimodal_frame_sample",
    "sliding_window_rates",
    "dedup_connected_components",
    "tfidf_top_terms",
    "percentile_order_values",
    "grouping_sets_order_stats",
    "weighted_avg_discount_udaf",
    "skyline_orders_pareto",
    "json_props_bucket_stats",
]

# Heaviest post-r2 catalog entries — ANN variants, time-series batch 8,
# SCD2, layout stats, graph, and the curation funnel. Appended so the
# whole perf-relevant surface has a per-round signal; the frozen r2 set
# above keeps its own subtotal for lineage.
BENCH_QUERIES_EXT = [
    "pq_ann_topk",
    "ivfpq_ann_topk",
    "series_seasonal_decompose",
    "series_holt_forecast",
    "scd2_user_state_history",
    "scd2_point_in_time_join",
    "zorder_bucket_stats",
    "incremental_dedup",
    "curation_filter_funnel",
    "decontamination_ngram_overlap",
    "pagerank_part_graph",
    "graph_triangle_stats",
    "rolling_median_value",
    "salted_user_event_stats",
    "interval_overlap_coactivity",
    "token_length_histogram",
]

BENCH_QUERIES = BENCH_QUERIES_R2 + BENCH_QUERIES_EXT


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _run_once(fn, spark, sf_dir: str) -> float:
    """Build and fully materialize one query; return elapsed seconds.
    The noop sink materializes every column (count() would let Catalyst
    prune the projections and under-report the work)."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # One trivial action so neither lane charges session startup (~10 s of
    # JVM boot that has nothing to do with any query).
    spark.range(1000).count()

    missing = [n for n in BENCH_QUERIES if n not in QUERIES]
    if missing:
        # a renamed/removed headline query must fail loudly — silently
        # summing fewer queries would read as a throughput win
        raise SystemExit(f"bench queries missing from catalog: {missing}")

    # --- Cold lane: the r1-r3 methodology, kept for round-over-round
    # regression tracking. Table cache OFF, each query timed on its FIRST
    # run in this session — so it pays the parquet scan, whole-stage-codegen
    # compile, and AQE init, exactly like a fresh driver would. It runs
    # BEFORE the steady lane so nothing is pre-warmed. Skippable during
    # tight iteration with SPARK_GRAFT_BENCH_SKIP_COLD=1.
    cold: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_COLD") != "1":
        os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
        for name in BENCH_QUERIES:
            cold[name] = _run_once(QUERIES[name], spark, sf_dir)

    # --- Steady lane: the declared headline number. Hot-table cache ON
    # (load_table persists each table in memory, repartitioned to the core
    # count — the fixture parquet is one row group per file, so without
    # this every scan is a single task regardless of cores), cache
    # pre-materialized untimed, and each query runs twice: the first run
    # absorbs one-time costs (codegen compilation, JVM JIT of the generated
    # classes — measured at 1.5-1.9 s on a 0.6-0.9 s steady query at sf0.1,
    # drifting upward as the JVM accretes classes across rounds), the
    # reported number is min(first, second) to guard against cache-eviction
    # pathologies. At 100 TB the compile cost is amortized over minutes of
    # scan; charging it to a sub-second local query only adds noise — the
    # cold lane above is where that cost stays visible.
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
    from series_tiempo_ar_scraping_spark.session import load_table

    for t in TABLES:
        load_table(spark, sf_dir, t)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        first = _run_once(QUERIES[name], spark, sf_dir)
        second = _run_once(QUERIES[name], spark, sf_dir)
        timings[name] = min(first, second)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # subtotal over the frozen r2-era 29-query set — directly
        # comparable with the r2-r5 "value" lineage
        "value_r2set": round(
            sum(timings[n] for n in BENCH_QUERIES_R2), 3
        ),
    }
    if cold:
        out["value_cold"] = round(sum(cold.values()), 3)
        out["queries_cold"] = cold
        out["value_cold_r2set"] = round(
            sum(cold[n] for n in BENCH_QUERIES_R2), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
