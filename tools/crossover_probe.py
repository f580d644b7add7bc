#!/usr/bin/env python3
"""Above-crossover probe for the cell-blocked kNN escalation
(VERDICT r12 #4).

The flat-vs-two-level blocking crossover sits at n = 2·target_cell²
= 125,000 vectors (``operators/similarity.TWO_LEVEL_CROSSOVER``) —
where the flat adaptive-K codebook's own assignment pass
(n·K = n²/target_cell cosine scorings) overtakes the two-level
structure's n²/(coarse_k·target_cell). Every fixture the driver and
the sf1 probe use sits BELOW that point (sf1 inflates embeddings to
20k vectors), so the two-level multi-probe's winning regime was an
argument, not a measurement, through r12.

This tool builds the measurement: an XL embeddings corpus of
``COPIES`` key-shifted copies of the sf0.1 fixture (64 × 2,000 =
128,000 vectors — just past the crossover, the cheapest point where
the win should appear), then times ``label_noise_knn_disagreement``
at that scale under each blocking mode:

- ``flat``     — adaptive K = ⌈n/250⌉ = 512 centroids; assignment is
                 n·K ≈ 65.5M cosine rankings (the regime the
                 crossover analysis says loses here);
- ``two_level``— coarse_k=8 multi-probe; ranking is
                 n·(coarse_k + nprobe_coarse·k_g) ≈ 17.4M (k_g ≈ 64
                 per coarse cell);
- ``auto``     — the registered default; must resolve to two_level at
                 this n (the mode it picks is recorded, asserting the
                 r13 auto-escalation routes to the winner).

The per-cell candidate pair work is identical across modes (same
target cell density), so the delta isolates the assignment/ranking
term the crossover analysis is about. One JSON line to stdout;
steal_pct telemetry as in sf1_probe (>~1% = rerun).

Usage: python tools/crossover_probe.py [copies] [configs]
  copies  — XL corpus = copies × 2,000 vectors (default 64 = 128k)
  configs — comma-separated subset of flat,two_level,two_level_fine1
            (default: all three)
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

SF01 = "/root/testdata/sf0.1"
XL_DIR_BASE = "/tmp/sf_knn_xl"
# multiple of every modulus the fixtures plant structure with, same
# constant as sf1_probe so per-copy planted relationships survive
SHIFT = 10_000_000


def inflate(spark, copies: int, xl_dir: str) -> None:
    dst = os.path.join(xl_dir, "embeddings.parquet")
    if os.path.exists(dst):
        return
    os.makedirs(xl_dir, exist_ok=True)
    src = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    out = None
    for k in range(copies):
        c = src.withColumn("vec_id", F.col("vec_id") + F.lit(k * SHIFT))
        out = c if out is None else out.unionByName(c)
    out.write.mode("overwrite").parquet(dst)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from bench import _cpu_stat  # steal telemetry

    from series_tiempo_ar_scraping_spark.operators import (
        similarity as S,
    )
    from series_tiempo_ar_scraping_spark.queries_batch12 import (
        label_noise_knn_disagreement,
    )

    stat0 = _cpu_stat()
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"
    spark = get_spark("crossover-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    # one dir per scale so multi-point curves reuse each inflation
    xl_dir = XL_DIR_BASE if copies == 64 else f"{XL_DIR_BASE}_{copies}"
    inflate(spark, copies, xl_dir)
    n = spark.read.parquet(
        os.path.join(xl_dir, "embeddings.parquet")
    ).count()
    out = {
        "n_vectors": n,
        "crossover": S.TWO_LEVEL_CROSSOVER,
        "auto_resolves_to": S.blocking_mode_for(n),
    }
    # three configs: flat (adaptive K, nprobe 2 => 2 candidate cells);
    # two_level at the r12 wiring (nprobe 2x2 => up to 4 candidate
    # cells — double the pair work of flat, the suspected reason the
    # first 128k reading lost); two_level_fine1 (nprobe 2x1 => 2
    # candidate cells — the candidate-budget-parity escalation, which
    # isolates the ranking-term savings the crossover analysis is
    # about)
    configs = {
        "flat": dict(blocking="flat"),
        "two_level": dict(blocking="two_level", nprobe_fine=2),
        "two_level_fine1": dict(blocking="two_level", nprobe_fine=1),
    }
    if len(sys.argv) > 2:
        wanted = sys.argv[2].split(",")
        configs = {k: v for k, v in configs.items() if k in wanted}
    for mode, kw in configs.items():
        t0 = time.perf_counter()
        label_noise_knn_disagreement(
            spark, xl_dir, **kw
        ).write.mode("overwrite").format("noop").save()
        out[f"{mode}_sec"] = round(time.perf_counter() - t0, 3)
        print(f"PROBE_DETAIL label_noise_knn[{mode}] @ {n}: "
              f"{out[f'{mode}_sec']}s")
    for mode in configs:
        if mode != "flat" and "flat_sec" in out:
            out[f"{mode}_speedup_vs_flat"] = round(
                out["flat_sec"] / out[f"{mode}_sec"], 2
            )
    stat1 = _cpu_stat()
    if stat0 and stat1 and stat1[1] > stat0[1]:
        out["steal_pct"] = round(
            100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2
        )
    print(json.dumps({"crossover_probe": out}))


if __name__ == "__main__":
    main()
