#!/usr/bin/env python3
"""Scale probe: measure core operator shapes at geometrically growing
sizes and report rows/sec — the empirical check behind SCALE.md's
claims. A shape whose throughput degrades as data grows has a
super-linear term (driver round-trip, unbounded state, quadratic join)
that 100 TB will find; constant-ish rows/sec across sizes is the
signature of a plan that scales out.

Usage: python tools/scale_probe.py [sizes...] [--shapes a,b,c]
(default sizes 2 8 32, in millions of rows; synthetic data is written
under /tmp/scale_probe; --shapes restricts to named kernels so the
100M+ runs don't re-time everything)

Prints one JSON line: {"rows_per_sec_by_size": {shape: {size: rows_per_sec}}}.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from series_tiempo_ar_scraping_spark.operators import textops as _TX  # noqa: E402
from series_tiempo_ar_scraping_spark.session import get_spark  # noqa: E402

BASE = "/tmp/scale_probe"


def _shingles(col):
    return _TX.shingles_from_tokens(
        _TX.tokens(_TX.normalize_text(col)), 3
    )


def synth_events(spark, n_rows: int, path: str) -> None:
    """Deterministic events-shaped frame: REAL skew — 30% of rows land
    on 100 hot users, the rest spread over ~100k — plus 5 types, 90 days
    of seconds-resolution timestamps, text-ish props. The hot keys are
    what make the per-key window/agg shapes honest: a shape that
    degrades under hot partitions must show it here."""
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            F.when(
                # 100 hot users: the hot-key expression must be independent
                # of the 30%-selector digit (id % 10 < 3 keeps only ids
                # ending 0/1/2, so id % 100 would yield just 30 keys)
                F.col("id") % 10 < 3, F.floor(F.col("id") / 10) % 100
            )
            .otherwise(
                F.pmod(F.hash(F.col("id").cast("string")), F.lit(100000))
            )
            .alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in
                          ("click", "view", "purchase", "signup", "error")]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 9973).cast("double").alias("value"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("id") % 7776000).cast("double"))
            ).alias("ts"),
            F.md5(F.col("id").cast("string")).alias("props"),
        )
    )
    df.write.mode("overwrite").parquet(path)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _zipf_key():
    """Zipf(1)-distributed key over 1..100_000, derived from event_id
    by inverse-CDF (log-uniform: P(k) ~ 1/k — the hottest key draws
    ~1/ln(K) ~ 8.7% of ALL rows). The shape real user/url/token keys
    take; the uniform+100-hot mix in synth_events is milder. Built
    lazily: Column construction needs an active SparkContext."""
    import math

    return F.floor(
        F.exp(
            (
                F.pmod(
                    F.hash(F.col("event_id").cast("string")),
                    F.lit(1000000),
                )
                / 1000000.0
            )
            * float(math.log(100000))
        )
    ).cast("long").alias("zkey")


def _tar_kernel(e):
    """mapInPandas pack->walk round trip over the props column."""
    from series_tiempo_ar_scraping_spark.operators.multimodal import (
        list_tar_members,
        pack_tar,
        typed_pdf,
    )
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(e.sparkSession)

    def run(batches):
        for pdf in batches:
            rows = []
            for eid, props in zip(pdf["event_id"], pdf["props"]):
                blob = pack_tar(
                    [
                        (f"{int(eid) % 10**8:08d}.txt",
                         str(props).encode()),
                        (f"{int(eid) % 10**8:08d}.json", b"{}"),
                    ]
                )
                members = list_tar_members(blob)
                rows.append(
                    (int(eid), len(blob), sum(len(d) for _, d in members))
                )
            yield typed_pdf(
                rows, "event_id bigint, tar_bytes bigint, payload bigint"
            )

    (
        e.select("event_id", "props")
        .mapInPandas(run, "event_id bigint, tar_bytes bigint, payload bigint")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )


def _tar_payload64k_kernel(e):
    """Payload-heavy container round trip: a 64 KiB blob PER ROW built
    JVM-side (repeat of the 32-char props — no 64 KB ever touches
    disk), shipped through Arrow into a 1-member tar pack + walk. The
    small-payload tar kernel times per-container Python overhead
    (~6.2k containers/s/core); THIS one times the byte lane, so
    SCALE.md's 'payload-dominated, Arrow at memory bandwidth' claim is
    a measurement: bytes/s = rows/s * 65536."""
    from series_tiempo_ar_scraping_spark.operators.multimodal import (
        list_tar_members,
        pack_tar,
        typed_pdf,
    )
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(e.sparkSession)

    def run(batches):
        for pdf in batches:
            rows = []
            for eid, blob in zip(pdf["event_id"], pdf["payload"]):
                tar = pack_tar(
                    [(f"{int(eid) % 10**8:08d}.bin", bytes(blob))]
                )
                members = list_tar_members(tar)
                rows.append(
                    (int(eid), len(tar),
                     sum(len(d) for _, d in members))
                )
            yield typed_pdf(
                rows, "event_id bigint, tar_bytes bigint, payload bigint"
            )

    (
        e.select(
            "event_id",
            F.encode(F.repeat(F.col("props"), 2048), "utf-8")
            .alias("payload"),
        )
        .mapInPandas(
            run, "event_id bigint, tar_bytes bigint, payload bigint"
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )


def main() -> None:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--shapes" in args:
        i = args.index("--shapes")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sizes_m = [int(a) for a in args] or [2, 8, 32]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # JVM warm-up

    shapes = {
        "hash_agg": lambda e: e.groupBy("event_type", "user_id")
        .agg(F.count("*"), F.sum(F.col("value").cast("decimal(22,4)")))
        .write.mode("overwrite").format("noop").save(),
        "window_per_key": lambda e: e.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        ).filter(F.col("rn") <= 3)
        .write.mode("overwrite").format("noop").save(),
        "md5_expr_scan": lambda e: e.select(
            F.md5(F.concat_ws("|", "props", "event_type")).alias("h")
        ).groupBy(F.substring("h", 1, 2)).count()
        .write.mode("overwrite").format("noop").save(),
        # round 7: the tokenize->shingle kernel (the curation pipeline's
        # hot projection). Map-only by construction here — the probe
        # verifies the KERNEL scales linearly; the AQE-coalesce hazard
        # it met in the pipeline is a partitioning property, pinned
        # separately in tests/test_plans.py.
        "shingle_scan": lambda e: e.select(
            _shingles(F.concat_ws(" ", "props", "event_type"))
            .alias("sh")
        ).write.mode("overwrite").format("noop").save(),
        # round 7 batch 11: the BPE merge kernel — char segmentation +
        # double-space encode + one non-overlapping replace + re-split.
        # Map-only; the probe verifies the string-heavy apply path
        # scales linearly (the train loop's shuffle is hash_agg-shaped).
        "bpe_replace_kernel": lambda e: e.select(
            F.size(
                F.filter(
                    F.split(
                        F.replace(
                            F.concat(
                                F.lit("  "),
                                F.array_join(
                                    F.expr(
                                        "transform(sequence(1,"
                                        " length(props)),"
                                        " i -> substring(props, i, 1))"
                                    ),
                                    "  ",
                                ),
                                F.lit("  "),
                            ),
                            F.lit(" a  b "),
                            F.lit(" ab "),
                        ),
                        " +",
                    ),
                    lambda x: x != "",
                )
            ).alias("n")
        ).write.mode("overwrite").format("noop").save(),
        # round 7 batch 12: the eigen-iteration ingest kernel — per-row
        # mini-vector outer product aggregated into a fixed D x D Gram
        # (D=4 here; the catalog query uses D=64). Expansion is D^2
        # rows per input but the aggregate is map-side combinable into
        # 16 cells, so the shuffle is constant-size regardless of rows.
        "gram_outer_product": lambda e: e.select(
            F.expr(
                "transform(sequence(0, 3),"
                " i -> CAST((event_id >> (4 * i)) % 1000 AS BIGINT))"
            ).alias("v")
        )
        .select(F.posexplode("v").alias("a", "xa"), F.col("v"))
        .select("a", "xa", F.posexplode("v").alias("b", "xb"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")))
        .write.mode("overwrite").format("noop").save(),
        # round 8 batch 17/20: the Arrow container kernel — the ONE
        # sanctioned Python lane in the hot path. Per row: pack a
        # 2-member tar from the props bytes, then walk it back. This
        # prices mapInPandas round trips (Arrow transfer + per-row
        # Python) so the multimodal family gets a 100 TB budget like
        # the string kernels.
        "tar_container_kernel": lambda e: _tar_kernel(e),
        # round 9: the payload-dominated twin — 64 KiB/row through the
        # Arrow lane (run at SMALL sizes: 1m rows = 64 GiB in flight)
        "tar_payload64k_kernel": lambda e: _tar_payload64k_kernel(e),
        # round 8 batch 15/17: the governance regex kernel — one
        # extract_all census + one chained replace over the same text,
        # the PII detect/redact hot path. Map-only; rides whole-stage
        # codegen (Java regex, no Python).
        "pii_regex_scan": lambda e: e.select(
            F.size(
                F.regexp_extract_all(
                    F.concat_ws(" ", "props", "event_type"),
                    F.lit("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"),
                    F.lit(0),
                )
            ).alias("n"),
            F.length(
                F.regexp_replace(
                    F.concat_ws(" ", "props", "event_type"),
                    "[0-9]{3}-[0-9]{2}-[0-9]{4}",
                    "<ID>",
                )
            ).alias("m"),
        ).write.mode("overwrite").format("noop").save(),
        # round 8: zipf(1) keys (hottest key ~8.7% of all rows) through
        # the two paths SCALE.md prescribes for skew. salted_zipf_agg is
        # the salted_user_event_stats pattern: (key, salt16) partials
        # spread the hot key over 16 reducers, then a tiny merge —
        # versus plain_zipf_agg, the naive single-shuffle GROUP BY whose
        # hottest reducer owns the hot key outright (partial_agg blunts
        # it for algebraic aggregates; the salt is for the holdouts like
        # collect_set). Near-equal rows/sec here = partial aggregation
        # is doing its job; the salt's win shows on non-combinable aggs.
        "plain_zipf_agg": lambda e: e.select(
            _zipf_key(), "value"
        ).groupBy("zkey")
        .agg(F.count("*"), F.sum(F.col("value").cast("decimal(22,4)")))
        .write.mode("overwrite").format("noop").save(),
        "salted_zipf_agg": lambda e: e.select(
            _zipf_key(), "value", (F.col("event_id") % 16).alias("_salt")
        )
        .groupBy("zkey", "_salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(22,4)")).alias("psum"),
        )
        .groupBy("zkey")
        .agg(F.sum("pn"), F.sum("psum"))
        .write.mode("overwrite").format("noop").save(),
        # The LSH-bucket-join path under skew: a fact-fact equi-join on
        # the zipf key (bucket id), dim side = the distinct key space
        # with a derived attribute — the shuffle lands ~8.7% of the fact
        # on one key, which AQE's skew-join splitting must absorb. The
        # merge hint keeps the probe honest: the ~100k-row dim would
        # auto-broadcast and skip the skewed shuffle entirely, but at
        # LSH scale the candidate side is NOT broadcastable — the
        # sort-merge path with its skewed exchange is the real plan.
        # Rows out = rows in (no quadratic blowup: the real LSH path
        # joins bucket->candidates, never self-joins the raw skew side).
        "zipf_skew_join": lambda e: (
            lambda f: f.join(
                f.select("zkey").distinct().withColumn(
                    "attr", F.md5(F.col("zkey").cast("string"))
                ).hint("merge"),
                "zkey",
            )
            .groupBy(F.substring("attr", 1, 2))
            .count()
            .write.mode("overwrite").format("noop").save()
        )(e.select(_zipf_key(), "value")),
        "broadcast_join": lambda e: e.join(
            F.broadcast(
                e.sparkSession.createDataFrame(
                    [(t, i) for i, t in enumerate(
                        ("click", "view", "purchase", "signup", "error"))],
                    "event_type string, type_code int",
                )
            ),
            "event_type",
        ).groupBy("type_code").agg(F.count("*"))
        .write.mode("overwrite").format("noop").save(),
    }

    if only is not None:
        unknown = only - set(shapes)
        if unknown:
            raise SystemExit(f"unknown probe shapes: {sorted(unknown)}")
        shapes = {k: v for k, v in shapes.items() if k in only}

    report: dict[str, dict[str, float]] = {k: {} for k in shapes}
    for m in sizes_m:
        n = m * 1_000_000
        path = f"{BASE}/events_{m}m"
        synth_events(spark, n, path)
        e = spark.read.parquet(path)
        for name, fn in shapes.items():
            fn(e)  # untimed warm-up (codegen)
            dt = timed(lambda: fn(e))
            report[name][f"{m}m"] = round(n / dt)
    print(json.dumps({"rows_per_sec_by_size": report}))
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
