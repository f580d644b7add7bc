"""Consumer read API: correct slices AND pruned scans."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark import api
from series_tiempo_ar_scraping_spark.session import load_table
from series_tiempo_ar_scraping_spark.sinks.csv_wide import (
    write_observations_parquet,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _store(spark, sf_dir, tmp_path) -> str:
    e = load_table(spark, sf_dir, "events")
    obs = e.select(
        F.lit("cat1").alias("catalog_id"),
        F.col("event_type").alias("series_id"),
        "ts",
        "value",
        F.lit("D").alias("freq_code"),
    )
    # a second catalog so partition pruning has something to prune
    obs2 = obs.withColumn("catalog_id", F.lit("cat2"))
    store = str(tmp_path / "obs_store")
    write_observations_parquet(obs.unionByName(obs2), store)
    return store


def test_get_series_slice_and_pruning(spark, sf_dir, tmp_path):
    store = _store(spark, sf_dir, tmp_path)
    df = api.get_series(
        spark, store, "click",
        start="2024-01-01 00:00:00", catalog_id="cat1",
    )
    p = _plan(df)
    # catalog predicate prunes partitions; series/ts predicates push down
    assert "PartitionFilters" in p and "cat1" in p
    assert "PushedFilters" in p
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "series_id" in pushed and "ts" in pushed

    rows = df.collect()
    e = load_table(spark, sf_dir, "events")
    want = e.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= "2024-01-01 00:00:00")
    ).count()
    assert len(rows) == want
    assert all(r.series_id == "click" and r.catalog_id == "cat1" for r in rows)
    # ordered by ts within the series
    ts = [r.ts for r in rows]
    assert ts == sorted(ts)


def test_series_summary_matches_direct_agg(spark, sf_dir, tmp_path):
    store = _store(spark, sf_dir, tmp_path)
    # catalog-scoped keying: an unfiltered multi-catalog summary keeps
    # same-named series from different catalogs apart (2 rows per name)
    unfiltered = api.series_summary(spark, store).collect()
    per_name = {}
    for r in unfiltered:
        per_name.setdefault(r.series_id, set()).add(r.catalog_id)
    assert all(cats == {"cat1", "cat2"} for cats in per_name.values())
    got = {
        r.series_id: r
        for r in api.series_summary(spark, store, catalog_id="cat1").collect()
    }
    e = load_table(spark, sf_dir, "events")
    want = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min("ts").alias("f"),
             F.max("ts").alias("l"))
        .collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k].n_obs == w.n
        assert got[k].first_ts == w.f and got[k].last_ts == w.l


def test_resample_last_and_sum(spark, sf_dir, tmp_path):
    store = _store(spark, sf_dir, tmp_path)
    df = api.get_series(spark, store, "click", catalog_id="cat1")
    monthly_last = {
        (r.series_id, r.period): r.value
        for r in api.resample(df, "month", "last").collect()
    }
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    want = {
        (r.event_type, r.period): r.v
        for r in e.groupBy(
            "event_type", F.date_trunc("month", "ts").alias("period")
        ).agg(
            # same deterministic tiebreak as api.resample: latest ts, then
            # max value — a bare max_by(value, ts) could flake on tied ts
            F.max_by("value", F.struct("ts", "value")).alias("v")
        ).collect()
    }
    assert {(k[0], k[1]): v for k, v in monthly_last.items()} == {
        (k[0], k[1]): v for k, v in want.items()
    }
    import pytest

    with pytest.raises(ValueError):
        api.resample(df, "month", "median")
