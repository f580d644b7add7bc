"""Write-Audit-Publish sink: the atomic-release contract, driven."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.sinks.wap import (
    MANIFEST,
    no_null_audit,
    non_empty_audit,
    write_audit_publish,
)


def test_wap_publishes_good_output(spark, tmp_path):
    pub = str(tmp_path / "pub")
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    r = write_audit_publish(df, pub, [non_empty_audit])
    assert r["published"] and r["rows"] == 10 and r["generation"] == 1
    back = spark.read.parquet(pub)
    assert back.count() == 10
    with open(os.path.join(pub, MANIFEST)) as fh:
        m = json.load(fh)
    assert m["rows"] == 10 and m["generation"] == 1
    # no staging/retired residue
    assert not os.path.exists(pub + ".staging")
    assert not os.path.exists(pub + ".retired")


def test_wap_failed_audit_preserves_current_publication(spark, tmp_path):
    """THE property: a failed audit must leave the live publication
    byte-for-byte as it was — the reference's write-then-validate
    order cannot give this."""
    pub = str(tmp_path / "pub")
    good = spark.range(5).select(
        F.col("id"), F.lit("x").alias("tag")
    )
    assert write_audit_publish(good, pub, [non_empty_audit])["published"]
    bad = spark.range(3).select(
        F.col("id"), F.lit(None).cast("string").alias("tag")
    )
    r = write_audit_publish(
        bad, pub, [non_empty_audit, no_null_audit("tag")]
    )
    assert not r["published"]
    assert any("null" in f for f in r["failures"])
    # the live publication is untouched: still generation 1, 5 rows,
    # no NULL tags
    back = spark.read.parquet(pub)
    assert back.count() == 5
    assert back.filter(F.col("tag").isNull()).count() == 0
    with open(os.path.join(pub, MANIFEST)) as fh:
        assert json.load(fh)["generation"] == 1
    assert not os.path.exists(pub + ".staging")


def test_wap_generations_increment_and_replace(spark, tmp_path):
    pub = str(tmp_path / "pub")
    for n in (3, 7):
        df = spark.range(n).select(F.col("id"))
        r = write_audit_publish(df, pub, [non_empty_audit])
        assert r["published"]
    back = spark.read.parquet(pub)
    assert back.count() == 7  # the new release REPLACED the old
    with open(os.path.join(pub, MANIFEST)) as fh:
        assert json.load(fh)["generation"] == 2


def test_wap_empty_output_refused(spark, tmp_path):
    pub = str(tmp_path / "pub")
    empty = spark.range(0).select(F.col("id"))
    r = write_audit_publish(empty, pub, [non_empty_audit])
    assert not r["published"]
    assert not os.path.exists(pub)
