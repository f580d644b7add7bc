"""K1/K7/K8 — standardized wide-CSV sink + metadata rewrite/scrub.

The reference writes one CSV per distribution at
``.../catalog/{cid}/dataset/{did}/distribution/{rid}/download/{fileName}``
with ``index_label='indice_tiempo'`` (``base.py:266-279``, path scheme
``base.py:242-249,336-341,650-655``), then rewrites ``downloadURL`` (K7,
``base.py:221-236``) and scrubs scraping-only keys before publishing (K8,
``base.py:657-677``).

Single-file-per-distribution is a *contract*, not a scale problem: each
distribution is small (one time series table); millions of them
parallelize as independent writes. The long observations frame is also
written as partitioned parquet — that's the analytical sink that scales.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.config import (
    SCRAPING_ONLY_DISTRIBUTION_KEYS,
    SCRAPING_ONLY_FIELD_KEYS,
)
from series_tiempo_ar_scraping_spark.functions.scalars import host_rewrite
from series_tiempo_ar_scraping_spark.operators.joins import align_series_wide

TIME_INDEX = "indice_tiempo"


def distribution_dir(output_dir: str, catalog_id: str, dataset_id: str, distribution_id: str) -> str:
    """Path contract parity: ``base.py:242-249``."""
    return os.path.join(
        output_dir,
        "catalog",
        catalog_id,
        "dataset",
        dataset_id,
        "distribution",
        distribution_id,
        "download",
    )


def write_wide_csv(obs_one_dist: DataFrame, out_path: str, series_titles: list[str] | None = None) -> str:
    """Pivot one distribution's long rows to the wide contract and write a
    single CSV file (coalesce(1) + rename — the file IS the product)."""
    wide = align_series_wide(obs_one_dist, series_titles).orderBy(TIME_INDEX)
    tmp = out_path + "_tmp"
    wide.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".csv")
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    os.replace(os.path.join(tmp, part), out_path)
    for f in os.listdir(tmp):
        os.remove(os.path.join(tmp, f))
    os.rmdir(tmp)
    return out_path


def write_observations_parquet(obs: DataFrame, path: str) -> None:
    """The scale sink: long form partitioned by ``catalog_id`` (and
    ``freq_code`` when present) — partition pruning covers the dominant
    access patterns (per-catalog republish, per-frequency validation).
    ``series_id`` stays *unpartitioned* (cardinality too high for
    directories) but rows sort by (series_id, ts) within partitions, so
    parquet row-group min/max stats skip non-matching groups on
    per-series reads — poor-man's clustering, no shuffle beyond the sort.
    """
    parts = ["catalog_id"] + (["freq_code"] if "freq_code" in obs.columns else [])
    (
        obs.sortWithinPartitions("series_id", "ts")
        .write.mode("overwrite")
        .partitionBy(*parts)
        .parquet(path)
    )


def rewrite_download_urls(distributions: DataFrame, output_dir: str, host: str) -> DataFrame:
    """K7 — point each distribution's downloadURL at the published file
    (``base.py:221-236``)."""
    path = F.concat_ws(
        "/",
        F.lit(output_dir),
        F.lit("catalog"),
        F.col("catalog_id"),
        F.lit("dataset"),
        F.col("dataset_id"),
        F.lit("distribution"),
        F.col("distribution_id"),
        F.lit("download"),
        F.col("fileName"),
    )
    return distributions.withColumn(
        "downloadURL", host_rewrite(path, output_dir, host)
    )


def scrub_scraping_metadata(distributions: DataFrame, fields: DataFrame) -> tuple[DataFrame, DataFrame]:
    """K8 — drop scraping-only keys before publication (``base.py:657-677``)."""
    d = distributions.drop(
        *[c for c in SCRAPING_ONLY_DISTRIBUTION_KEYS if c in distributions.columns]
    )
    f = fields.drop(*[c for c in SCRAPING_ONLY_FIELD_KEYS if c in fields.columns])
    return d, f
