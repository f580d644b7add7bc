"""EP1 — the full catalog ETL as a declarative pipeline.

The reference interleaves planning and effects (constructing a ``Catalog``
already downloads, validates and writes — ``base.py:65-73,376-504``); here
phase 1 is **pure planning** (build normalized frames + a routed task
frame, zero side effects) and phase 2 executes DataFrame actions. Statuses
are data (V7); reports and indicators come out as frames.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.config import (
    FREQ_ISO_TO_CODE,
    METHOD_CSV,
    METHOD_EXCEL,
    METHOD_TXT,
)
from series_tiempo_ar_scraping_spark.operators.aggregations import (
    catalog_indicators,
    sort_reports_by_status,
)
from series_tiempo_ar_scraping_spark.operators.filters import (
    clean_field_keyspace,
    filter_catalog_id,
    filter_distribution_id,
    harvestable_datasets,
    time_series_distributions,
    with_method,
)
from series_tiempo_ar_scraping_spark.operators.validation import (
    datasets_report,
    distribution_statuses,
    trim_warnings,
    validate_metadata,
    validate_observations,
)
from series_tiempo_ar_scraping_spark.sinks.csv_wide import (
    rewrite_download_urls,
    scrub_scraping_metadata,
    write_wide_csvs_bulk,
)
from series_tiempo_ar_scraping_spark.sources.catalog_json import read_catalog_json
from series_tiempo_ar_scraping_spark.sources.cells import extract_cells
from series_tiempo_ar_scraping_spark.sources.distribution_csv import (
    read_distributions_bulk,
    sniff_txt_sep,
)
from series_tiempo_ar_scraping_spark.sources.scrape import (
    check_headers,
    scrape_observations,
    scraping_params,
)

# Routing lists (which distribution goes to which reader) are metadata-
# plane driver state — one row per distribution, thousands at reference
# scale. This cap turns "someone pointed the ETL at a 10M-distribution
# catalog" into a clear error naming the fleet path (SCALE.md §Routing
# collects) instead of a silent driver OOM. Override via env when a
# bigger metadata plane is genuinely intended.
_ROUTING_COLLECT_CAP = int(
    os.environ.get("SPARK_GRAFT_ROUTING_COLLECT_CAP", "1000000")
)


def _collect_routing(df: DataFrame, what: str) -> list:
    rows = df.limit(_ROUTING_COLLECT_CAP + 1).collect()
    if len(rows) > _ROUTING_COLLECT_CAP:
        raise RuntimeError(
            f"{what} routing list exceeds {_ROUTING_COLLECT_CAP} rows; "
            "this driver-side collect is metadata-plane only — use the "
            "executor-side fleet path (sources.landing.download_many) or "
            "raise SPARK_GRAFT_ROUTING_COLLECT_CAP (SCALE.md: Routing "
            "collects)"
        )
    return rows


@dataclass
class PipelineResult:
    frames: dict[str, DataFrame]
    metadata_errors: DataFrame
    observations: DataFrame | None
    series_report: DataFrame | None
    distribution_report: DataFrame | None
    dataset_report: DataFrame
    indicators: DataFrame | None
    written_files: list[str] = field(default_factory=list)
    processor_errors: list[tuple[str, str, str, str]] = field(
        default_factory=list
    )


class CatalogPipeline:
    """One catalog end-to-end: metadata → validation → routing → per-method
    extraction → data validation → sinks → reports (SURVEY EP1 steps 3-5).

    ``file_resolver`` maps a source URL/file reference to a local landing
    path (tests point it at fixtures; production points it at the landing
    zone fed by ``sources.landing``).
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog_path: str,
        catalog_id: str,
        output_dir: str,
        file_resolver=None,
        host: str = "http://localhost",
        catalog_id_filter: str | None = None,
        distribution_id_filter: str | None = None,
        replace: bool = True,
    ):
        self.spark = spark
        self.catalog_path = catalog_path
        self.catalog_id = catalog_id
        self.output_dir = output_dir
        self.file_resolver = file_resolver or (lambda ref: ref)
        self.host = host
        self.catalog_id_filter = catalog_id_filter
        self.distribution_id_filter = distribution_id_filter
        # V8 — skip-if-exists unless replace (base.py:155-163, main.py:52-56)
        self.replace = replace

    # -- phase 1: pure planning -------------------------------------------

    def plan(self) -> dict[str, DataFrame]:
        if self.catalog_path.endswith((".xlsx", ".xls")):
            # S5 — formato=xlsx branch (base.py:393-421,932-938)
            from series_tiempo_ar_scraping_spark.sources.xlsx import (
                read_xlsx_catalog,
            )

            frames = read_xlsx_catalog(
                self.spark, self.catalog_path, self.catalog_id
            )
        else:
            frames = read_catalog_json(
                self.spark, self.catalog_path, self.catalog_id
            )
        frames["fields"] = clean_field_keyspace(frames["fields"])
        frames["datasets"] = filter_catalog_id(
            frames["datasets"], self.catalog_id_filter
        )
        frames["distributions"] = filter_distribution_id(
            with_method(frames["distributions"]), self.distribution_id_filter
        )
        return frames

    # -- phase 2: execution ------------------------------------------------

    def run(self, write_csvs: bool = True) -> PipelineResult:
        frames = self.plan()
        # metadata is tiny and re-joined everywhere — cache once
        for k in frames:
            frames[k] = frames[k].cache()

        meta_errors = validate_metadata(frames).cache()
        # report over the UNFILTERED datasets: a dataset with metadata
        # errors must appear as an ERROR row (reference base.py:443-451),
        # not vanish — the harvest filter applies only to further
        # processing
        ds_report = datasets_report(frames["datasets"], meta_errors)
        frames["datasets"] = harvestable_datasets(frames["datasets"], meta_errors)
        ts_dists = time_series_distributions(
            frames["distributions"], frames["fields"]
        ).cache()

        obs_parts: list[DataFrame] = []
        # csv/txt routes (S6/S7): per-distribution file reads. V7: any
        # per-distribution failure (unreadable/garbage file, no series
        # columns) costs an ERROR report row, never the pipeline
        # (base.py:198-207 try/except-continue semantics).
        # ONE bulk read per delimiter group (read-side twin of the bulk
        # CSV sink): job count independent of distribution count. TXT
        # files group by their sniffed delimiter (driver-side header
        # peek, metadata-scale); corrupt/headerless files surface as
        # error tuples from the bulk reader, never exceptions.
        processor_errors: list[tuple[str, str, str, str]] = []
        csv_items: list[tuple[str, str, str, str]] = []
        txt_groups: dict[str, list[tuple[str, str, str, str]]] = {}
        for row in _collect_routing(
            ts_dists.filter(F.col("method").isin(METHOD_CSV, METHOD_TXT)),
            "csv/txt distribution",
        ):
            ref = row.downloadURL or row.scrapingFileURL
            local = self.file_resolver(ref)
            if local is None or not os.path.exists(local):
                continue
            tup = (row.catalog_id, row.dataset_id, row.distribution_id, local)
            if row.method == METHOD_TXT:
                try:
                    txt_groups.setdefault(sniff_txt_sep(local), []).append(tup)
                except Exception as exc:  # noqa: BLE001 — V7 error channel
                    processor_errors.append((*tup[:3], repr(exc)))
            else:
                csv_items.append(tup)
        bulk_groups = [(",", False, csv_items)] + [
            (sep, True, its) for sep, its in sorted(txt_groups.items())
        ]
        for sep, decimal_comma, items in bulk_groups:
            if not items:
                continue
            try:
                obs_b, errs = read_distributions_bulk(
                    self.spark, items, sep=sep, decimal_comma=decimal_comma
                )
                obs_parts.append(obs_b)
                processor_errors.extend(errs)
            except Exception as exc:  # noqa: BLE001 — V7 error channel
                processor_errors.extend(
                    (c, d, r, repr(exc)) for c, d, r, _p in items
                )

        # excel route (S8): extract cells once per distinct workbook (A1),
        # then scrape every series relationally.
        excel_dists = ts_dists.filter(F.col("method") == METHOD_EXCEL)
        excel_urls = [
            r.scrapingFileURL
            for r in _collect_routing(
                excel_dists.select("scrapingFileURL").distinct(),
                "excel workbook",
            )
        ]
        table_ends = None
        header_errors = None
        if excel_urls:
            paths = [p for p in (self.file_resolver(u) for u in excel_urls) if p]
            cells = extract_cells(self.spark, paths).cache()
            sp, tp = scraping_params(frames["fields"], excel_dists)
            headered = check_headers(cells, sp).cache()
            header_errors = headered.filter(~F.col("header_ok"))
            obs_sc, table_ends = scrape_observations(
                cells, headered.filter(F.col("header_ok")), tp
            )
            obs_parts.append(obs_sc)

        observations = None
        series_rep = None
        dist_report = None
        indicators = None
        written: list[str] = []
        if not obs_parts and ts_dists.limit(1).count() > 0:
            # every routed file failed (V7: the reasons are in
            # processor_errors) — the report still lists each routed
            # distribution as ERROR instead of disappearing
            dist_report = sort_reports_by_status(
                ts_dists.select(
                    F.col("dataset_id").alias("dataset_identifier"),
                    F.col("distribution_id").alias("distribution_identifier"),
                    F.lit("ERROR").alias("distribution_status"),
                )
            ).cache()
            indicators = catalog_indicators(ds_report, dist_report)
        if obs_parts:
            observations = obs_parts[0]
            for p in obs_parts[1:]:
                observations = observations.unionByName(p)
            observations = observations.cache()

            # V4: attach frequency from the time-index field, validate.
            freq = (
                frames["fields"]
                .filter(F.col("specialType") == "time_index")
                .select(
                    "distribution_id",
                    # built from FREQ_ISO_TO_CODE — the single source of
                    # truth field validation also checks against, so a
                    # newly supported frequency can't silently disable
                    # gap checks here
                    F.create_map(
                        *[
                            F.lit(x)
                            for kv in FREQ_ISO_TO_CODE.items()
                            for x in kv
                        ]
                    )[F.col("specialTypeDetail")].alias("freq_code"),
                )
            )
            series_rep = validate_observations(
                observations.join(F.broadcast(freq), "distribution_id", "left")
            ).cache()
            # Every routed ts-distribution must appear in the report —
            # one that yielded no observations at all is an ERROR (the
            # reference's per-distribution try/except would have caught
            # the processor failure, V7 ``base.py:198-207``).
            dist_status = ts_dists.select(
                "catalog_id", "dataset_id", "distribution_id"
            ).join(
                distribution_statuses(series_rep),
                ["catalog_id", "dataset_id", "distribution_id"],
                "left",
            ).withColumn(
                "distribution_status",
                F.coalesce(F.col("distribution_status"), F.lit("ERROR")),
            )

            # V6 trim warnings demote OK → WARNING.
            if table_ends is not None:
                trims = trim_warnings(table_ends).select(
                    "distribution_id", F.lit(True).alias("_trimmed")
                )
                dist_status = dist_status.join(trims, "distribution_id", "left").withColumn(
                    "distribution_status",
                    F.when(
                        (F.col("distribution_status") == "OK")
                        & F.col("_trimmed").isNotNull(),
                        "WARNING",
                    ).otherwise(F.col("distribution_status")),
                ).drop("_trimmed")

            # V5 header failures are ERROR rows regardless of data checks.
            if header_errors is not None:
                hdr = header_errors.select(
                    "distribution_id", F.lit(True).alias("_hdr_bad")
                ).distinct()
                dist_status = dist_status.join(hdr, "distribution_id", "left").withColumn(
                    "distribution_status",
                    F.when(F.col("_hdr_bad").isNotNull(), "ERROR").otherwise(
                        F.col("distribution_status")
                    ),
                ).drop("_hdr_bad")

            dist_report = sort_reports_by_status(
                dist_status.select(
                    F.col("dataset_id").alias("dataset_identifier"),
                    F.col("distribution_id").alias("distribution_identifier"),
                    "distribution_status",
                )
            ).cache()
            indicators = catalog_indicators(ds_report, dist_report)

            # K1: all wide CSVs in ONE Spark job (partitionBy text write +
            # filesystem rename pass) — job count is independent of the
            # distribution count; the fileName mapping is the only
            # driver-side metadata (``base.py:266-279`` contract).
            if write_csvs:
                meta = {
                    (r.catalog_id, r.dataset_id, r.distribution_id): r.fileName
                    for r in _collect_routing(
                        ts_dists.select(
                            "catalog_id",
                            "dataset_id",
                            "distribution_id",
                            "fileName",
                        ),
                        "wide-CSV fileName",
                    )
                }
                written.extend(
                    write_wide_csvs_bulk(
                        observations,
                        frames["fields"],
                        self.output_dir,
                        meta,
                        replace=self.replace,
                    )
                )

        # K7/K8: publishable metadata.
        frames["distributions_published"], frames["fields_published"] = (
            scrub_scraping_metadata(
                rewrite_download_urls(
                    frames["distributions"], self.output_dir, self.host
                ),
                frames["fields"],
            )
        )

        # K2/K3: rewrite data.json + catalog.xlsx next to the outputs
        # (base.py:489-504 writes both after filtering).
        if write_csvs:
            from series_tiempo_ar_scraping_spark.sinks.metadata import (
                write_json_catalog,
                write_xlsx_catalog,
            )

            cat_dir = os.path.join(self.output_dir, "catalog", self.catalog_id)
            written.append(
                write_json_catalog(frames, os.path.join(cat_dir, "data.json"))
            )
            written.append(
                write_xlsx_catalog(
                    frames, os.path.join(cat_dir, "catalog.xlsx")
                )
            )

        return PipelineResult(
            frames=frames,
            metadata_errors=meta_errors,
            observations=observations,
            series_report=series_rep,
            distribution_report=dist_report,
            dataset_report=ds_report,
            indicators=indicators,
            written_files=written,
            processor_errors=processor_errors,
        )
