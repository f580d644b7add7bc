"""EP1 CLI — parity with the reference's ``etl`` console script
(``main.py:40-73``): run the full pipeline over an ``index.yaml`` of
catalogs with the same flag surface.

S9 config readers are here too (``main.py:15-20``, ``base.py:1098-1109``):
YAML index + general config, plain dicts on the driver.
"""

from __future__ import annotations

import json
import logging
import os

import click

from series_tiempo_ar_scraping_spark.session import get_spark


def read_config(path: str) -> dict:
    """S9 — YAML config reader (``main.py:15-20``)."""
    import yaml

    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def run_etl(
    index: dict,
    output_dir: str,
    spark=None,
    replace: bool = True,
    catalog_id_filter: str | None = None,
    distribution_id_filter: str | None = None,
    metadata_only: bool = False,
    host: str = "http://localhost",
    file_resolver=None,
    interactive: bool = False,
    download_config: dict | None = None,
    max_parallel_catalogs: int = 1,
    email_config: dict | None = None,
    environment: str = "dev",
    email_dry_run: bool = True,
) -> dict:
    """Run every catalog in the index; returns per-catalog summaries.

    ``index`` shape (reference ``index.yaml``): {catalog_id: {metadata_url|
    metadata_path, formato}}. Catalogs process independently — the natural
    fleet-scale unit (the reference loops them sequentially,
    ``base.py:1111-1116``)."""
    from series_tiempo_ar_scraping_spark.plans.pipeline import CatalogPipeline
    from series_tiempo_ar_scraping_spark.sources.landing import download_to_file

    spark = spark or get_spark("etl")
    # interactive (reference --interactive, base.py:922-925): reuse any
    # already-landed file instead of re-downloading — the dev-iteration
    # mode, orthogonal to output `replace` (V8). download_config carries
    # proxies/verify/tries (reference download.py:13-50, base.py:963-976).
    dl_kw = dict(download_config or {})
    dl_replace = replace and not interactive
    if file_resolver is None:
        # Default resolver: remote source refs land under output/landing
        # (S2/S3); a failed download routes to the error channel (V7) by
        # resolving to None — the pipeline reports the distribution as
        # ERROR instead of crashing.
        def file_resolver(ref: str):
            if not ref.startswith(("http://", "https://")):
                return ref
            # landing path is namespaced by a hash of the FULL url, not
            # just its basename: two distributions whose urls share a
            # basename (data.csv on different hosts — common on portals)
            # must not overwrite each other's downloads (and concurrent
            # catalogs share this landing dir).
            import hashlib

            bucket = hashlib.md5(ref.encode()).hexdigest()[:12]
            local = os.path.join(
                output_dir, "landing", "files", bucket,
                ref.rsplit("/", 1)[-1],
            )
            try:
                return download_to_file(
                    ref, local, replace=dl_replace, **dl_kw
                )
            except Exception:  # noqa: BLE001 — error channel, not crash
                return None

    def process_catalog(catalog_id: str, cfg: dict) -> dict:
        path = cfg.get("metadata_path")
        if not path and cfg.get("metadata_url"):
            landing = os.path.join(output_dir, "landing", f"{catalog_id}.json")
            path = download_to_file(
                cfg["metadata_url"], landing, replace=dl_replace, **dl_kw
            )
        pipe = CatalogPipeline(
            spark,
            catalog_path=path,
            catalog_id=catalog_id,
            output_dir=output_dir,
            file_resolver=file_resolver,
            host=host,
            distribution_id_filter=distribution_id_filter,
            replace=replace,
        )
        if metadata_only:
            frames = pipe.plan()
            return {
                "datasets": frames["datasets"].count(),
                "distributions": frames["distributions"].count(),
            }
        res = pipe.run(write_csvs=True)
        ind = res.indicators.collect()[0].asDict() if res.indicators is not None else {}
        # K4/K5 — per-catalog report workbooks next to the outputs
        # (reporte-datasets / reporte-distributions, base.py:679-703)
        from series_tiempo_ar_scraping_spark.sinks.reports import (
            write_report_xlsx,
        )

        report_dir = os.path.join(output_dir, "reports", catalog_id)
        # K5 — metadata validation errors export (the reference's
        # validate_catalog(only_errors, export_path), base.py:434-441).
        # Collected exactly once: the same rows feed the xlsx export and
        # the validation-email error count (small by V1-V3 contract —
        # one row per metadata rule violation).
        from series_tiempo_ar_scraping_spark.sources.xlsx import write_xlsx

        meta_err_cols = res.metadata_errors.columns
        meta_err_rows = [tuple(r) for r in res.metadata_errors.collect()]
        # keyed by workbook name (the STAGE_ATTACHMENTS manifest
        # vocabulary), not list position — consumers must never depend
        # on append order (ADVICE r8)
        report_files = {
            "reporte-datasets": write_report_xlsx(
                res.dataset_report, report_dir, "reporte-datasets"
            ),
            "reporte-errores-metadata": write_xlsx(
                os.path.join(report_dir, "reporte-errores-metadata.xlsx"),
                {"reporte-errores-metadata": (meta_err_cols, meta_err_rows)},
            ),
        }
        if res.distribution_report is not None:
            report_files["reporte-distributions"] = write_report_xlsx(
                res.distribution_report, report_dir, "reporte-distributions"
            )
        # EP1 — declarative data contracts over the run's OWN produced
        # frames (operators/expectations.py): scraped observations must
        # carry routing ids + a time index, the dataset-status enum
        # stays closed. Violations export through the same K4 channel
        # as the other report workbooks and ride the stage emails;
        # collected once (<= |contracts| rows) for both the export and
        # the summary count.
        from series_tiempo_ar_scraping_spark.operators.expectations import (
            pipeline_contract_report,
        )

        contracts = pipeline_contract_report(
            res.observations, res.dataset_report
        )
        contract_violations = 0
        if contracts is not None:
            c_cols = contracts.columns
            c_rows = [tuple(r) for r in contracts.collect()]
            contract_violations = sum(
                r[c_cols.index("n_violations")] for r in c_rows
            )
            report_files["reporte-expectations"] = write_xlsx(
                os.path.join(report_dir, "reporte-expectations.xlsx"),
                {"reporte-expectations": (c_cols, c_rows)},
            )
        return {
            "indicators": ind,
            "written": len(res.written_files),
            "reports": report_files,
            "metadata_error_count": len(meta_err_rows),
            "contract_violations": contract_violations,
        }

    entries = [
        (catalog_id, cfg)
        for catalog_id, cfg in index.items()
        # config entries living beside flat catalog indexes; F4 filter
        # applied before any download (base.py:1088-1090)
        if catalog_id != "download_config"
        and isinstance(cfg, dict)
        and not (catalog_id_filter and catalog_id != catalog_id_filter)
    ]
    results: dict = {}
    if max_parallel_catalogs > 1 and len(entries) > 1:
        # Catalogs are independent (own output subtrees, own landing
        # files) and a SparkSession schedules jobs from many threads
        # concurrently — the reference's sequential `for child in
        # self.childs` (base.py:1111-1116) becomes a thread pool. Driver
        # threads only orchestrate; the cluster interleaves the jobs.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_parallel_catalogs) as ex:
            futures = {
                cid: ex.submit(process_catalog, cid, cfg)
                for cid, cfg in entries
            }
        for cid, fut in futures.items():
            try:
                results[cid] = fut.result()
            except Exception as exc:  # noqa: BLE001 — V7: isolate catalogs
                results[cid] = {"error": repr(exc)}
    else:
        for cid, cfg in entries:
            try:
                results[cid] = process_catalog(cid, cfg)
            except Exception as exc:  # noqa: BLE001 — V7: isolate catalogs
                results[cid] = {"error": repr(exc)}

    # K6 — per-catalog stage emails (reference base.py:1058-1066 sends
    # validation mail after extraction of every catalog, base.py:1121-1130
    # scraping mail after scraping of every catalog; this engine's
    # pipeline runs both phases inside process_catalog, so the two stage
    # batches go out after the catalog loop, preserving the reference's
    # ordering: all 'extraccion' mails, then all 'scraping' mails).
    # Skip-with-warning semantics live in send_group_email; a catalog
    # that failed or ran metadata-only sends nothing.
    if email_config is not None:
        from series_tiempo_ar_scraping_spark.sinks.reports import (
            build_message,
            build_validation_message,
            send_group_email,
        )

        for stage, body in (
            ("extraccion",
             lambda cid, r: build_validation_message(
                 cid, r.get("metadata_error_count", 0))),
            ("scraping",
             lambda cid, r: build_message(r.get("indicators", {}))),
        ):
            for cid, r in results.items():
                if "reports" not in r:
                    continue
                # One bad SMTP endpoint must not discard the run's
                # results: the reference logs and continues on any send
                # error (base.py:738-743). Skip paths return None inside
                # send_group_email; network/protocol errors land here.
                try:
                    mail = send_group_email(
                        cid,
                        stage,
                        email_config,
                        body(cid, r),
                        list(r["reports"].values()),
                        environment=environment,
                        dry_run=email_dry_run,
                    )
                except Exception as exc:  # noqa: BLE001 — V7 error channel
                    logging.getLogger(__name__).warning(
                        "email send failed for catalog %s stage %s: %r",
                        cid, stage, exc,
                    )
                    r.setdefault("email_errors", []).append(repr(exc))
                    continue
                if mail is not None:
                    r.setdefault("emails", []).append(
                        dict(mail, stage=stage)
                    )
    return results


def run_custom_steps(output_dir: str, script_path: str,
                     extra_env: dict | None = None) -> int:
    """K9 — post-ETL user hook: run a shell script over the output dir
    (``Makefile:14-15``, ``config/custom_steps.example.sh`` — e.g. rsync
    outputs to a webroot). Driver-side by design; returns the exit code."""
    import subprocess

    env = dict(os.environ, OUTPUT_DIR=os.path.abspath(output_dir))
    env.update(extra_env or {})
    proc = subprocess.run(
        ["bash", script_path], env=env, capture_output=True, text=True
    )
    return proc.returncode


@click.command()
@click.option("--config", "config_path", required=True, help="index.yaml path")
@click.option("--output-dir", default="output", help="output root")
@click.option("--replace/--no-replace", default=True,
              help="overwrite existing distribution CSVs (V8)")
@click.option("--catalog-id-filter", default=None)
@click.option("--distribution-id-filter", default=None)
@click.option("--metadata-only", is_flag=True, default=False,
              help="EP2: extract+validate metadata, skip data")
@click.option("--custom-steps", "custom_steps", default=None,
              help="K9: shell script to run over the output dir after ETL")
@click.option("--interactive/--no-interactive", default=False,
              help="reuse already-landed source files instead of "
                   "re-downloading (reference --interactive)")
@click.option("--parallel-catalogs", default=1, type=int,
              help="process up to N catalogs concurrently (independent "
                   "units; Spark interleaves their jobs)")
@click.option("--email-config", "email_config_path", default=None,
              help="K6: config_email.yaml path (mailer + per-catalog "
                   "destinatarios per stage); omit to skip emails")
@click.option("--environment", default="dev",
              help="environment tag for email subjects (X9; 'prod' "
                   "drops the tag)")
@click.option("--send-emails", is_flag=True, default=False,
              help="actually send K6 emails over SMTP (default composes "
                   "them dry-run into the result JSON)")
@click.option("--log-level", default="WARN")
def cli(config_path, output_dir, replace, catalog_id_filter,
        distribution_id_filter, metadata_only, custom_steps, interactive,
        parallel_catalogs, email_config_path, environment, send_emails,
        log_level):
    """Run the catalog ETL (reference ``etl`` entry point)."""
    spark = get_spark("etl-cli")
    spark.sparkContext.setLogLevel(log_level)
    index = read_config(config_path)
    # Relative metadata paths resolve against the index file, not the cwd.
    base = os.path.dirname(os.path.abspath(config_path))
    for cfg in (index.get("catalogs", index)).values():
        if not isinstance(cfg, dict):
            continue  # null/scalar index entries tolerated, as in run_etl
        p = cfg.get("metadata_path")
        if p and not os.path.isabs(p):
            cfg["metadata_path"] = os.path.join(base, p)
    results = run_etl(
        index.get("catalogs", index),
        output_dir,
        spark=spark,
        replace=replace,
        catalog_id_filter=catalog_id_filter,
        distribution_id_filter=distribution_id_filter,
        metadata_only=metadata_only,
        interactive=interactive,
        download_config=index.get("download_config"),
        max_parallel_catalogs=parallel_catalogs,
        email_config=(
            read_config(email_config_path) if email_config_path else None
        ),
        environment=environment,
        email_dry_run=not send_emails,
    )
    if custom_steps:
        results["_custom_steps_exit"] = run_custom_steps(
            output_dir, custom_steps
        )
    click.echo(json.dumps(results, default=str))


if __name__ == "__main__":
    cli()
