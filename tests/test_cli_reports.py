"""CLI (EP1), reports/mail sinks (K4/K6), and V8 replace semantics."""

from __future__ import annotations

import datetime as dt
import os

from series_tiempo_ar_scraping_spark.main import read_config, run_etl
from series_tiempo_ar_scraping_spark.sinks.reports import (
    build_message,
    build_subject,
    send_email,
    write_report_csv,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _resolver(ref: str) -> str:
    return os.path.join(FIX, "files", ref.rsplit("/", 1)[-1])


def test_custom_steps_hook(tmp_path):
    from series_tiempo_ar_scraping_spark.main import run_custom_steps

    out = tmp_path / "out"
    out.mkdir()
    script = tmp_path / "steps.sh"
    script.write_text('echo "ran" > "$OUTPUT_DIR/marker.txt"\n')
    assert run_custom_steps(str(out), str(script)) == 0
    assert (out / "marker.txt").read_text().strip() == "ran"
    bad = tmp_path / "bad.sh"
    bad.write_text("exit 3\n")
    assert run_custom_steps(str(out), str(bad)) == 3


def test_run_etl_from_index(spark, tmp_path):
    index = read_config(os.path.join(FIX, "index.yaml"))["catalogs"]
    index["acme"]["metadata_path"] = os.path.join(FIX, "catalog.json")
    out = str(tmp_path / "out")
    results = run_etl(index, out, spark=spark, file_resolver=_resolver)
    assert results["acme"]["indicators"]["distributions"] == 4
    # 3 distribution CSVs + data.json + catalog.xlsx (K1 + K2/K3)
    assert results["acme"]["written"] == 5
    # K4/K5 report workbooks exist and read back via the stdlib parser
    from series_tiempo_ar_scraping_spark.sources.xlsx import read_sheets

    # reports are keyed by workbook name (never positional — ADVICE r8)
    assert sorted(results["acme"]["reports"]) == [
        "reporte-datasets",
        "reporte-distributions",
        "reporte-errores-metadata",
        "reporte-expectations",
    ]
    for path in results["acme"]["reports"].values():
        assert os.path.exists(path)
    dist_rep = read_sheets(
        results["acme"]["reports"]["reporte-distributions"]
    )
    assert len(dist_rep["reporte-distributions"]) == 4
    # EP1 — the data-contract suite ran inside the pipeline and
    # exported through the K4 channel; a clean fixture passes every
    # contract on both produced frames
    exp_rep = read_sheets(results["acme"]["reports"]["reporte-expectations"])
    rows = exp_rep["reporte-expectations"]
    assert results["acme"]["contract_violations"] == 0
    checked = {(r["table_name"], r["check"]) for r in rows}
    assert ("observations", "not_null") in checked
    assert ("dataset_report", "accepted_values") in checked
    assert all(str(r["n_violations"]) == "0" for r in rows)
    assert os.path.exists(os.path.join(out, "catalog", "acme", "data.json"))
    assert os.path.exists(os.path.join(out, "catalog", "acme", "catalog.xlsx"))

    # V8: second run with replace=False rewrites no distribution CSVs;
    # metadata republishes every run (base.py:489-504 runs unconditionally)
    results2 = run_etl(
        index, out, spark=spark, file_resolver=_resolver, replace=False
    )
    assert results2["acme"]["written"] == 2

    # EP2 metadata-only path
    meta = run_etl(
        index, str(tmp_path / "meta"), spark=spark, metadata_only=True
    )
    assert meta["acme"] == {"datasets": 3, "distributions": 4}

    # F4 catalog filter skips everything else
    assert run_etl(index, out, spark=spark, catalog_id_filter="nope") == {}


def test_report_csv_and_mail(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", "OK"), ("d2", "ERROR")], "dataset_identifier string, dataset_status string"
    )
    path = write_report_csv(df, str(tmp_path), "reporte-datasets")
    assert open(path).readline().strip() == "dataset_identifier,dataset_status"

    # X7/X9 subject semantics: env tag unless prod
    at = dt.datetime(2024, 6, 30, 14, 5)
    assert (
        build_subject("acme", "scraping", "staging", at)
        == "[staging] acme - scraping: 30/06/2024 14:05"
    )
    assert build_subject("acme", "scraping", "prod", at).startswith("acme - ")

    mail = send_email(
        build_subject("acme", "extraccion", "dev", at),
        build_message({"datasets": 2, "datasets_ok": 2}),
        ["ops@acme.test"],
        attachments=[path],
        dry_run=True,
    )
    assert mail["recipients"] == ["ops@acme.test"]
    assert "datasets_ok: 2" in mail["message"]


def test_etl_stage_group_emails(spark, tmp_path):
    """K6 orchestration: a configured catalog gets TWO dry-run stage
    emails (extraccion, then scraping) with the stage's attachment
    manifest and env-tagged subjects (reference base.py:745-817 senders,
    invoked at base.py:1058-1066 and 1121-1130); an unconfigured catalog
    is skipped with a warning, not an error."""
    index = {
        "acme": {"metadata_path": os.path.join(FIX, "catalog.json")},
        "acme2": {"metadata_path": os.path.join(FIX, "catalog.json")},
    }
    email_config = {
        "mailer": {"host": "smtp.test", "port": 465, "ssl": True,
                   "user": "etl@test", "password": "x"},
        "extraccion": {"acme": {"destinatarios": ["val@acme.test"]}},
        "scraping": {
            "acme": {"destinatarios": ["ops@acme.test", "dba@acme.test"]},
            # configured but empty recipient list → skip-with-warning
            "acme2": {"destinatarios": []},
        },
    }
    results = run_etl(
        index, str(tmp_path / "out"), spark=spark, file_resolver=_resolver,
        email_config=email_config, environment="staging",
    )
    mails = results["acme"]["emails"]
    assert [m["stage"] for m in mails] == ["extraccion", "scraping"]
    val, scr = mails
    assert val["recipients"] == ["val@acme.test"]
    assert val["subject"].startswith("[staging] acme - Validación: ")
    # fixture catalog carries 3 deliberate metadata errors (the K5
    # errors-report fixtures) → validation body reports them
    assert "tiene errores (3)" in val["message"]
    assert sorted(os.path.basename(p) for p in val["attachments"]) == [
        "reporte-datasets.xlsx", "reporte-errores-metadata.xlsx",
    ]
    assert scr["recipients"] == ["ops@acme.test", "dba@acme.test"]
    assert scr["subject"].startswith("[staging] acme - Scraping: ")
    assert "distributions: 4" in scr["message"]
    assert sorted(os.path.basename(p) for p in scr["attachments"]) == [
        "reporte-datasets.xlsx", "reporte-distributions.xlsx",
        "reporte-expectations.xlsx",
    ]
    # acme2: no extraccion entry + empty scraping recipients → no mail,
    # but the catalog itself processed fine
    assert "emails" not in results["acme2"]
    assert results["acme2"]["written"] > 0


def test_send_email_reference_config_keys(tmp_path, monkeypatch):
    """Live-send accepts the reference config_email.yaml mailer spelling
    (smtp_server + user, no host/from — tests/project/config/
    config_email.yaml; base.py:710,731,738-739): endpoint resolves from
    smtp_server and the From/envelope sender falls back to user."""
    import smtplib

    sent = {}

    class FakeSMTP:
        def __init__(self, host, port):
            sent["host"], sent["port"] = host, port

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def login(self, user, password):
            sent["login"] = (user, password)

        def sendmail(self, sender, recipients, payload):
            sent["sender"] = sender
            sent["recipients"] = recipients
            sent["payload"] = payload

    monkeypatch.setattr(smtplib, "SMTP_SSL", FakeSMTP)
    att = tmp_path / "reporte-datasets.xlsx"
    att.write_bytes(b"xlsxbytes")
    send_email(
        "subj", "body", ["jane@example.com"], attachments=[str(att)],
        smtp_config={"user": "foo", "password": "bar",
                     "smtp_server": "smtp.example.com", "port": 587,
                     "ssl": True},
        dry_run=False,
    )
    assert sent["host"] == "smtp.example.com" and sent["port"] == 587
    assert sent["login"] == ("foo", "bar")
    assert sent["sender"] == "foo"  # From falls back to mailer user
    assert sent["recipients"] == ["jane@example.com"]
    assert "From: foo" in sent["payload"]


def test_etl_email_send_failure_isolated(spark, tmp_path, monkeypatch, caplog):
    """One failing SMTP send must not crash run_etl or discard the run's
    results (reference logs-and-continues, base.py:738-743): the error is
    recorded per catalog under email_errors and processing results stay."""
    import logging

    from series_tiempo_ar_scraping_spark.sinks import reports as reports_mod

    def boom(*a, **k):
        raise OSError("connection refused")

    monkeypatch.setattr(reports_mod, "send_group_email", boom)
    index = {"acme": {"metadata_path": os.path.join(FIX, "catalog.json")}}
    email_config = {
        "mailer": {"smtp_server": "smtp.test", "port": 587, "ssl": True,
                   "user": "etl@test", "password": "x"},
        "extraccion": {"acme": {"destinatarios": ["val@acme.test"]}},
        "scraping": {"acme": {"destinatarios": ["ops@acme.test"]}},
    }
    with caplog.at_level(logging.WARNING):
        results = run_etl(
            index, str(tmp_path / "out"), spark=spark,
            file_resolver=_resolver, email_config=email_config,
        )
    r = results["acme"]
    assert r["written"] > 0  # pipeline results survived the SMTP failure
    assert "emails" not in r
    # both stage attempts recorded, neither escaped run_etl
    assert r["email_errors"] == [repr(OSError("connection refused"))] * 2
    assert any("email send failed" in rec.message for rec in caplog.records)


def test_send_group_email_skip_paths(tmp_path, caplog):
    """Skip-with-warning unit semantics (base.py:750-756,767-770), plus
    missing-attachment filtering (base.py:725-727)."""
    import logging

    from series_tiempo_ar_scraping_spark.sinks.reports import (
        send_group_email,
    )

    cfg = {"scraping": {"c1": {"destinatarios": ["a@b.test"]}}}
    with caplog.at_level(logging.WARNING):
        # unknown catalog → None + warning
        assert send_group_email("nope", "scraping", cfg, "m", []) is None
        # no config at all → None
        assert send_group_email("c1", "extraccion", cfg, "m", []) is None
        # known catalog, one existing + one vanished report: only the
        # existing file in the stage manifest is attached
        real = tmp_path / "reporte-datasets.xlsx"
        real.write_bytes(b"x")
        mail = send_group_email(
            "c1", "scraping", cfg, "m",
            [str(real), str(tmp_path / "reporte-distributions.xlsx"),
             str(tmp_path / "reporte-errores-metadata.xlsx")],
        )
    assert mail["attachments"] == [str(real)]
    assert any("skipping" in r.message for r in caplog.records)
    assert any("not attached" in r.message for r in caplog.records)


def test_download_interactive_and_proxies(tmp_path, monkeypatch):
    """--interactive reuses landed files (base.py:922-925); proxies flow
    from download_config to the HTTP client (download.py:24-27)."""
    from series_tiempo_ar_scraping_spark.sources import landing

    calls = []

    class FakeResp:
        content = b"remote-bytes"

        def raise_for_status(self):
            pass

    class FakeRequests:
        @staticmethod
        def get(url, timeout=None, verify=None, proxies=None):
            calls.append({"url": url, "proxies": proxies, "verify": verify})
            return FakeResp()

    monkeypatch.setitem(
        __import__("sys").modules, "requests", FakeRequests
    )

    target = str(tmp_path / "landed" / "f.csv")
    proxies = {"http": "http://proxy.test:3128", "https": "http://proxy.test:3128"}
    out = landing.download_to_file(
        "http://example.test/f.csv", target, replace=True, proxies=proxies
    )
    assert open(out, "rb").read() == b"remote-bytes"
    assert calls[-1]["proxies"] == proxies

    # interactive semantics = replace False: landed file short-circuits
    n = len(calls)
    landing.download_to_file(
        "http://example.test/f.csv", target, replace=False, proxies=proxies
    )
    assert len(calls) == n  # no new HTTP call


def test_parallel_catalogs(spark, tmp_path):
    """Two catalogs processed concurrently produce the same outputs as a
    sequential run: independent output subtrees, isolated failures."""
    import os

    from series_tiempo_ar_scraping_spark.main import run_etl

    fix = os.path.join(os.path.dirname(__file__), "fixtures")

    def resolver(ref):
        return os.path.join(fix, "files", ref.rsplit("/", 1)[-1])

    index = {
        "acme": {"metadata_path": os.path.join(fix, "catalog.json")},
        "acme2": {"metadata_path": os.path.join(fix, "catalog.json")},
    }
    out = str(tmp_path / "par")
    results = run_etl(
        index, out, spark=spark, file_resolver=resolver,
        max_parallel_catalogs=2,
    )
    assert set(results) == {"acme", "acme2"}
    for cid in ("acme", "acme2"):
        assert "error" not in results[cid], results[cid]
        assert results[cid]["written"] > 0
        assert os.path.isdir(os.path.join(out, "catalog", cid))
        assert os.path.isdir(os.path.join(out, "reports", cid))


def test_catalog_failure_is_isolated(spark, tmp_path):
    """A broken catalog records an error summary; the good one still
    completes (V7 at the catalog level — the reference aborts the run)."""
    import os

    from series_tiempo_ar_scraping_spark.main import run_etl

    fix = os.path.join(os.path.dirname(__file__), "fixtures")

    def resolver(ref):
        return os.path.join(fix, "files", ref.rsplit("/", 1)[-1])

    index = {
        "good": {"metadata_path": os.path.join(fix, "catalog.json")},
        "broken": {"metadata_path": str(tmp_path / "nope.json")},
    }
    results = run_etl(
        index, str(tmp_path / "out"), spark=spark, file_resolver=resolver
    )
    assert "error" in results["broken"]
    assert results["good"]["written"] > 0


# --- CLI flag parity vs the reference contract ------------------------------


def test_cli_flag_parity_with_reference():
    """The Click surface must stay a SUPERSET of the reference's six
    options (reference ``main.py:41-67``) with matching semantics:
    --replace defaults True, the two id filters default None, and
    --interactive is an on/off flag defaulting off. Pinned so a CLI
    refactor can't silently drop or re-default a reference option."""
    import click

    from series_tiempo_ar_scraping_spark.main import cli

    opts = {
        p.name: p
        for p in cli.params
        if isinstance(p, click.Option)
    }
    # the reference's exact option set (by Click parameter name)
    reference_contract = {
        "config_path": None,  # --config (required here; reference defaults
        #                       to its packaged config dir, which we don't
        #                       ship — an explicit path is the strict form)
        "log_level": None,
        "replace": True,
        "catalog_id_filter": None,
        "distribution_id_filter": None,
        "interactive": False,
    }
    missing = set(reference_contract) - set(opts)
    assert not missing, f"reference CLI options dropped: {missing}"
    assert opts["replace"].default is True  # reference main.py:53-56
    assert opts["catalog_id_filter"].default is None
    assert opts["distribution_id_filter"].default is None
    assert opts["interactive"].default is False
    assert opts["interactive"].is_flag or opts["interactive"].secondary_opts
    # declared flag spellings stay the reference's kebab-case forms
    spellings = {o for p in cli.params for o in p.opts}
    for flag in (
        "--config",
        "--log-level",
        "--replace",
        "--catalog-id-filter",
        "--distribution-id-filter",
        "--interactive",
    ):
        assert flag in spellings, flag
