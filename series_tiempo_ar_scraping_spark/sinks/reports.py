"""K4/K5/K6 — report writers and notification composition.

The reference writes XLSX reports (``base.py:679-703``) and sends SMTP
mail with attachments (``base.py:707-743``); subjects/messages are built
at ``base.py:836-871``. Here: report frames write as CSV (XLSX needs
openpyxl — import-gated), mail composition is pure functions over the
indicator rows, and the SMTP send is a driver-side callable that defaults
to dry-run (no network in the data plane).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame


def write_report_csv(report: DataFrame, out_dir: str, name: str) -> str:
    """K4 — small report frame → one CSV file (reports are inherently
    small: one row per dataset/distribution)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.csv")
    pdf = report.toPandas()
    pdf.to_csv(path, index=False)
    return path


def write_report_xlsx(report: DataFrame, out_dir: str, name: str) -> str:
    """K4 XLSX variant — parity with ``reporte-datasets.xlsx`` /
    ``reporte-distributions.xlsx`` (``base.py:679-703``), via the stdlib
    OOXML writer (``sources/xlsx.py``)."""
    from series_tiempo_ar_scraping_spark.sources.xlsx import write_xlsx_frames

    path = os.path.join(out_dir, f"{name}.xlsx")
    return write_xlsx_frames(path, {name: report})


def build_subject(catalog_id: str, stage: str, environment: str,
                  now: _dt.datetime | None = None) -> str:
    """X7/X9 — '[env] catalog - stage: DD/MM/YYYY HH:mm' with the env tag
    dropped on prod (``base.py:863-871``)."""
    now = now or _dt.datetime.now()
    stamp = now.strftime("%d/%m/%Y %H:%M")
    # exact match: a substring test would strip the tag from 'preprod'
    # and make its mail indistinguishable from production mail
    prefix = "" if environment == "prod" else f"[{environment}] "
    return f"{prefix}{catalog_id} - {stage}: {stamp}"


def build_message(indicators: dict) -> str:
    """Indicator summary body (``base.py:836-861`` message shape)."""
    lines = [f"{k}: {v}" for k, v in indicators.items()]
    return "\n".join(lines)


def send_email(subject: str, message: str, recipients: list[str],
               attachments: list[str] | None = None,
               smtp_config: dict | None = None, dry_run: bool = True) -> dict:
    """K6 — SMTP send (``base.py:707-743``). ``dry_run`` (default) returns
    the composed mail instead of touching the network; real send uses
    stdlib smtplib with SSL/STARTTLS per config."""
    mail = {
        "subject": subject,
        "message": message,
        "recipients": recipients,
        "attachments": attachments or [],
    }
    if dry_run or not smtp_config:
        return mail
    import smtplib  # pragma: no cover - needs a live SMTP endpoint
    from email.mime.application import MIMEApplication
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    msg = MIMEMultipart()  # pragma: no cover
    msg["Subject"] = subject
    msg["From"] = smtp_config.get("from", "etl@localhost")
    msg["To"] = ", ".join(recipients)
    msg.attach(MIMEText(message))
    for path in attachments or []:  # the reference attaches the reports
        with open(path, "rb") as fh:  # (base.py:707-743)
            part = MIMEApplication(fh.read())
        part.add_header(
            "Content-Disposition",
            "attachment",
            filename=os.path.basename(path),
        )
        msg.attach(part)
    host, port = smtp_config["host"], int(smtp_config.get("port", 465))
    cls = smtplib.SMTP_SSL if smtp_config.get("ssl", True) else smtplib.SMTP
    with cls(host, port) as server:
        if not smtp_config.get("ssl", True):
            server.starttls()
        if smtp_config.get("user"):
            server.login(smtp_config["user"], smtp_config["password"])
        server.sendmail(smtp_config.get("from", "etl@localhost"), recipients, msg.as_string())
    return mail  # pragma: no cover
