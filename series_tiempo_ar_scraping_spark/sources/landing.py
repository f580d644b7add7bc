"""S1-S3 — driver-side ingestion to a landing zone.

Downloads are control-plane work in this engine (the reference does them
inline in the object tree: ``download.py:13-76``, ``base.py:917-976``); the
data plane starts at the landing path. Retry/backoff and skip-if-exists
(V8) semantics match the reference; TLS verification defaults ON (the
reference hard-codes it off at ``download.py:33`` — that is a bug we do
not reproduce).

At fleet scale (millions of URLs) ``download_many`` flips to an
executor-side ``foreachPartition`` over a URL frame — same function, same
semantics, driver orchestrates only.
"""

from __future__ import annotations

import os
import time

DEFAULT_TRIES = 3
RETRY_DELAY = 1.0


def download(url: str, tries: int = DEFAULT_TRIES, retry_delay: float = RETRY_DELAY,
             timeout: float = 30.0, verify: bool = True,
             proxies: dict | None = None) -> bytes:
    """S1 — GET with retries (``download.py:13-50``).

    ``proxies`` follows the reference's contract (``download.py:24-27``):
    a dict with ``http``/``https`` keys mapping to proxy URLs, forwarded
    verbatim to the HTTP client — government data networks commonly
    require an egress proxy."""
    import requests

    last: Exception | None = None
    for attempt in range(tries):
        try:
            resp = requests.get(
                url, timeout=timeout, verify=verify, proxies=proxies
            )
            resp.raise_for_status()
            return resp.content
        except Exception as exc:  # noqa: BLE001 — error-channel, not crash
            last = exc
            if attempt + 1 < tries:
                time.sleep(retry_delay)
    raise RuntimeError(f"download failed after {tries} tries: {url}") from last


def download_to_file(url: str, file_path: str, replace: bool = True, **kw) -> str:
    """S2/S3 + V8 — download to landing path; skip when present and
    ``replace`` is False (``base.py:155-163,922-925``)."""
    if os.path.exists(file_path) and not replace:
        return file_path
    # abspath first: dirname of a bare filename is '' and makedirs('')
    # raises — same pattern as the xlsx writer
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    data = download(url, **kw)
    tmp = file_path + ".part"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, file_path)
    return file_path


def merge_download_config(defaults: dict, per_catalog: dict | None) -> dict:
    """J5 — per-catalog download config over defaults (``base.py:963-976``)."""
    out = dict(defaults)
    out.update(per_catalog or {})
    return out
