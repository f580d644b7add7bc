#!/usr/bin/env python3
"""Regenerate QUERIES.md from the query registry (docstring summaries)."""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from series_tiempo_ar_scraping_spark import queries as Q  # noqa: E402


def main() -> None:
    Q.apply_driver_gate_order()
    lines = [
        "# QUERIES — the %d-entry catalog" % len(Q.QUERIES),
        "",
        "Generated from the registry (`python tools/gen_queries_md.py` regenerates).",
        "Order = driver-gate order: the FIRST 50 rows are the driver's hash-checked",
        "correctness gate; every row also runs in the local mirror",
        "(`tools/check_queries.py`). ✓ = DuckDB oracle registered.",
        "",
        "| # | Query | Oracle | Module | Summary |",
        "|---|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(Q.QUERIES.items(), 1):
        doc = (inspect.getdoc(fn) or "").split("\n\n")[0]
        doc = doc.replace("\n", " ").replace("|", "\\|")
        if len(doc) > 160:
            doc = doc[:157] + "..."
        mod = fn.__module__.rsplit(".", 1)[-1]
        oracle = "✓" if name in Q.ORACLES else "rows-only"
        lines.append(f"| {i} | `{name}` | {oracle} | `{mod}` | {doc} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {len(Q.QUERIES)} rows to {out}")


if __name__ == "__main__":
    main()
