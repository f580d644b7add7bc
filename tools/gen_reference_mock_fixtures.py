#!/usr/bin/env python3
"""Generate the reference-mock e2e fixture set (committed; rerun only to
regenerate).

The reference's own mock catalog (``tests/project/mock/test1.json``,
2 datasets / 3 distributions) declares its sources as remote URLs that do
not exist in this environment, so the golden e2e synthesizes them FROM
THE DECLARED METADATA: the scraped workbook gets cells at exactly the
coordinates the catalog declares (header ids at ``scrapingIdentifierCell``,
data at ``scrapingDataStartCell`` down), and the direct-download CSV gets
the declared field titles as headers. Values are a deterministic formula
of (row, column) so the GOLDEN wide CSVs — the ``base.py:266-279``
contract: ``indice_tiempo`` label, columns in field declaration order —
are derived here independently of the engine (same formula, but through
the contract spec, not through any engine code).
"""

from __future__ import annotations

import json
import os

REF_CATALOG = "/root/reference/tests/project/mock/test1.json"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "reference_mock")

SHEET = "1.2 OyD real s.e."


def a1(cell: str) -> tuple[int, int]:
    """'B8' -> (row=8, col=2)."""
    import re

    m = re.match(r"([A-Z]+)([0-9]+)$", cell)
    col = 0
    for ch in m.group(1):
        col = col * 26 + ord(ch) - 64
    return int(m.group(2)), col


def annual_dates(n):
    return [f"{1993 + i}-01-01" for i in range(n)]


def quarterly_dates(start_year, n):
    out = []
    y, m = start_year, 1
    for _ in range(n):
        out.append(f"{y}-{m:02d}-01")
        m += 3
        if m > 12:
            m, y = 1, y + 1
    return out


# value = base + 10*row + col + frac — deterministic, exact in float
def val(base, frac, i, j):
    return base + 10 * i + j + frac


def fmt(x):
    # matches JVM Double.toString for these magnitudes/fractions
    return repr(x)


def main() -> None:
    cat = json.load(open(REF_CATALOG))
    dists = {
        d["identifier"]: d
        for ds in cat["dataset"]
        for d in ds["distribution"]
    }
    os.makedirs(os.path.join(OUT, "golden"), exist_ok=True)

    # ---- scraped workbook (distributions 1.1 annual, 1.2 quarterly):
    # a REAL .xlsx via the engine's stdlib OOXML writer, cells at exactly
    # the coordinates test1.json declares — the e2e then exercises the
    # production S8 OOXML parse path, not the jsonl fixture shortcut.
    grid: dict[tuple[int, int], object] = {}

    def block(dist_id, dates, base, frac):
        # every coordinate comes from the DECLARED metadata — header ids
        # at each field's scrapingIdentifierCell, data at its
        # scrapingDataStartCell downward. No hardcoded rows/columns: a
        # regenerated reference catalog with shifted cells regenerates a
        # workbook that still honors its own declarations.
        fields = dists[dist_id]["field"]
        time_f = next(
            f for f in fields if f.get("specialType") == "time_index"
        )
        value_fields = [
            f for f in fields if f.get("specialType") != "time_index"
        ]
        for f in fields:
            hr, hc = a1(f["scrapingIdentifierCell"])
            grid[(hr, hc)] = f["id"]
        tr, tc = a1(time_f["scrapingDataStartCell"])
        lines = ["indice_tiempo," + ",".join(f["title"] for f in value_fields)]
        for i, d in enumerate(dates):
            grid[(tr + i, tc)] = d
            row_vals = []
            for j, f in enumerate(value_fields):
                vr, vc = a1(f["scrapingDataStartCell"])
                v = val(base, frac, i, j)
                grid[(vr + i, vc)] = v
                row_vals.append(fmt(v))
            lines.append(d + "," + ",".join(row_vals))
        golden = os.path.join(OUT, "golden", dists[dist_id]["fileName"])
        with open(golden, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    block("1.1", annual_dates(5), 100, 0.5)
    block("1.2", quarterly_dates(1993, 8), 200, 0.25)

    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from series_tiempo_ar_scraping_spark.sources.xlsx import write_xlsx

    max_row = max(r for r, _c in grid)
    max_col = max(c for _r, c in grid)  # derived, never hardcoded
    # write_xlsx emits the `columns` tuple as row 1; pass it empty and
    # offset the data matrix so absolute coordinates line up.
    matrix = [
        tuple(grid.get((r, c)) for c in range(1, max_col + 1))
        for r in range(2, max_row + 1)
    ]
    write_xlsx(
        os.path.join(OUT, "actividad_ied.xlsx"), {SHEET: ([], matrix)}
    )

    # ---- direct-download CSV (distribution 200.1)
    fields = dists["200.1"]["field"]
    value_fields = [f for f in fields if f.get("specialType") != "time_index"]
    titles = [f["title"] for f in value_fields]
    src_lines = ["indice_tiempo," + ",".join(titles)]
    gold_lines = ["indice_tiempo," + ",".join(titles)]
    for i, d in enumerate(quarterly_dates(1970, 4)):
        vals = [fmt(val(300, 0.75, i, j)) for j in range(len(titles))]
        src_lines.append(d + "," + ",".join(vals))
        gold_lines.append(d + "," + ",".join(vals))
    with open(os.path.join(OUT, dists["200.1"]["fileName"]), "w") as fh:
        fh.write("\n".join(src_lines) + "\n")
    with open(os.path.join(OUT, "golden", dists["200.1"]["fileName"]), "w") as fh:
        fh.write("\n".join(gold_lines) + "\n")
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
