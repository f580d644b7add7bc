"""Import-order robustness: every query submodule must be importable
FIRST in a fresh interpreter.

The registry modules form a deliberate cycle (submodules register into
``queries``' dicts; ``queries`` imports them all at the bottom), which
makes import order a real hazard: round 2 shipped an import-time assert
that killed collection of three test files, and a batch-6 fragment
import briefly reintroduced the failure. Each case here is a
subprocess, so one broken entry point can't mask the others.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

MODULES = [
    "queries",
    "queries_llm",
    "queries_ext",
    "queries_batch4",
    "queries_batch5",
    "queries_batch6",
    "queries_batch7",
    "queries_batch8",
    "queries_batch9",
    "queries_batch10",
    "queries_batch11",
    "queries_batch12",
    "queries_batch13",
    "queries_batch14",
    "queries_batch15",
    "queries_batch16",
    "queries_batch17",
    "queries_batch18",
    "queries_batch19",
    "queries_batch20",
    "queries_batch21",
    "queries_batch22",
    "queries_batch23",
    "queries_batch24",
    "queries_batch25",
    "queries_batch26",
    "queries_batch27",
    "queries_batch28",
    "queries_batch29",
    "queries_batch30",
    "queries_batch31",
    "queries_batch32",
    "queries_batch33",
]


@pytest.mark.parametrize("mod", MODULES)
def test_submodule_imports_first(mod):
    code = (
        f"import series_tiempo_ar_scraping_spark.{mod} as m; "
        "from series_tiempo_ar_scraping_spark.queries import QUERIES; "
        "assert len(QUERIES) >= 100, len(QUERIES)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0, (
        f"importing {mod} first failed:\n{proc.stderr[-2000:]}"
    )
