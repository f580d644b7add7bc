"""Property-based twin-equivalence checks (r11).

Two places where a Python function and a SQL fragment must compute the
SAME value at any input, or an oracle silently diverges from its Spark
query at some scale:

- `operators.similarity.adaptive_codebook_k` (Python, drives the Spark
  default) vs `sqlfrags._adaptive_k_sql` (DuckDB dynamic-LIMIT scalar
  subquery, drives the oracle) — the K ∝ n codebook rule.
- `streaming.stateful._duration_seconds` vs what Spark's interval
  parser accepts for `withWatermark` — pinned here for the shapes the
  engine uses.

No Spark session: the Python side of adaptive_codebook_k only calls
.count(), faked with a stub; the SQL side runs in-process DuckDB.
"""

from __future__ import annotations

import math

import duckdb
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from series_tiempo_ar_scraping_spark.sqlfrags import _adaptive_k_sql
from series_tiempo_ar_scraping_spark.streaming.stateful import (
    _duration_seconds,
)


class _FakeDF:
    def __init__(self, n: int):
        self._n = n

    def count(self) -> int:
        return self._n


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=5_000_000),
    st.integers(min_value=1, max_value=10_000),
    st.integers(min_value=1, max_value=64),
)
def test_adaptive_k_python_sql_twins_agree(n, target, floor):
    from series_tiempo_ar_scraping_spark.operators.similarity import (
        adaptive_codebook_k,
    )

    py = adaptive_codebook_k(_FakeDF(n), target_cell=target, floor=floor)
    sql = _adaptive_k_sql("src", target_cell=target, floor=floor)
    (got,) = duckdb.sql(
        f"WITH src AS (SELECT * FROM range({n})) {sql}"
    ).fetchone()
    assert got == py == max(floor, math.ceil(n / target))


def test_adaptive_k_sql_works_as_dynamic_limit():
    """The fragment's actual deployment shape: a scalar subquery inside
    LIMIT, referencing an earlier CTE — the exact composition the
    kmeans oracles use."""
    sql = _adaptive_k_sql("src", target_cell=10, floor=3)
    rows = duckdb.sql(
        "WITH src AS (SELECT range AS vid FROM range(47)) "
        f"SELECT vid FROM src ORDER BY vid LIMIT ({sql})"
    ).fetchall()
    assert len(rows) == max(3, math.ceil(47 / 10)) == 5


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=10_000),
    st.sampled_from(
        ["second", "minute", "hour", "day", "week", "millisecond"]
    ),
    st.booleans(),
)
def test_duration_parser_unit_arithmetic(n, unit, plural):
    scale = {
        "millisecond": 1e-3,
        "second": 1.0,
        "minute": 60.0,
        "hour": 3600.0,
        "day": 86400.0,
        "week": 604800.0,
    }[unit]
    s = f"{n} {unit}{'s' if plural else ''}"
    assert _duration_seconds(s) == pytest.approx(n * scale)
    # compound: "<n> <unit> 30 seconds" adds exactly 30
    assert _duration_seconds(s + " 30 seconds") == pytest.approx(
        n * scale + 30
    )
    # case-insensitive, whitespace-tolerant (what withWatermark takes)
    assert _duration_seconds("  " + s.upper() + " ") == pytest.approx(
        n * scale
    )
