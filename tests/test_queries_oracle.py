"""End-to-end mirror of the driver's correctness gate at sf0.001.

Every catalog query with an oracle must hash-match DuckDB; oracle-less
queries must at least run and return a stable schema.
"""

from __future__ import annotations

import pytest

from series_tiempo_ar_scraping_spark.queries import ORACLES, QUERIES
from series_tiempo_ar_scraping_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, sf_dir, name)
    if res["match"] is None:
        # No oracle — the weaker check must still carry signal: the
        # query returns ROWS (>= 0 is a tautology) with its PINNED
        # schema. Every justified oracle-less query needs an entry here.
        assert name not in ORACLES
        expected_schema = {
            "approx_sketch_stats": [
                "approx_users", "event_type", "p50_approx", "p99_approx",
            ],
        }
        assert name in expected_schema, (
            f"oracle-less query {name} has no pinned schema — add it"
        )
        df = QUERIES[name](spark, sf_dir)
        assert sorted(df.columns) == expected_schema[name]
        assert res["rows"] > 0, "oracle-less query returned no rows"
    else:
        assert res["match"], res


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
