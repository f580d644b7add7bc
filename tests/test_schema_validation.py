"""V1 schema-driven validation: every constraint declared in
``config/schemas/*.json`` must compile to a rule, and each rule must
actually fire on a violating row (negative fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.operators.schema_rules import (
    compile_rules,
    schema_constraint_inventory,
)
from series_tiempo_ar_scraping_spark.operators.validation import (
    apply_rules,
    catalog_rules,
    dataset_rules,
    distribution_rules,
)

ENTITY_COLUMNS = {
    "field": ["title", "type", "description"],
    "catalog": [
        "title", "description", "publisher_name", "publisher_mbox",
        "superThemeTaxonomy", "issued", "modified", "license", "homepage",
        "rights",
    ],
    "dataset": [
        "title", "description", "publisher_name", "publisher_mbox",
        "accrualPeriodicity", "issued", "modified", "temporal",
        "landingPage", "superTheme", "theme", "keyword",
    ],
    "distribution": [
        "title", "description", "fileName", "format", "downloadURL",
        "accessURL", "issued", "byteSize",
    ],
}


@pytest.mark.parametrize(
    "entity", ["catalog", "dataset", "distribution", "field"]
)
def test_every_schema_constraint_has_a_rule(spark, entity):
    """Walk the schema document: each required/format/pattern constraint
    on a materialized column must map to a compiled rule."""
    rules = compile_rules(entity, ENTITY_COLUMNS[entity])
    inventory = schema_constraint_inventory(entity)
    assert inventory, f"{entity} schema declares no constraints?"
    for col, kinds in inventory.items():
        if col not in ENTITY_COLUMNS[entity]:
            continue  # property the engine doesn't materialize
        for kind in kinds:
            assert f"{entity}_{col}_{kind}" in rules, (
                f"schema constraint {entity}.{col} [{kind}] has no rule"
            )


def test_rule_names_stable(spark):
    """Report consumers depend on these names (test_pipeline asserts
    dataset_accrualPeriodicity_format on the broken fixture)."""
    assert "dataset_accrualPeriodicity_format" in dataset_rules()
    assert "dataset_accrualPeriodicity_required" in dataset_rules()
    assert "catalog_publisher_mbox_format" in catalog_rules()
    assert "distribution_has_source_url" in distribution_rules()


def _fired(spark, df_spec, rules):
    df = spark.createDataFrame(*df_spec)
    errs = apply_rules(df, rules, ["rid"])
    return {r.rule for r in errs.collect()}


CATALOG_SCHEMA_STR = (
    "rid string, title string, description string, publisher_name string,"
    " publisher_mbox string, superThemeTaxonomy string, issued string,"
    " modified string, license string, homepage string, rights string"
)


def test_catalog_negative_fixtures(spark):
    bad = (
        [("x", "", "d", None, "not-an-email", "ftp:/bad", "13-01-2020",
          None, "", "nota url", None)],
        CATALOG_SCHEMA_STR,
    )
    fired = _fired(spark, bad, catalog_rules())
    assert "catalog_title_format" in fired  # minLength 1
    assert "catalog_publisher_name_required" in fired
    assert "catalog_publisher_mbox_format" in fired
    assert "catalog_superThemeTaxonomy_format" in fired
    assert "catalog_issued_format" in fired
    assert "catalog_license_format" in fired  # empty string, minLength 1
    assert "catalog_homepage_format" in fired


def test_catalog_positive_fixture(spark):
    good = (
        [("x", "Título", "desc", "ACME", "a@b.cl",
          "http://datos.gob.ar/superThemeTaxonomy.json", "2021-03-01",
          "2024-06-30T10:00:00Z", "CC-BY", "https://acme.test", "open")],
        CATALOG_SCHEMA_STR,
    )
    assert _fired(spark, good, catalog_rules()) == set()


DATASET_SCHEMA_STR = (
    "rid string, title string, description string, publisher_name string,"
    " publisher_mbox string, accrualPeriodicity string, issued string,"
    " modified string, temporal string, landingPage string,"
    " superTheme array<string>, theme array<string>, keyword array<string>"
)


def test_dataset_negative_fixtures(spark):
    bad = (
        [("x", None, "d", "ACME", "bad@", "weekly-ish", None, "soon",
          "2019-01-01..2020-01-01", "gopher:x", None, None, None)],
        DATASET_SCHEMA_STR,
    )
    fired = _fired(spark, bad, dataset_rules())
    assert "dataset_title_required" in fired
    assert "dataset_publisher_mbox_format" in fired
    assert "dataset_accrualPeriodicity_format" in fired
    assert "dataset_issued_required" in fired
    assert "dataset_modified_format" in fired
    assert "dataset_temporal_format" in fired
    assert "dataset_landingPage_format" in fired
    assert "dataset_superTheme_required" in fired


def test_dataset_accrual_pattern_vocabulary(spark):
    """The schema's three accrualPeriodicity alternations, exercised the
    way the reference's regex admits them (R/P…, R/PT…, eventual)."""
    rows = [
        ("ok1", "R/P1Y"), ("ok2", "R/P0.5M"), ("ok3", "R/PT1H"),
        ("ok4", "eventual"), ("bad1", "P1Y"), ("bad2", "R/X"),
        ("bad3", "R/PT1Y"),
    ]
    df_spec = (
        [(rid, "t", "d", "p", None, v, "2020-01-01", None, None, None,
          ["ECON"], None, None) for rid, v in rows],
        DATASET_SCHEMA_STR.replace("rid string, title", "rid string, title"),
    )
    fired = {
        r.rid
        for r in apply_rules(
            spark.createDataFrame(*df_spec),
            {"dataset_accrualPeriodicity_format":
                dataset_rules()["dataset_accrualPeriodicity_format"]},
            ["rid"],
        ).collect()
    }
    assert fired == {"bad1", "bad2", "bad3"}


DIST_SCHEMA_STR = (
    "rid string, title string, description string, fileName string,"
    " format string, downloadURL string, accessURL string, issued string,"
    " byteSize string, scrapingFileURL string"
)


def test_distribution_negative_fixtures(spark):
    bad = (
        [("x", "", "d", "f.csv", "CSV", "not a url", None, "yesterday",
          "12MB", None)],
        DIST_SCHEMA_STR,
    )
    fired = _fired(spark, bad, distribution_rules())
    assert "distribution_title_format" in fired
    assert "distribution_downloadURL_format" in fired
    assert "distribution_issued_format" in fired
    assert "distribution_byteSize_format" in fired
    assert "distribution_has_source_url" not in fired  # downloadURL present


def test_distribution_positive_fixture(spark):
    good = (
        [("x", "Serie", None, "s.csv", "CSV",
          "https://acme.test/s.csv", "http://acme.test/land", "2020-06-01",
          "20480", None)],
        DIST_SCHEMA_STR,
    )
    assert _fired(spark, good, distribution_rules()) == set()


def test_byte_size_empty_string_allowed(spark):
    ok = (
        [("x", "Serie", None, None, None, "https://a.b/c", None,
          "2020-06-01", "", "http://a.b/wb.xlsx")],
        DIST_SCHEMA_STR,
    )
    fired = _fired(spark, ok, distribution_rules())
    assert "distribution_byteSize_format" not in fired


FIELD_SCHEMA_STR = (
    "rid string, title string, type string, description string,"
    " specialType string, specialTypeDetail string,"
    " scrapingIdentifierCell string, scrapingDataStartCell string"
)


def test_field_negative_fixtures(spark):
    """Field BASE rules now compile from config/schemas/field.json
    (title required+minLength, type enum); the scraping-extension rules
    stay explicit. One violating row per rule."""
    from series_tiempo_ar_scraping_spark.operators.validation import (
        field_rules,
    )

    bad = (
        [
            ("null_title", None, "number", None, None, None, None, None),
            ("empty_title", "", "number", None, None, None, None, None),
            ("bad_type", "s", "float", None, None, None, None, None),
            ("bad_freq", "t", "date", None, "time_index", "R/P2M", None, None),
            ("bad_coord", "u", "number", None, None, None, "8B", "Z0x"),
        ],
        FIELD_SCHEMA_STR,
    )
    df = spark.createDataFrame(*bad)
    errs = apply_rules(df, field_rules(), ["rid"])
    fired = {(r.rid, r.rule) for r in errs.collect()}
    assert ("null_title", "field_title_required") in fired
    assert ("empty_title", "field_title_format") in fired
    assert ("empty_title", "field_title_required") not in fired
    assert ("bad_type", "field_type_enum") in fired
    assert ("bad_freq", "field_time_index_frequency") in fired
    assert ("bad_coord", "field_identifier_cell_coord") in fired
    assert ("bad_coord", "field_data_start_cell_coord") in fired


def test_field_positive_fixture(spark):
    from series_tiempo_ar_scraping_spark.operators.validation import (
        field_rules,
    )

    good = (
        [("x", "serie_a", "number", "desc", "time_index", "R/P3M", "B8", "B9")],
        FIELD_SCHEMA_STR,
    )
    df = spark.createDataFrame(*good)
    assert {r.rule for r in apply_rules(df, field_rules(), ["rid"]).collect()} == set()


def test_expectation_engine_detects_violations(spark):
    """The expectations operator must COUNT violations, not just bless
    clean data: a deliberately dirty frame trips every check kind with
    the exact violation counts."""
    from series_tiempo_ar_scraping_spark.operators.expectations import (
        Expectation,
        run_expectations,
    )

    dirty = spark.createDataFrame(
        [
            (1, 0.5, "A"),
            (1, -0.1, "B"),   # dup id, below-min rate
            (None, 1.5, "C"),  # null id, above-max rate, bad enum
            (2, None, "A"),
        ],
        "id long, rate double, seg string",
    )
    specs = [
        Expectation("t", "id", "not_null"),
        Expectation("t", "id", "unique"),
        Expectation("t", "rate", "min_ge", 0),
        Expectation("t", "rate", "max_le", 1),
        Expectation("t", "seg", "accepted_values", ("A", "B")),
    ]
    rows = {
        (r.column_name, r.check): r
        for r in run_expectations({"t": dirty}, specs).collect()
    }
    assert rows[("id", "not_null")].n_violations == 1
    # 4 rows, 3 distinct id values (1, 2, NULL->excluded by distinct):
    # count(*)-countDistinct = 4-2 = 2 (null + the duplicate)
    assert rows[("id", "unique")].n_violations == 2
    assert rows[("rate", "min_ge")].n_violations == 1
    assert rows[("rate", "max_le")].n_violations == 1
    assert rows[("seg", "accepted_values")].n_violations == 1
    assert all(r.passed == 0 for r in rows.values())
    assert all(r.n_rows == 4 for r in rows.values())


def test_expectation_engine_one_scan_per_table(spark, sf_dir):
    """N contracts on one table must compile to ONE scan (the plan
    contract that makes contracts affordable at 100 TB)."""
    import contextlib
    import io

    from series_tiempo_ar_scraping_spark.queries import QUERIES

    df = QUERIES["expectation_suite_report"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    p = buf.getvalue()
    # 4 tables -> exactly 4 parquet scans, no joins, no Python
    assert p.count("Scan parquet") == 4
    assert "Join" not in p and "EvalPython" not in p


def test_pipeline_contract_report_frame_availability(spark):
    """EP1 wiring contract: the pipeline suite adapts to which frames
    the run produced — observations-only, report-only, both, neither
    (metadata-only catalogs return None, not an empty frame) — and a
    planted violation in either frame surfaces in the long report."""
    from series_tiempo_ar_scraping_spark.operators.expectations import (
        pipeline_contract_report,
    )

    obs = spark.createDataFrame(
        [("d1", "s1", "2024-01-01"), ("d2", None, "2024-01-02")],
        "distribution_id string, series_id string, ts string",
    )
    # an EMPTY produced frame violates nothing — the conditional sums
    # must coalesce to 0, not surface SUM-over-nothing NULLs (which
    # would crash the run_etl summary sum)
    empty_rows = pipeline_contract_report(obs.limit(0), None).collect()
    assert len(empty_rows) == 3
    assert {r.n_violations for r in empty_rows} == {0}
    assert {r.n_rows for r in empty_rows} == {0}
    assert {r.passed for r in empty_rows} == {1}
    rep = spark.createDataFrame(
        [("a", "OK"), ("b", "BOGUS")],
        "dataset_identifier string, dataset_status string",
    )
    assert pipeline_contract_report(None, None) is None

    only_obs = pipeline_contract_report(obs, None).collect()
    assert {r.table_name for r in only_obs} == {"observations"}

    both = {
        (r.table_name, r.column_name, r.check): r.n_violations
        for r in pipeline_contract_report(obs, rep).collect()
    }
    assert both[("observations", "series_id", "not_null")] == 1
    assert both[("observations", "distribution_id", "not_null")] == 0
    assert both[("dataset_report", "dataset_status", "accepted_values")] == 1
