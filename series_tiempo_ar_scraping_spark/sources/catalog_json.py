"""S4 — JSON catalog reader + normalization to relational frames.

The reference parses ``data.json`` into a nested dict tree
(``base.py:408-421`` via pydatajson) and navigates it as objects. Here the
nested document is read once with ``spark.read.json`` and **normalized**
into five flat frames (``catalogs``, ``datasets``, ``distributions``,
``fields``, ``themes``) with explicit foreign keys — the shape the
reference's own XLSX catalog format already uses (5 sheets, SURVEY §1.3).

Everything downstream (validation, routing, scraping, reporting) is a join
against these frames; catalog metadata is tiny so they broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _opt(df: DataFrame, name: str, dtype: str = "string"):
    """Column if present in the inferred schema, else typed NULL — catalog
    files omit optional keys freely (JSON Schema marks few required)."""
    parts = name.split(".")
    cur = df.schema
    for p in parts:
        names = [f.name for f in cur.fields] if hasattr(cur, "fields") else []
        if p not in names:
            return F.lit(None).cast(dtype)
        cur = dict(zip(names, [f.dataType for f in cur.fields]))[p]
    return F.col(name).cast(dtype)


def _has(df: DataFrame, name: str) -> bool:
    """Whether a (possibly dotted) path exists in the inferred schema."""
    cur = df.schema
    for p in name.split("."):
        names = [f.name for f in cur.fields] if hasattr(cur, "fields") else []
        if p not in names:
            return False
        cur = dict(zip(names, [f.dataType for f in cur.fields]))[p]
    return True


# A present-but-empty stand-in for a missing array-of-objects key:
# explode_outer yields one all-null struct row, every _opt() projection
# of it is NULL, and the not-null id filters drop it — so a catalog that
# omits `dataset`/`distribution`/`field`/`themeTaxonomy` (all optional
# per the schemas) normalizes to EMPTY frames instead of crashing on an
# unresolved column.
_MISSING_ARRAY = "array<struct<__missing:string>>"


def _opt_explode(df: DataFrame, name: str, alias: str, pos: bool = False):
    col = (
        F.col(name)
        if _has(df, name)
        else F.lit(None).cast(_MISSING_ARRAY)
    )
    if pos:
        return F.posexplode_outer(col).alias("pos", alias)
    return F.explode_outer(col).alias(alias)


def read_catalog_json(spark: SparkSession, path: str, catalog_id: str | None = None) -> dict[str, DataFrame]:
    """Read one ``data.json`` catalog file → normalized frames.

    ``catalog_id`` overrides the file's ``identifier`` (the reference keys
    catalogs by their index.yaml name, ``base.py:1073-1091``).
    """
    raw = spark.read.option("multiLine", True).json(path)
    return normalize_catalog(raw, catalog_id=catalog_id)


def normalize_catalog(raw: DataFrame, catalog_id: str | None = None) -> dict[str, DataFrame]:
    """Nested catalog document → 5 relational frames (SURVEY §1.3)."""
    cid = (
        F.lit(catalog_id)
        if catalog_id is not None
        else F.coalesce(_opt(raw, "identifier"), F.lit("catalog"))
    )

    catalogs = raw.select(
        cid.alias("catalog_id"),
        _opt(raw, "title").alias("title"),
        _opt(raw, "description").alias("description"),
        _opt(raw, "publisher.name").alias("publisher_name"),
        _opt(raw, "publisher.mbox").alias("publisher_mbox"),
        _opt(raw, "superThemeTaxonomy").alias("superThemeTaxonomy"),
        _opt(raw, "issued").alias("issued"),
        _opt(raw, "modified").alias("modified"),
        _opt(raw, "license").alias("license"),
        _opt(raw, "homepage").alias("homepage"),
        _opt(raw, "rights").alias("rights"),
    )

    with_cid = raw.select(cid.alias("catalog_id"), "*")

    ds_exploded = with_cid.select(
        "catalog_id", _opt_explode(with_cid, "dataset", "ds")
    )
    datasets = ds_exploded.select(
        "catalog_id",
        _opt(ds_exploded, "ds.identifier").alias("dataset_id"),
        _opt(ds_exploded, "ds.title").alias("title"),
        _opt(ds_exploded, "ds.description").alias("description"),
        _opt(ds_exploded, "ds.publisher.name").alias("publisher_name"),
        _opt(ds_exploded, "ds.publisher.mbox").alias("publisher_mbox"),
        _opt(ds_exploded, "ds.accrualPeriodicity").alias("accrualPeriodicity"),
        _opt(ds_exploded, "ds.issued").alias("issued"),
        _opt(ds_exploded, "ds.modified").alias("modified"),
        _opt(ds_exploded, "ds.temporal").alias("temporal"),
        _opt(ds_exploded, "ds.landingPage").alias("landingPage"),
        _opt(ds_exploded, "ds.source").alias("source"),
        _opt(ds_exploded, "ds.superTheme", "array<string>").alias("superTheme"),
        _opt(ds_exploded, "ds.theme", "array<string>").alias("theme"),
        _opt(ds_exploded, "ds.keyword", "array<string>").alias("keyword"),
    ).filter(F.col("dataset_id").isNotNull())

    dist_exploded = ds_exploded.select(
        "catalog_id",
        _opt(ds_exploded, "ds.identifier").alias("dataset_id"),
        _opt_explode(ds_exploded, "ds.distribution", "di"),
    )
    distributions = dist_exploded.select(
        "catalog_id",
        "dataset_id",
        _opt(dist_exploded, "di.identifier").alias("distribution_id"),
        _opt(dist_exploded, "di.title").alias("title"),
        _opt(dist_exploded, "di.description").alias("description"),
        _opt(dist_exploded, "di.fileName").alias("fileName"),
        _opt(dist_exploded, "di.format").alias("format"),
        _opt(dist_exploded, "di.downloadURL").alias("downloadURL"),
        _opt(dist_exploded, "di.accessURL").alias("accessURL"),
        _opt(dist_exploded, "di.scrapingFileURL").alias("scrapingFileURL"),
        _opt(dist_exploded, "di.scrapingFileSheet").alias("scrapingFileSheet"),
        _opt(dist_exploded, "di.issued").alias("issued"),
        _opt(dist_exploded, "di.byteSize").alias("byteSize"),
    ).filter(F.col("distribution_id").isNotNull())

    field_exploded = dist_exploded.select(
        "catalog_id",
        "dataset_id",
        _opt(dist_exploded, "di.identifier").alias("distribution_id"),
        _opt_explode(dist_exploded, "di.field", "f", pos=True),
    )
    fields = field_exploded.select(
        "catalog_id",
        "dataset_id",
        "distribution_id",
        F.col("pos").alias("field_order"),
        _opt(field_exploded, "f.id").alias("field_id"),
        _opt(field_exploded, "f.title").alias("title"),
        _opt(field_exploded, "f.type").alias("type"),
        _opt(field_exploded, "f.description").alias("description"),
        _opt(field_exploded, "f.units").alias("units"),
        _opt(field_exploded, "f.specialType").alias("specialType"),
        _opt(field_exploded, "f.specialTypeDetail").alias("specialTypeDetail"),
        _opt(field_exploded, "f.scrapingIdentifierCell").alias("scrapingIdentifierCell"),
        _opt(field_exploded, "f.scrapingDataStartCell").alias("scrapingDataStartCell"),
    ).filter(F.col("title").isNotNull() | F.col("field_id").isNotNull())

    theme_exploded = with_cid.select(
        "catalog_id", _opt_explode(with_cid, "themeTaxonomy", "t")
    )
    themes = theme_exploded.select(
        "catalog_id",
        _opt(theme_exploded, "t.id").alias("theme_id"),
        _opt(theme_exploded, "t.label").alias("label"),
        _opt(theme_exploded, "t.description").alias("description"),
    ).filter(F.col("theme_id").isNotNull())

    return {
        "catalogs": catalogs,
        "datasets": datasets,
        "distributions": distributions,
        "fields": fields,
        "themes": themes,
    }


# Publication key order per entity (pydatajson document shape). Only keys
# the frame actually carries are emitted — published frames have the
# scraping keys scrubbed (K8), unpublished ones keep them.
_FIELD_PUB_KEYS = [
    ("field_id", "id"), ("title", "title"), ("type", "type"),
    ("description", "description"), ("units", "units"),
    ("specialType", "specialType"), ("specialTypeDetail", "specialTypeDetail"),
    ("scrapingIdentifierCell", "scrapingIdentifierCell"),
    ("scrapingDataStartCell", "scrapingDataStartCell"),
]
_DIST_PUB_KEYS = [
    "title", "description", "fileName", "format", "downloadURL",
    "accessURL", "scrapingFileURL", "scrapingFileSheet", "issued",
    "byteSize",
]
_DS_PUB_KEYS = [
    "title", "description", "accrualPeriodicity", "issued", "modified",
    "temporal", "landingPage", "source", "superTheme", "theme", "keyword",
]


def _nest_publisher(df: DataFrame) -> DataFrame:
    """Re-nest the flattened ``publisher_name``/``publisher_mbox`` columns
    into the document's ``publisher: {name, mbox}`` object."""
    if "publisher_name" not in df.columns:
        return df
    return df.withColumn(
        "publisher",
        F.when(
            F.col("publisher_name").isNotNull()
            | F.col("publisher_mbox").isNotNull(),
            F.struct(
                F.col("publisher_name").alias("name"),
                F.col("publisher_mbox").alias("mbox"),
            ),
        ),
    ).drop("publisher_name", "publisher_mbox")


def renest_catalog(frames: dict[str, DataFrame]) -> DataFrame:
    """K2 inverse-normalization — re-nest the relational frames back into
    the catalog document shape for publication (``base.py:494-498``):
    ``collect_list(struct(...))`` bottom-up, full key fidelity (nested
    ``publisher``, fields keyed ``id`` as in the source document, every
    metadata key the frames carry). Entity arrays sort by identifier
    (fields by declaration order) so the emitted document is
    deterministic."""
    fields = frames["fields"]
    fkeys = [(c, out) for c, out in _FIELD_PUB_KEYS if c in fields.columns]
    fields_n = (
        fields.groupBy("catalog_id", "dataset_id", "distribution_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("field_order", *[c for c, _o in fkeys])
                    )
                ),
                lambda s: F.struct(*[s[c].alias(out) for c, out in fkeys]),
            ).alias("field")
        )
    )
    dists = frames["distributions"]
    dkeys = [c for c in _DIST_PUB_KEYS if c in dists.columns]
    dist_n = (
        dists.join(fields_n, ["catalog_id", "dataset_id", "distribution_id"], "left")
        .groupBy("catalog_id", "dataset_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("distribution_id").alias("identifier"),
                        *dkeys,
                        "field",
                    )
                )
            ).alias("distribution")
        )
    )
    datasets = _nest_publisher(frames["datasets"])
    dskeys = [c for c in _DS_PUB_KEYS if c in datasets.columns] + (
        ["publisher"] if "publisher" in datasets.columns else []
    )
    ds_n = (
        datasets.join(dist_n, ["catalog_id", "dataset_id"], "left")
        .groupBy("catalog_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("dataset_id").alias("identifier"),
                        *dskeys,
                        "distribution",
                    )
                )
            ).alias("dataset")
        )
    )
    doc = _nest_publisher(frames["catalogs"]).join(ds_n, "catalog_id", "left")
    # themeTaxonomy: dataset.theme ids reference it — dropping it on
    # republication would dangle them (reference writes the full catalog,
    # base.py:494-498)
    themes = frames.get("themes")
    if themes is not None and "theme_id" in themes.columns:
        themes_n = themes.groupBy("catalog_id").agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("theme_id").alias("id"),
                        *[
                            c
                            for c in ("label", "description")
                            if c in themes.columns
                        ],
                    )
                )
            ).alias("themeTaxonomy")
        )
        doc = doc.join(themes_n, "catalog_id", "left")
    return doc
