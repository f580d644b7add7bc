"""Batch-7 queries: physical layout & scan-pruning techniques.

Data-skipping is the scale lever the logical plan can't see: at 100 TB a
well-clustered layout turns a two-dimensional predicate into a file-list
prune before a single byte is scanned. These entries make the layout
math itself hash-checkable — the Z-value (Morton) computation is pure
bit arithmetic, so DuckDB can verify every cell assignment — while the
write-path effects (per-file footer spans, dynamic partition pruning,
runtime bloom filters) are pinned by tests/test_layout.py, which
measures real parquet footers and physical plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window

from series_tiempo_ar_scraping_spark.operators import textops as TX
from series_tiempo_ar_scraping_spark.operators.layout import (
    ZBITS,
    interleave_bits_sql,
    with_zvalue,
)
from series_tiempo_ar_scraping_spark.queries import (
    det_round,
    load_table,
    register,
)

# bucket = top 10 bits of the 32-bit Z-value -> at most 1024 buckets
_BUCKET_SHIFT = 2 * ZBITS - 10

_ZSQL = interleave_bits_sql("zx", "zy", ZBITS)


@register(
    "zorder_bucket_stats",
    oracle=f"""
    WITH base AS (
      SELECT o_totalprice AS price,
             date_diff('day', DATE '1970-01-01',
                       CAST(o_orderdate AS DATE)) AS dday
      FROM orders
    ),
    bounds AS (
      SELECT MIN(price) AS minp, MAX(price) AS maxp,
             MIN(dday) AS mind, MAX(dday) AS maxd
      FROM base
    ),
    grid AS (
      SELECT price, dday,
             CASE WHEN maxp = minp THEN 0 ELSE CAST(FLOOR(
               (price - minp) * {float(2 ** ZBITS - 1)} / (maxp - minp)
             ) AS BIGINT) END AS zx,
             CASE WHEN maxd = mind THEN 0 ELSE CAST(FLOOR(
               (CAST(dday AS DOUBLE) - CAST(mind AS DOUBLE))
               * {float(2 ** ZBITS - 1)}
               / (CAST(maxd AS DOUBLE) - CAST(mind AS DOUBLE))
             ) AS BIGINT) END AS zy
      FROM base CROSS JOIN bounds
    ),
    zed AS (SELECT price, dday, ({_ZSQL}) AS zv FROM grid)
    SELECT zv >> {_BUCKET_SHIFT} AS zbucket,
           COUNT(*) AS n,
           CAST(MIN(price) AS DOUBLE) AS min_price,
           CAST(MAX(price) AS DOUBLE) AS max_price,
           MIN(dday) AS min_day,
           MAX(dday) AS max_day
    FROM zed GROUP BY 1
    """,
)
def zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order cell assignment, hash-oracled: scale (o_totalprice,
    orderdate-days) onto a 2^16 grid, Morton-interleave the bits with
    pure Catalyst shift/mask expressions, and report per-Z-bucket counts
    and the min/max footprint of each dimension — exactly the zone-map
    content a clustered file would carry. The min-max bounds come from
    ONE 1-row aggregate broadcast back (no window over the fact table);
    everything else is a map-side expression plus one bounded-cardinality
    hash aggregate (≤1024 buckets), so the shuffle is independent of the
    input size. The write-path twin (`write_zordered`) range-partitions
    on this value; tests/test_layout.py proves the resulting parquet
    footers have tight per-file spans in BOTH dimensions."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_totalprice").alias("price"),
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("dday"),
    )
    zed = with_zvalue(base, F.col("price"), F.col("dday").cast("double"))
    return zed.groupBy(
        F.shiftright(F.col("zv"), _BUCKET_SHIFT).alias("zbucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("price").cast("double").alias("min_price"),
        F.max("price").cast("double").alias("max_price"),
        F.min("dday").alias("min_day"),
        F.max("dday").alias("max_day"),
    )


# ---------------------------------------------------------------------------
# Curation completion: canonical selection after dedup + the filter funnel.
# Fragments come from queries_llm so both engines share one derivation.
# ---------------------------------------------------------------------------

from series_tiempo_ar_scraping_spark.sqlfrags import (  # noqa: E402
    _EN,
    _NEAR_CORPUS_SQL,
    _TOKS_SQL,
    _cc_oracle,
)

_QUALITY_SQL = f"""
      SELECT doc_id,
        CAST(FLOOR((
          least(1.0, len(toks) / 200.0) * 0.5
          + least(1.0, (CAST(len(list_filter(toks, x -> lower(x) IN ({_EN})))
                        AS DOUBLE) / greatest(len(toks), 1)) * 4) * 0.3
          + (1.0 - least(1.0,
               (CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                / greatest(length(text), 1)) * 10)) * 0.2
        ) * 10000 + 0.5) / 10000 AS DOUBLE) AS quality
      FROM (SELECT doc_id, text, {_TOKS_SQL.format(c='text')} AS toks
            FROM corpus)
"""


@register(
    "dedup_keep_canonical",
    oracle=f"""
    WITH comps AS ({{cc}}),
    corpus AS ({_NEAR_CORPUS_SQL}),
    q AS ({_QUALITY_SQL}),
    j AS (
      SELECT c.doc_id, c.component_id, q.quality
      FROM comps c JOIN q USING (doc_id)
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY component_id ORDER BY quality DESC, doc_id ASC
      ) AS rk
      FROM j
    )
    SELECT component_id,
           MAX(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc_id,
           CAST(MAX(CASE WHEN rk = 1 THEN quality END) AS DOUBLE)
             AS canonical_quality,
           COUNT(*) AS n_members
    FROM r GROUP BY 1
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step that makes dedup actionable: collapse each near-dup
    component to ONE kept document, chosen by quality (desc, doc_id as
    the deterministic tiebreak — SURVEY §7 hard part (c)). Composition:
    connected components (min-label over LSH+Jaccard edges) ⋈ per-doc
    quality scores, then a per-component row_number — components are
    near-dup clusters (tiny by construction), so the window sort is
    bounded per key; the output is one row per cluster, the exact frame
    a curation pipeline anti-joins against the corpus to drop dups."""
    # runtime import: queries_llm is a sibling batch (import-order safe)
    from series_tiempo_ar_scraping_spark.queries_llm import (
        _near_corpus,
        dedup_connected_components,
    )

    comps = dedup_connected_components(spark, sf_dir)
    quality = _near_corpus(spark, sf_dir).select(
        "doc_id",
        det_round(TX.quality_score(F.col("text")), 4).alias("quality"),
    )
    j = comps.join(quality, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    r = j.withColumn("rk", F.row_number().over(w))
    return r.groupBy("component_id").agg(
        F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
            "canonical_doc_id"
        ),
        F.max(F.when(F.col("rk") == 1, F.col("quality")))
        .cast("double")
        .alias("canonical_quality"),
        F.count("*").alias("n_members"),
    )


from series_tiempo_ar_scraping_spark.queries import ORACLES  # noqa: E402

# _cc_oracle() is itself a WITH RECURSIVE statement; splice it in as the
# comps subquery (nested CTEs are legal in DuckDB subselects).
ORACLES["dedup_keep_canonical"] = ORACLES["dedup_keep_canonical"].format(
    cc=_cc_oracle()
)


@register(
    "curation_filter_funnel",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, lang, {_TOKS_SQL.format(c='text')} AS toks,
             length(text) AS n_chars
      FROM documents
    ),
    h AS (
      SELECT doc_id, lang, n_chars, len(toks) AS n_toks,
             len(regexp_extract_all(text, '[.,!?;:]')) AS punct
      FROM t
    ),
    staged AS (
      SELECT CASE
        WHEN n_chars < 120 THEN '1_too_short'
        WHEN lang NOT IN ('en', 'es') THEN '2_lang_filter'
        WHEN CAST(punct AS DOUBLE) / greatest(n_chars, 1) > 0.04
          THEN '3_punct_heavy'
        WHEN n_toks < 25 THEN '4_too_few_tokens'
        ELSE '5_kept' END AS stage
      FROM h
    )
    SELECT stage, COUNT(*) AS n_docs FROM staged GROUP BY 1
    """,
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel with reason attribution: every document is
    assigned the FIRST rule that rejects it (ordered CASE — identical
    rule order in both engines), so the per-stage counts read as a
    drop-off funnel and rule changes are reviewable as count diffs. One
    map-side projection plus a ≤5-group aggregate: no shuffle of the
    corpus at any scale. Threshold comparisons divide the same integers
    in IEEE double on both engines, so stage assignment is exact."""
    docs = load_table(spark, sf_dir, "documents")
    f = TX.quality_features(F.col("text"))
    stage = (
        F.when(f["n_chars"] < 120, "1_too_short")
        .when(~F.col("lang").isin("en", "es"), "2_lang_filter")
        .when(f["punct_ratio"] > 0.04, "3_punct_heavy")
        .when(f["n_tokens"] < 25, "4_too_few_tokens")
        .otherwise("5_kept")
    )
    return docs.select(stage.alias("stage")).groupBy("stage").agg(
        F.count("*").alias("n_docs")
    )
