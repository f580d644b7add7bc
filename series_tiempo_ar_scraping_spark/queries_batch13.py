"""Batch-13 queries: retrieval, sampling theory, and revenue analytics
shapes rounding out the 100 TB curation/BI surface.

Families (each entry hash-oracled; plan contracts in tests/test_plans.py):

- Retrieval: full BM25 scoring (Lucene idf variant) for a fixed query
  term set — tf stays a map-side projection (no explode), df/avgdl are
  one scalar frame, top-k is a global TakeOrdered.
- Exact substring-level dedup (Lee et al. 2022 "Deduplicating Training
  Data Makes Language Models Better" at shingle granularity):
  positions of cross-document duplicated k-shingles merged into
  maximal spans via gaps-and-islands, reported as per-doc duplicated
  token coverage.
- Weighted sampling without replacement: Efraimidis–Spirakis A-Res
  (key = u^(1/w), ranked in log space) — exactly k per stratum, fully
  deterministic from the seeded cross-engine hash.
- Mix-shift decomposition: period-over-period metric change split into
  volume/mix vs rate effects per segment, with exact telescoping
  closure (mix + rate = delta).

Determinism recipe (repo standard, queries_batch8/12): exact
bigint/decimal arithmetic end-to-end; the seeded cross-engine hash is
the ONE ``hash64_seeded`` / ``_hex60_seeded`` spelling; ln/exp feed on
single divisions of exact values and every transcendental term is
micro-floored BEFORE any cross-partition sum; at most one double
division of identical integers per output column.

Reference parity: extends the reference's report/indicator family
(reference/scrapers/base.py generate_summary_indicators — aggregate
health deltas per catalog) to segment-attribution analytics, and its
dedup/validation lane to substring-level duplication audits — the
curation extensions SURVEY §2.13 calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.operators import textops as TX
from series_tiempo_ar_scraping_spark.operators.dedup import hash64_seeded
from series_tiempo_ar_scraping_spark.queries import (
    det_round,
    det_round_sql,
    load_table,
    register,
)
from series_tiempo_ar_scraping_spark.sqlfrags import (
    _hex60_seeded,
    _toks_of_norm,
)

# ---------------------------------------------------------------------------
# Mix-shift decomposition (BI attribution family)
# ---------------------------------------------------------------------------

_MS_Y0, _MS_Y1 = 1994, 1995


@register(
    "mix_shift_decomposition",
    oracle=f"""
    WITH seg AS (
      SELECT c_mktsegment AS segment,
             CAST(year(o_orderdate) AS INT) AS yr,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE year(o_orderdate) IN ({_MS_Y0}, {_MS_Y1})
      GROUP BY 1, 2
    ),
    w AS (
      SELECT segment,
             COALESCE(MAX(CASE WHEN yr = {_MS_Y0} THEN n END), 0) AS n0,
             COALESCE(MAX(CASE WHEN yr = {_MS_Y1} THEN n END), 0) AS n1,
             CAST(COALESCE(MAX(CASE WHEN yr = {_MS_Y0} THEN rev END), 0)
               AS DOUBLE) AS rev0,
             CAST(COALESCE(MAX(CASE WHEN yr = {_MS_Y1} THEN rev END), 0)
               AS DOUBLE) AS rev1
      FROM seg GROUP BY 1
    )
    SELECT segment, n0, n1, rev0, rev1,
           {det_round_sql('rev0 / NULLIF(n0, 0)', 4)} AS rate0,
           {det_round_sql('rev1 / NULLIF(n1, 0)', 4)} AS rate1,
           {det_round_sql('(n1 - n0) * (rev0 / NULLIF(n0, 0))', 4)}
             AS mix_effect,
           {det_round_sql(
               'n1 * (rev1 / NULLIF(n1, 0) - rev0 / NULLIF(n0, 0))', 4)}
             AS rate_effect,
           {det_round_sql('rev1 - rev0', 4)} AS delta
    FROM w
    """,
)
def mix_shift_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Period-over-period revenue change per market segment, decomposed
    into a volume/mix effect ((n1−n0)·rate0 — "we did more/fewer
    orders") and a rate effect (n1·(rate1−rate0) — "orders got
    bigger/smaller"), the standard telescoping identity: the two
    effects sum EXACTLY to the segment's revenue delta. The
    attribution query behind every "why did revenue move" dashboard.

    Scale shape: one orders-customer join (segment lookup), one
    (segment, year) aggregate, then a 5-row pivot — all downstream
    arithmetic happens on the tiny segment frame. Determinism: counts
    and decimal revenue sums are exact; each rate is ONE double
    division of identical exact values; effects are fixed op trees on
    those doubles, det-rounded."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    yr = F.year("o_orderdate")
    seg = (
        orders.join(
            customer,
            orders["o_custkey"] == customer["c_custkey"],
        )
        .filter(yr.isin(_MS_Y0, _MS_Y1))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            yr.cast("int").alias("yr"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias(
                "rev"
            ),
        )
    )

    def _year_col(col: str, y: int):
        return F.max(F.when(F.col("yr") == y, F.col(col)))

    w = seg.groupBy("segment").agg(
        F.coalesce(_year_col("n", _MS_Y0), F.lit(0))
        .cast("long")
        .alias("n0"),
        F.coalesce(_year_col("n", _MS_Y1), F.lit(0))
        .cast("long")
        .alias("n1"),
        F.coalesce(_year_col("rev", _MS_Y0), F.lit(0))
        .cast("double")
        .alias("rev0"),
        F.coalesce(_year_col("rev", _MS_Y1), F.lit(0))
        .cast("double")
        .alias("rev1"),
    )
    rate0 = F.col("rev0") / F.nullif(F.col("n0"), F.lit(0))
    rate1 = F.col("rev1") / F.nullif(F.col("n1"), F.lit(0))
    return w.select(
        "segment",
        "n0",
        "n1",
        "rev0",
        "rev1",
        det_round(rate0, 4).alias("rate0"),
        det_round(rate1, 4).alias("rate1"),
        det_round((F.col("n1") - F.col("n0")) * rate0, 4).alias(
            "mix_effect"
        ),
        det_round(F.col("n1") * (rate1 - rate0), 4).alias(
            "rate_effect"
        ),
        det_round(F.col("rev1") - F.col("rev0"), 4).alias("delta"),
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (LLM curation family)
# ---------------------------------------------------------------------------

_SPAN_K = 3  # shingle width in tokens
_SPAN_SEED = 7


@register(
    "substring_span_dedup",
    oracle=f"""
    WITH t2 AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
      FROM (SELECT doc_id, {_toks_of_norm('text')} AS toks
            FROM documents)
      WHERE len(toks) >= {_SPAN_K}
    ),
    sh AS (
      SELECT doc_id, n_tokens,
             unnest(list_transform(
               generate_series(0, len(toks) - {_SPAN_K}),
               i -> struct_pack(
                 pos := i,
                 h := {_hex60_seeded(
                     str(_SPAN_SEED),
                     "concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])")}
               ))) AS u
      FROM t2
    ),
    sp AS (
      SELECT doc_id, n_tokens, CAST(u.pos AS BIGINT) AS pos, u.h AS h
      FROM sh
    ),
    dup AS (
      SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    d AS (
      SELECT doc_id, n_tokens, pos FROM sp
      WHERE h IN (SELECT h FROM dup)
    ),
    isl AS (
      SELECT doc_id, n_tokens, pos,
             SUM(CASE WHEN prev IS NULL
                        OR pos - prev > {_SPAN_K} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (SELECT doc_id, n_tokens, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     AS prev
            FROM d)
    ),
    spans AS (
      SELECT doc_id, n_tokens, island,
             CAST(COUNT(*) AS BIGINT) AS n_positions,
             MAX(pos) - MIN(pos) + {_SPAN_K} AS covered
      FROM isl GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           MAX(n_tokens) AS n_tokens,
           CAST(SUM(n_positions) AS BIGINT) AS n_dup_positions,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(covered) AS BIGINT) AS covered_tokens,
           {det_round_sql(
               'CAST(SUM(covered) AS DOUBLE) / MAX(n_tokens)', 6)}
             AS dup_coverage
    FROM spans GROUP BY doc_id
    """,
)
def substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring detection at k-shingle granularity
    (the distributable core of Lee et al. 2022's suffix-array exact
    substring dedup): every k-token window that appears in ≥2 distinct
    documents is a duplicated position; adjacent/overlapping duplicated
    positions merge into maximal spans (gaps-and-islands), and each doc
    reports how much of it is covered by cross-document duplicated
    text — the signal used to strip boilerplate/quoted spans rather
    than drop whole near-dup docs.

    Scale shape: positional shingle explode (linear in corpus tokens),
    ONE shuffle on the 60-bit shingle hash for the duplicated-hash set,
    a semi join back on the same hash, then per-doc windows on the
    (much smaller) duplicated-position frame. n_tokens rides along the
    explode so no join back to the token frame is needed. At 100 TB
    the hash groupBy is the canonical approach (suffix arrays don't
    distribute; shingle hashing does). Determinism: positions and
    counts are exact ints; the only double is the final coverage ratio
    (one division, det-rounded)."""
    docs = load_table(spark, sf_dir, "documents")
    t2 = docs.select(
        "doc_id", TX.tokens(TX.normalize_text("text")).alias("toks")
    ).select(
        "doc_id", "toks", F.size("toks").cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= _SPAN_K)

    # positional k-shingles: (doc_id, pos, hash) — explode of a
    # transform over the start-index range, token frame evaluated once
    sh = t2.select(
        "doc_id",
        "n_tokens",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), F.size("toks") - F.lit(_SPAN_K)
                ),
                lambda i: F.concat_ws(
                    " ",
                    F.try_element_at("toks", i + 1),
                    F.try_element_at("toks", i + 2),
                    F.try_element_at("toks", i + 3),
                ),
            )
        ).alias("pos", "s"),
    ).select(
        "doc_id",
        "n_tokens",
        F.col("pos").cast("long").alias("pos"),
        hash64_seeded(F.col("s"), _SPAN_SEED).alias("h"),
    )

    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    d = sh.join(dup, "h", "left_semi")

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    isl = d.withColumn("prev", F.lag("pos").over(w_doc)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev").isNull()
                | (F.col("pos") - F.col("prev") > _SPAN_K),
                1,
            ).otherwise(0)
        ).over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = isl.groupBy("doc_id", "n_tokens", "island").agg(
        F.count("*").alias("n_positions"),
        (F.max("pos") - F.min("pos") + F.lit(_SPAN_K)).alias(
            "covered"
        ),
    )
    return spans.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.sum("n_positions").cast("long").alias("n_dup_positions"),
        F.count("*").alias("n_spans"),
        F.sum("covered").cast("long").alias("covered_tokens"),
        det_round(
            F.sum("covered").cast("double") / F.max("n_tokens"), 6
        ).alias("dup_coverage"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (search / retrieval family)
# ---------------------------------------------------------------------------

_BM25_TERMS = ["vector", "hash", "stream", "window", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def _bm25_term_sql(term: str) -> str:
    """One BM25 term contribution, micro-floored (DuckDB side).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))   [Lucene's non-negative form]
    tfn = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    """
    tf = f"len(list_filter(toks, x -> x = '{term}'))"
    df = f"df_{term}"
    idf = f"ln(1 + (n_docs - {df} + 0.5) / ({df} + 0.5))"
    tfn = (
        f"({tf} * {_BM25_K1 + 1}) / ({tf} + {_BM25_K1} * "
        f"(1 - {_BM25_B} + {_BM25_B} * (dl / avgdl)))"
    )
    return (
        f"CAST(FLOOR({idf} * {tfn} * 1000000 + 0.5) AS BIGINT)"
    )


@register(
    "bm25_search_topk",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_toks_of_norm('text')} AS toks
      FROM documents
    ),
    d AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
      FROM tk WHERE len(toks) > 0
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {', '.join(
                 f"CAST(SUM(CASE WHEN len(list_filter(toks, "
                 f"x -> x = '{t}')) > 0 THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS df_{t}"
                 for t in _BM25_TERMS)}
      FROM d
    ),
    scored AS (
      SELECT doc_id, dl,
             CAST({' + '.join(
                 f"CASE WHEN len(list_filter(toks, x -> x = '{t}')) > 0 "
                 f"THEN 1 ELSE 0 END" for t in _BM25_TERMS)} AS BIGINT)
               AS matched_terms,
             ({' + '.join(_bm25_term_sql(t) for t in _BM25_TERMS)})
               AS micro
      FROM d CROSS JOIN stats
    )
    SELECT doc_id, dl, matched_terms,
           CAST(micro AS DOUBLE) / 1000000 AS bm25_score
    FROM scored
    ORDER BY micro DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BM25 ranking (Lucene's non-negative idf variant, k1=1.2,
    b=0.75) of the corpus against a fixed conjunctive-ish query term
    set, returning the global top-20 — the retrieval workload behind
    every search/RAG candidate generator, complementing
    ``tfidf_top_terms`` (per-doc keyword extraction) and the ANN family
    (dense retrieval) with the sparse lexical scorer.

    Scale shape: tf per query term is a map-side higher-order filter
    over the token array (NO explode, NO per-term join — the term set
    is fixed and small); df/avgdl/N are ONE scalar aggregate frame
    cross-joined back (1-row broadcast); top-k is a global
    TakeOrdered, not a full sort. Determinism: tf/df/dl exact ints;
    avgdl is one division; each term's idf·tfn is a fixed double op
    tree micro-floored to bigint BEFORE the (map-side, 5-term) sum;
    ties broken by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.select(
            "doc_id",
            TX.tokens(TX.normalize_text("text")).alias("toks"),
        )
        .select(
            "doc_id",
            "toks",
            F.size("toks").cast("long").alias("dl"),
        )
        .filter(F.col("dl") > 0)
    )

    def _tf(term: str):
        return F.size(F.filter(F.col("toks"), lambda x: x == term))

    stats = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(_tf(t) > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def _term_micro(term: str):
        tf = _tf(term).cast("double")
        df = F.col(f"df_{term}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        tfn = (tf * F.lit(_BM25_K1 + 1)) / (
            tf
            + F.lit(_BM25_K1)
            * (
                F.lit(1 - _BM25_B)
                + F.lit(_BM25_B)
                * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
        return F.floor(idf * tfn * 1000000 + F.lit(0.5)).cast("bigint")

    scored = d.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        sum(
            (
                F.when(_tf(t) > 0, 1).otherwise(0)
                for t in _BM25_TERMS
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("matched_terms"),
        sum(
            (_term_micro(t) for t in _BM25_TERMS), F.lit(0).cast("bigint")
        ).alias("micro"),
    )
    return (
        scored.orderBy(F.col("micro").desc(), "doc_id")
        .limit(_BM25_TOPK)
        .select(
            "doc_id",
            "dl",
            "matched_terms",
            (F.col("micro").cast("double") / 1000000).alias(
                "bm25_score"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-Res)
# ---------------------------------------------------------------------------

_ARES_SEED = 31
_ARES_K = 10
_ARES_U_BUCKETS = 1048576  # 2^20 — u is an exact dyadic rational


@register(
    "weighted_sample_ares",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id,
             CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
             CAST(FLOOR(
               ln(CAST(({_hex60_seeded(
                   str(_ARES_SEED), 'CAST(doc_id AS VARCHAR)')}
                        % {_ARES_U_BUCKETS} + 1) AS DOUBLE)
                  / {_ARES_U_BUCKETS})
               / GREATEST(n_chars, 1) * 1000000000000 + 0.5)
               AS BIGINT) AS key_micro
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, weight, key_micro,
             row_number() OVER (PARTITION BY source
                                ORDER BY key_micro DESC, doc_id)
               AS sample_rank
      FROM keyed
    )
    SELECT source, doc_id, weight, key_micro,
           CAST(sample_rank AS INT) AS sample_rank
    FROM ranked WHERE sample_rank <= {_ARES_K}
    """,
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement per stratum
    (source), by Efraimidis–Spirakis A-Res: each row draws
    u ∈ (0, 1] from the seeded hash and keeps key = u^(1/w); the top-k
    keys per stratum ARE a weighted sample without replacement.
    Ranked in log space (ln(u)/w — monotone in the key, avoids pow)
    and micro-floored so the order is integer-exact cross-engine. The
    exactly-k companion to ``quality_weighted_sampling``'s Bernoulli
    thinning (which can't hit a target count) and
    ``stratified_sample_documents``' unweighted quota.

    Scale shape: the key is one map-side expression; per-stratum top-k
    is a rank-filtered window, which Spark executes as WindowGroupLimit
    (partial top-k BEFORE the shuffle), so the exchange carries ~k rows
    per stratum, not the corpus. Determinism: u is an exact dyadic
    rational of the 60-bit hash; ln of one exact division, one more
    division by the exact integer weight, micro-floored to bigint;
    ties broken by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("long")
    u = (
        (
            hash64_seeded(F.col("doc_id").cast("string"), _ARES_SEED)
            % _ARES_U_BUCKETS
            + 1
        ).cast("double")
        / _ARES_U_BUCKETS
    )
    keyed = docs.select(
        "source",
        "doc_id",
        w.alias("weight"),
        F.floor(F.log(u) / w * 1000000000000 + F.lit(0.5))
        .cast("bigint")
        .alias("key_micro"),
    )
    win = Window.partitionBy("source").orderBy(
        F.col("key_micro").desc(), "doc_id"
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= _ARES_K)
        .select(
            "source",
            "doc_id",
            "weight",
            "key_micro",
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )
