"""Batch-11 queries: vocabulary coverage, blocked fuzzy joins, and
clustering-as-blocking dedup.

Three LLM-curation shapes the earlier batches stopped short of:

- vocabulary OOV accounting (corpus-derived top-N vocab -> per-document
  out-of-vocabulary rate, the tokenizer-coverage report every training
  run starts with),
- blocked approximate string join (exact-dedup the key space, block,
  verify with edit distance, roll back up with multiplicities — the
  record-linkage shape),
- semantic near-dup detection with a TRAINED clustering as the blocking
  function (k-means cells instead of LSH bands).

Determinism recipe (repo standard, queries_batch8): exact bigint
aggregates, identical expression trees both engines, at most ONE double
division of identical integers (IEEE division is correctly rounded, so
same ints -> same bits). Reference parity: extends the reference's
validation/QA family (reference/scrapers/validators.py) with corpus-
level coverage checks its per-series pandas layer never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.operators import similarity as S
from series_tiempo_ar_scraping_spark.operators import textops as TX
from series_tiempo_ar_scraping_spark.queries import (
    load_table,
    register,
)
from series_tiempo_ar_scraping_spark.sqlfrags import _toks_of_norm

_VOCAB_N = 16  # corpus vocab is ~31 tokens; top-16 leaves a real OOV tail


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_toks_of_norm('text')}) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
    vocab AS (SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT {_VOCAB_N}),
    per AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_oov
      FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
      GROUP BY 1
    )
    SELECT doc_id, n_tokens, n_oov,
           CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
    FROM per
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage report: derive the corpus's top-N vocabulary
    (count DESC, token — a deterministic total order at the cutoff),
    then score every document's out-of-vocabulary token rate against it.
    The first QA gate of a training run: a rising OOV rate means the
    tokenizer/vocab no longer fits the incoming corpus.

    Scale shape: tokenize ONCE into a checkpointed token frame feeding
    both lanes; the vocabulary is a top-N frame (partial agg + bounded
    TakeOrdered) that BROADCASTS back onto the token stream, so the
    per-document pass is map-side — no second shuffle of the corpus
    beyond the final doc_id rollup. The one double division has exact
    integer operands (bit-identical across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(TX.tokens(TX.normalize_text(F.col("text")))).alias(
            "tok"
        ),
    ).localCheckpoint(eager=True)
    cnt = toks.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = (
        cnt.orderBy(F.col("c").desc(), "tok")
        .limit(_VOCAB_N)
        .select("tok", F.lit(1).alias("in_v"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
    )


@register(
    "fuzzy_blocked_name_join",
    oracle="""
    WITH names AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS cnt,
             split_part(p_name, ' ', 2) AS noun
      FROM part GROUP BY 1
    ),
    pairs AS (
      SELECT a.noun, levenshtein(a.p_name, b.p_name) AS d,
             a.cnt * b.cnt AS w
      FROM names a
      JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
    ),
    blocks AS (
      SELECT noun, CAST(COUNT(*) AS BIGINT) AS n_names
      FROM names GROUP BY 1
    ),
    pa AS (
      SELECT noun,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN d <= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_close_pairs,
             CAST(SUM(CASE WHEN d <= 3 THEN w ELSE 0 END) AS BIGINT)
               AS close_row_pairs,
             CAST(MIN(d) AS BIGINT) AS min_dist
      FROM pairs GROUP BY 1
    )
    SELECT b.noun, b.n_names,
           COALESCE(p.n_pairs, 0) AS n_pairs,
           COALESCE(p.n_close_pairs, 0) AS n_close_pairs,
           COALESCE(p.close_row_pairs, 0) AS close_row_pairs,
           p.min_dist
    FROM blocks b LEFT JOIN pa p USING (noun)
    """,
)
def fuzzy_blocked_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked approximate string self-join (record linkage): exact-dedup
    part names into a (name, multiplicity) frame, block on the name's
    second token, verify candidates with Levenshtein (both engines: unit
    ins/del/sub), and roll the match stats back up with row
    multiplicities (``cnt_a * cnt_b`` = linked ROW pairs, not name
    pairs). Reports per block: candidate pairs, close pairs (distance
    <= 3), linked row pairs, min distance.

    Scale shape: the all-pairs work runs on the DEDUPLICATED key space
    (|distinct names| << |rows| — here 64 vs 20k at sf0.1; at 100 TB,
    the same collapse is what makes fuzzy linkage feasible at all),
    upper-triangled (a < b) inside blocks so no pair is scored twice,
    with the distinct-name frame BROADCAST for the block join. The
    multiplicity weights mean no row-level data ever enters the
    quadratic stage."""
    parts = load_table(spark, sf_dir, "part")
    names = (
        parts.groupBy("p_name")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "noun",
            F.coalesce(
                F.try_element_at(F.split("p_name", " "), F.lit(2)),
                F.lit(""),
            ),
        )
        .localCheckpoint(eager=True)
    )
    pairs = (
        names.alias("a")
        .join(
            F.broadcast(names.alias("b")),
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.noun").alias("noun"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias(
                "d"
            ),
            (F.col("a.cnt") * F.col("b.cnt")).alias("w"),
        )
    )
    blocks = names.groupBy("noun").agg(F.count("*").alias("n_names"))
    pa = pairs.groupBy("noun").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("d") <= 3, 1).otherwise(0))
        .cast("long")
        .alias("n_close_pairs"),
        F.sum(F.when(F.col("d") <= 3, F.col("w")).otherwise(0))
        .cast("long")
        .alias("close_row_pairs"),
        F.min("d").cast("long").alias("min_dist"),
    )
    zero = F.lit(0).cast("long")
    return blocks.join(pa, "noun", "left").select(
        "noun",
        "n_names",
        F.coalesce("n_pairs", zero).alias("n_pairs"),
        F.coalesce("n_close_pairs", zero).alias("n_close_pairs"),
        F.coalesce("close_row_pairs", zero).alias("close_row_pairs"),
        "min_dist",
    )
