"""Batch-9 queries (round 7): PNG real-decode and the composed
corpus-curation pipeline.

Reference parity notes: the reference engine (datosgobar
series-tiempo-ar-scraping) has no image path — the PNG entry extends the
multimodal surface mandated by the build brief (decode/feature-extract
as Arrow-batched kernels); the curation pipeline composes the quality
funnel, exact+LSH dedup, decontamination, and sequence packing stages
that individually mirror reference-style catalog hygiene
(``scrapers_test.py``-style validation chains) into the single nightly
shape a training-data corpus actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.queries import (
    load_table,
    register,
)


@register(
    "multimodal_png_stats",
    oracle="""
    SELECT media_id, width, height, mean_luma FROM (
      SELECT doc_id AS media_id,
             CAST(1 + doc_id % 7 AS INT) AS width,
             CAST(1 + doc_id % 5 AS INT) AS height,
             SUM(CAST((doc_id + 3 * x + 5 * y + 11 * c) % 256 AS DOUBLE))
               / ((1 + doc_id % 7) * (1 + doc_id % 5) * 3) AS mean_luma
      FROM documents,
           LATERAL (SELECT unnest(generate_series(
               0, CAST(doc_id % 7 AS BIGINT))) AS x) gx,
           LATERAL (SELECT unnest(generate_series(
               0, CAST(doc_id % 5 AS BIGINT))) AS y) gy,
           LATERAL (SELECT unnest(generate_series(0, 2)) AS c) gc
      GROUP BY doc_id
    )
    """,
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format decode, hash-oracled: synthesize a
    deterministic gradient PNG per document (pixel (y,x,c) =
    (doc_id + 3x + 5y + 11c) % 256, scanline filter = doc_id % 5 so the
    corpus hits every PNG predictor — None/Sub/Up/Average/Paeth), then
    decode through the stdlib zlib codec (chunk CRC verify → IDAT
    inflate → per-row unfilter) and report actual width/height and the
    mean over all RGB bytes. The oracle restates the gradient in closed
    form via a 3-way LATERAL expansion, so any chunk/filter/stride bug
    in either codec direction breaks the hash. The byte sum is an exact
    integer in float64 (≤ 255·105 per image) and both engines divide the
    same two doubles, so the mean matches bit-for-bit. Map-only end to
    end: generate → decode → project, zero shuffles at any scale."""
    from series_tiempo_ar_scraping_spark.operators.multimodal import (
        image_stats,
        synthesize_png_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    return image_stats(synthesize_png_media(docs)).select(
        "media_id", "width", "height", "mean_luma"
    )
