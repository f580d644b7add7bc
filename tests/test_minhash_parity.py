"""ADVICE r13: the two live MinHash signature paths — the map-side
array form and the explode+groupBy form — must produce bit-identical
signatures on the same input, or LSH banding and the incremental
new-vs-index matcher silently lose candidate recall.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import series_tiempo_ar_scraping_spark.operators.dedup as D


def test_signature_paths_bit_identical(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "pack my box with five dozen liquor jugs tonight ok"),
            (3, "the quick brown fox jumps over the lazy dog again"),
            (4, "short doc"),
        ],
        ["doc_id", "text"],
    )
    via_text = {
        r["doc_id"]: tuple(r[f"sig{i}"] for i in range(D.MINHASH_K))
        for r in D.minhash_signatures(docs).collect()
    }
    from series_tiempo_ar_scraping_spark.operators.textops import (
        normalize_text,
        shingles_from_tokens,
        tokens,
    )

    sh = docs.select(
        "doc_id",
        shingles_from_tokens(
            tokens(normalize_text(F.col("text"))), 3
        ).alias("shingles"),
    )
    via_array = {
        r["doc_id"]: tuple(r[f"sig{i}"] for i in range(D.MINHASH_K))
        for r in D.minhash_signatures_from_shingles(sh).collect()
    }
    assert via_text == via_array
    assert via_text[1] == via_text[3]  # identical docs, identical sigs
