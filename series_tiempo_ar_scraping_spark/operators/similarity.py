"""Similarity search over embedding columns (BASELINE.json north-star).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries broadcast against the corpus; per-pair cosine is a higher-order
  ``zip_with`` + ``aggregate`` (JVM-side, no Python); ranking is a window
  per query. Linear in |corpus|×|queries| — right up to ~10⁴ queries.
- ``hyperplane_bucket``: random-hyperplane LSH (sign bits) — the scale
  path: bucket the corpus once, probe only matching buckets. Planes are
  deterministic ±1 vectors derived from md5 parity so the DuckDB oracle
  reproduces buckets exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def plane_coeffs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane coefficients: parity of md5("j:i")."""
    return [
        [
            1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with per-element double casts (cross-engine: both engines
    fold the products sequentially in array order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query (brute force).

    Output: (query_id, neighbor_id, rank, sim). Ranking key is
    (sim DESC, neighbor_id ASC) — total order, deterministic under ties.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def hyperplane_bucket(vec: Column, coeffs: list[list[int]]) -> Column:
    """LSH bucket id: bit j = sign(plane_j · vec). One projection."""
    bucket = F.lit(0)
    for j, plane in enumerate(coeffs):
        d = dot(vec, F.array(*[F.lit(float(c)) for c in plane]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def ann_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = N_PLANES, dim: int = 64) -> DataFrame:
    """Approximate top-k: probe only the query's bucket. Same output shape
    as ``cosine_topk`` (recall < 1 by construction — the scale/quality
    trade)."""
    coeffs = plane_coeffs(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), coeffs).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), coeffs).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
