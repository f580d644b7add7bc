"""Batch-52 query: the ESCALATED dedup census as an oracled catalog
entry (VERDICT r12 #7 depth item).

Round 13 made ``blocking="auto"`` the registered default of the
cell-blocked kernels: past n ≥ 2·target_cell² (125k vectors) they ride
the two-level codebook instead of the flat adaptive-K one. Below the
crossover the flat oracle pins them; ABOVE it the blocking structure
the fleet actually rides had, until this entry, only two pytest
signals — the coarse_k=1 row-for-row identity (which exercises a
degenerate coarse split) and the census invariants at coarse_k=4
(which don't pin values). This entry hash-pins the full escalated
census at the kernel's real escalation shape (coarse_k=8, the auto
path's default): every packed (coarse, fine) cell's member count,
candidate-pair count, near-pair count, dup count and survivor count
against a DuckDB oracle that chains the flat coarse Lloyd CTEs into
the grouped fine Lloyd CTEs and re-runs the same upper-triangle
census over the packed key. A bug in the coarse pass, the group
handoff, the per-group sizing, the key packing, or the census logic
breaks the hash — at every fixture scale, not just above 125k rows.

Reference parity: none (LLM-pipeline scale structure, not a reference
operator); the semantics are ``semantic_cluster_dedup``'s census over
``two_level_codebook``'s blocking key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from series_tiempo_ar_scraping_spark.queries import ORACLES, register
from series_tiempo_ar_scraping_spark.sqlfrags import (
    _COS64_SQL,
    _EMB_NEAR_SQL,
    _kmeans_ctes,
    _kmeans_grouped_ctes,
)

_B52_COARSE_K = 8
_B52_ITERS = 2


@register("semantic_cluster_dedup_two_level", oracle=None)
def semantic_cluster_dedup_two_level(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The escalation path of ``semantic_cluster_dedup`` as its own
    hash-oracled entry: the near-dup census blocked by the TWO-LEVEL
    codebook at the auto default's real shape (coarse_k=8, 2 Lloyd
    rounds per level, fine k_g = max(2, ⌈n_cell/250⌉) by window
    count), cell key = coarse_cid·2³² + fine_cid. Exactly the frame a
    fleet user gets from the registered kernel once the corpus passes
    ``similarity.TWO_LEVEL_CROSSOVER`` — pinned by value at the
    fixture scales so the escalated dataflow carries the same oracle
    signal as the flat one.

    Scale shape: identical to the kernel's escalation branch — coarse
    pass n·8 against a broadcast 8-row codebook, fine training/
    assignment an equi-join on the coarse id (never a corpus-sized
    broadcast), pair work confined to (coarse, fine) cells,
    upper-triangled. Pure bigint counts cross the engine boundary."""
    from series_tiempo_ar_scraping_spark.queries_batch11 import (
        semantic_cluster_dedup,
    )

    return semantic_cluster_dedup(
        spark, sf_dir, blocking="two_level", coarse_k=_B52_COARSE_K
    )


_COS = _COS64_SQL

ORACLES["semantic_cluster_dedup_two_level"] = f"""
    WITH corpus AS ({_EMB_NEAR_SQL}),
    {_kmeans_ctes(_B52_COARSE_K, _B52_ITERS, src="corpus")},
    {_kmeans_grouped_ctes(
        iters=_B52_ITERS,
        src=f"(SELECT cid AS gid, vid, xi FROM assign{_B52_ITERS - 1})",
    )},
    packed AS (
      SELECT vid,
             gid * 4294967296 + cid AS cid
      FROM gassign{_B52_ITERS - 1}
    ),
    mem AS (
      SELECT p.vid, p.cid, c.embedding
      FROM packed p JOIN corpus c ON c.vec_id = p.vid
    ),
    pairs AS (
      SELECT x.cid, y.vid AS kb,
             {_COS.format(a='x.embedding', b='y.embedding')} AS sim
      FROM mem x JOIN mem y ON x.cid = y.cid AND x.vid < y.vid
    ),
    agg AS (
      SELECT cid,
             CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
             CAST(SUM(CASE WHEN sim >= 0.95 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_near_pairs,
             CAST(COUNT(DISTINCT CASE WHEN sim >= 0.95 THEN kb END)
                  AS BIGINT) AS n_dups
      FROM pairs GROUP BY 1
    ),
    sizes AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM packed GROUP BY 1
    )
    SELECT s.cid, s.n_members,
           COALESCE(g.n_cand_pairs, 0) AS n_cand_pairs,
           COALESCE(g.n_near_pairs, 0) AS n_near_pairs,
           COALESCE(g.n_dups, 0) AS n_dups,
           s.n_members - COALESCE(g.n_dups, 0) AS n_survivors
    FROM sizes s LEFT JOIN agg g USING (cid)
"""
