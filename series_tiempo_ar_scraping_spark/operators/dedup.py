"""Deduplication operators (BASELINE.json north-star): exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design notes (these run over 100 TB document corpora):

- **exact**: one hash-groupBy — partial aggregation + AQE handle skew.
- **minhash_lsh**: the classic shingle→minhash→band→bucket-join pipeline.
  Cost is linear in (docs × shingles × K); the candidate join is an
  equi-join on band keys so only colliding docs ever meet — no O(n²).
- **simhash**: one projection per doc (no explode) producing a 32-bit
  signature; near-dup pairs via banded byte-prefix buckets + bit_count.
- **ngram_jaccard**: exact verification for candidate pairs (the stage
  after LSH) — array_intersect/array_union on shingle sets.

All hashing goes through md5-derived 60-bit ints (``stable_hash64``) so
the DuckDB oracles reproduce signatures bit-exactly; engine-native
xxhash64 would be faster but unverifiable cross-engine (swap-in is a
one-liner where verification isn't needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# MinHash configuration shared with the DuckDB oracle generator.
MINHASH_K = 12  # hash functions
MINHASH_BAND_ROWS = 3  # rows per band -> 4 bands

# Universal-hash family for MinHash: sig_i = (a_i*h + b_i) mod P over ONE
# md5-derived base hash per shingle — 1 md5 instead of K (the md5 is the
# expensive part; the multiply-add is nearly free and cross-engine exact).
# h is reduced mod 2^30 so a*h + b stays far below 2^63 in both Spark
# (Java long) and DuckDB (BIGINT, which errors on overflow).
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
MINHASH_H_MOD = 1 << 30
# Fixed odd multipliers / offsets (deterministic; no runtime randomness).
MINHASH_AB = [
    (1000003, 12345), (999983, 54321), (888887, 13579), (777773, 97531),
    (666667, 24680), (555557, 86420), (444443, 11111), (333331, 99999),
    (222223, 77777), (111119, 55555), (99991, 33333), (88799, 22222),
]
SIMHASH_BITS = 32


def hash64_seeded(col: Column, seed: int) -> Column:
    """Seeded 60-bit hash: md5 over 'seed|value' (cross-engine stable)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(str(seed)), F.lit("|"), col)), 1, 15),
        16,
        10,
    ).cast("bigint")


def upper_triangle_pairs(arr: Column, pair) -> Column:
    """All (arr[i], arr[j]) with i < j, as ONE array expression: for each
    element, pair it with the slice after it. ``pair(x, y)`` builds the
    output struct. The shared shape behind every bucket-pair generation
    in the repo (LSH candidates, SimHash near-pairs, market-basket
    co-occurrence, PageRank edge derivation) — group-collect + this
    expansion evaluates the upstream pipeline ONCE where a self-join
    would run it per side and shuffle twice."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)), lambda y: pair(x, y)
            ),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash: keep the min id per hash group."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       k: int = MINHASH_K) -> DataFrame:
    """Per-doc MinHash signature: explode shingles once, compute K seeded
    hashes per shingle row, min-aggregate back to one row per doc.

    One explode + one groupBy — shuffle keyed by doc id, well distributed.
    """
    from series_tiempo_ar_scraping_spark.operators.textops import (
        normalize_text,
        shingles_from_tokens,
        tokens,
    )

    # Materialize tokens, then shingles, in separate projections — inlining
    # the tokenizer into the shingle transform re-runs it per element
    # (see shingles_from_tokens docstring). The explode takes the shingle
    # EXPRESSION, not a projected attribute: exploding an attribute trips
    # InferFiltersFromGenerate (which skips expensive expression inputs,
    # SPARK-36715) and predicate pushdown then clones the whole
    # tokenize+shingle tree into per-row scan filters — measured 20× slower
    # at sf0.1. Explode-the-expression keeps the tree evaluated once.
    toked = df.select(
        F.col(id_col), tokens(normalize_text(F.col(text_col))).alias("_toks")
    )
    exploded = toked.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("_toks"), 3)).alias("shingle"),
    )
    return _minhash_from_exploded(exploded, id_col=id_col, k=k)


def minhash_signatures_from_shingles(
    sh: DataFrame,
    id_col: str = "doc_id",
    shingles_col: str = "shingles",
    k: int = MINHASH_K,
) -> DataFrame:
    """MinHash signatures from an already-MATERIALIZED shingle-array frame
    (cached or checkpointed — e.g. the LSH → exact-Jaccard pipeline, which
    tokenizes once and feeds both the signature stage and the verify join).

    Fully MAP-SIDE (r13): the base hash is one per-row array transform and
    each ``sig_i`` is ``array_min`` over the affine re-hash of that array —
    ZERO exchange, one codegen stage. The former explode + groupBy(id)
    shuffled a partial-aggregated n_docs×(k+1) frame and paid the two-phase
    hash aggregate just to compute per-row minima that never cross rows.
    Identical values: min over the same bigint multiset, and the explicit
    ``size > 0`` filter reproduces explode's drop-empty-docs row semantics.
    Only safe on materialized inputs: on a derived shingle column, filter
    pushdown would clone the whole tokenize+shingle tree into per-row scan
    predicates (see minhash_signatures, which keeps the explode form for
    exactly that reason).
    """
    harr = F.transform(
        F.col(shingles_col), lambda s: _mh_base_hash(s)
    )
    base = sh.filter(F.size(F.col(shingles_col)) > 0).select(
        F.col(id_col), harr.alias("_harr")
    )
    def _rehash_i(a: int, b: int):
        # closure factory, NOT a default-arg lambda: PySpark binds a
        # second lambda parameter to the ARRAY INDEX
        return lambda h: _mh_rehash(h, a, b)

    return base.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform(F.col("_harr"), _rehash_i(a, b))
            ).alias(f"sig{i}")
            for i, (a, b) in enumerate(MINHASH_AB[:k])
        ],
    )


def _mh_base_hash(shingle):
    """Per-shingle base hash — ONE definition for both signature paths
    (ADVICE r13): the array form (minhash_signatures_from_shingles) and
    the exploded form (minhash_signatures / _minhash_from_exploded)
    must stay bit-identical or LSH banding and the incremental
    new-vs-index matcher silently lose candidate recall."""
    return hash64_seeded(shingle, 0) % MINHASH_H_MOD


def _mh_rehash(h, a: int, b: int):
    """The i-th affine re-hash — shared by both paths (see above)."""
    return (F.lit(a) * h + F.lit(b)) % MINHASH_P


def _minhash_from_exploded(
    exploded: DataFrame, id_col: str, k: int
) -> DataFrame:
    base = exploded.select(
        id_col, _mh_base_hash(F.col("shingle")).alias("_h")
    )
    hashed = base.select(
        id_col,
        *[
            _mh_rehash(F.col("_h"), a, b).alias(f"h{i}")
            for i, (a, b) in enumerate(MINHASH_AB[:k])
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"sig{i}") for i in range(k)]
    )


def band_signatures(signatures: DataFrame, id_col: str = "doc_id",
                    k: int = MINHASH_K,
                    band_rows: int = MINHASH_BAND_ROWS) -> DataFrame:
    """Explode a signature frame into (id, band_idx, band_key) rows — the
    LSH bucket keys. Shared by the self-join candidate generator and the
    incremental new-vs-index matcher."""
    n_bands = k // band_rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"sig{b * band_rows + r}").cast("string")
                        for r in range(band_rows)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(
        id_col,
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        k: int = MINHASH_K, band_rows: int = MINHASH_BAND_ROWS) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing ≥1 band.

    Self-equi-join on (band_idx, band_key): only bucket collisions join —
    the property that makes MinHash-LSH subquadratic at corpus scale.
    """
    banded = band_signatures(signatures, id_col=id_col, k=k,
                             band_rows=band_rows)
    # groupBy-bucket + in-bucket pair expansion instead of a self-join: the
    # signature pipeline is evaluated ONCE (a self-join would recompute it
    # per side), and pair generation is an array expression over each
    # bucket's member list. Buckets are tiny by construction; a pathological
    # mega-bucket (all-identical docs) should be capped upstream by exact
    # dedup first.
    buckets = banded.groupBy("band_idx", "band_key").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("ids")
    ).filter(F.size("ids") > 1)
    pairs = buckets.select(
        F.explode(
            upper_triangle_pairs(
                F.col("ids"),
                lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def incremental_match_candidates(
    new_sigs: DataFrame,
    index_sigs: DataFrame,
    new_id: str = "new_id",
    index_id: str = "doc_id",
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """LSH candidates for a NEW batch against an existing INDEX: band both
    sides and equi-join on (band_idx, band_key), new side driving.

    This is the incremental-ingest shape at corpus scale — the index is
    never self-joined (its banded form is a materialized store in a real
    deployment; here it is derived in-plan), so per-cycle cost scales with
    the new batch, not the corpus. Output: distinct (new_id, index_id)
    collision pairs, to be verified by exact Jaccard."""
    bn = band_signatures(new_sigs, id_col=new_id, k=k, band_rows=band_rows)
    bi = band_signatures(index_sigs, id_col=index_id, k=k,
                         band_rows=band_rows)
    return (
        bn.join(bi, ["band_idx", "band_key"])
        .select(new_id, index_id)
        .distinct()
    )


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard over shingle arrays (LSH verification stage)."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(F.array_union(shingles_a, shingles_b))
    return inter.cast("double") / F.greatest(union, F.lit(1))


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash",
                 bits: int = SIMHASH_BITS) -> DataFrame:
    """DataFrame-level SimHash: materializes (distinct tokens, then their
    hashes) before the 32 per-bit aggregates — the hash of each token is
    computed once, not once per bit."""
    from series_tiempo_ar_scraping_spark.operators.textops import (
        normalize_text,
        tokens,
    )

    toked = df.withColumn(
        "_dtoks", F.array_distinct(tokens(normalize_text(F.col(text_col))))
    ).withColumn("_thashes", F.transform(F.col("_dtoks"), lambda t: hash64_seeded(t, 0)))
    out = toked.withColumn(out_col, simhash_from_hashes(F.col("_thashes"), bits))
    return out.drop("_dtoks", "_thashes")


def simhash_from_hashes(thashes: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash from a materialized token-hash array column: per bit j,
    sign of Σ ±1 by bit j of each hash (higher-order aggregate, no
    explode)."""
    bit_cols = []
    for j in range(bits):
        vote = F.aggregate(
            thashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        bit_cols.append(
            F.when(vote >= 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Single-expression SimHash — convenience form; hot paths should use
    ``with_simhash`` (materializes token hashes once instead of re-hashing
    per bit)."""
    from series_tiempo_ar_scraping_spark.operators.textops import (
        normalize_text,
        tokens,
    )

    toks = F.array_distinct(tokens(normalize_text(text)))
    bit_cols = []
    for j in range(bits):
        vote = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                hash64_seeded(t, 0).bitwiseAND(F.lit(1 << j)) != 0, F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        bit_cols.append(
            F.when(vote >= 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       sim_col: str = "simhash", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: byte-banded buckets (any shared byte of
    the signature → candidate), then exact hamming via bit_count(xor).
    4 bands of 8 bits ⇒ any pair within hamming ≤ 3 shares ≥1 intact byte
    whenever the 3 flips hit ≤3 distinct bands (pigeonhole guarantees a
    clean band for ≤3 flips over 4 bands)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col(sim_col), 8 * b)
                .bitwiseAND(F.lit(255))
                .alias("band_key"),
            )
            for b in range(4)
        ]
    )
    banded = df.select(F.col(id_col), F.col(sim_col), F.explode(bands).alias("band")).select(
        id_col, sim_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )
    # Same single-evaluation bucket expansion as lsh_candidate_pairs: the
    # signature pipeline (32 per-bit aggregates) must not run once per
    # self-join side.
    buckets = banded.groupBy("band_idx", "band_key").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(id_col).alias("id"), F.col(sim_col).alias("sig")))
        ).alias("members")
    ).filter(F.size("members") > 1)
    pairs = buckets.select(
        F.explode(
            upper_triangle_pairs(
                F.col("members"),
                lambda x, y: F.struct(
                    x["id"].alias("doc_a"),
                    y["id"].alias("doc_b"),
                    F.bit_count(x["sig"].bitwiseXOR(y["sig"])).alias(
                        "hamming"
                    ),
                ),
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.hamming").distinct()
    return pairs.filter(F.col("hamming") <= max_hamming)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over the near-dup pair graph by iterative
    min-label propagation: every node starts labeled with its own id; each
    round every node takes the min of its label and its neighbors' labels;
    stop when no label changes. Returns ``(id_col, component_id)`` — the
    component id is the minimum node id in the component, so "keep one
    representative per duplicate cluster" is ``component_id == id``.

    Scale posture: each round is one shuffle (edge-label join + min-agg),
    and ``localCheckpoint`` truncates lineage so plan size stays O(1) in
    rounds instead of O(iterations). Convergence is O(graph diameter) —
    near-dup clusters are tiny/star-shaped (diameter ≤ ~3), so 3-4 rounds
    in practice. For adversarial long-chain graphs at 100 TB, swap the
    propagation step for large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond"), which converges in O(log n)
    rounds with the same join-agg building blocks.

    Parity anchor: the reference has no graph ops (SURVEY §2.4); this is a
    training-data-pipeline extension (dedup cluster collapse).
    """
    # Checkpoint the edge list BEFORE symmetrizing: the union of a frame
    # with its column-swap evaluates the (possibly expensive — LSH+Jaccard)
    # edge pipeline once per branch, so materialize it first and build the
    # reversal from the checkpointed RDD.
    # lazy (r13): round 1's fingerprint job materializes e inside the
    # round — best-effort dedup via the persisted RDD (ADVICE r13: the
    # two union branches are independent stages, so the scheduler MAY
    # start both before the persisted blocks land and re-run parts of
    # the edge pipeline; values are deterministic, so this is a
    # variance risk only, and it measured cheaper than the eager
    # form's synchronous up-front materialization job).
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("comp")
    ).localCheckpoint(eager=False)

    # Convergence detection without a compare join: a round changed some
    # label iff the multiset of (id, comp) pairs changed, which a
    # hash-sum fingerprint detects (w.h.p.) with one tiny aggregate per
    # round. Hashing — not SUM(comp) — keeps this correct for string ids.
    def fingerprint(df: DataFrame):
        return df.agg(
            F.sum(F.xxhash64("id", "comp").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_fp = fingerprint(labels)
    for _ in range(max_iter):
        # One round = one join (edge × label) + one union + one min-agg:
        # each node keeps its own label via the union branch, so no
        # second join is needed to merge neighbor minima back in.
        contrib = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "comp"
        )
        # eager=False: the fingerprint aggregate below is the action that
        # materializes the checkpoint — one pass per round, not two.
        labels = (
            labels.unionByName(contrib)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_fp = fingerprint(labels)
        if new_fp == prev_fp:
            break
        prev_fp = new_fp
    return labels.select(F.col("id").alias(id_col), F.col("comp").alias("component_id"))


# Frontier size (edge rows) below which a CC-star round runs in ONE
# partition: every exchange disappears from the round plan (SinglePartition
# satisfies all clustering requirements) and the round fuses to one stage.
# 128k narrow rows sort in ~0.1 s in a single task (measured: at ~1M rows
# the serial round already loses to the distributed one); graphs above the
# threshold keep the fully distributed plan.
CC_LOCAL_EDGE_ROWS = 128_000


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-round algorithm ``connected_components``'s
    docstring names as the swap-in for adversarial graphs.

    Min-label propagation converges in O(diameter) rounds: near-dup
    clusters (diameter ≤ ~3) finish in 3-4, but a path graph needs as
    many rounds as it is long — a 10^6-node chain at 100 TB would mean
    10^6 shuffles. L*/S* contracts chains exponentially:

    - **large-star**: every node links its *larger* neighbors to the
      minimum of its closed neighborhood;
    - **small-star**: every node links its *smaller-or-equal* neighbors
      (and itself) to that minimum.

    Each round is two window-min edge-rewrite passes over the edge
    list (same relational building blocks as everything else — no RDDs,
    no custom partitioner); the fixpoint is a star per component rooted
    at its minimum node id. Output contract is identical to
    ``connected_components``: ``(id_col, component_id)`` where
    component_id = min node id in the component.

    Convergence detection: the small-star output is already canonical —
    every emitted edge satisfies child > parent (both branches point a
    node at a closed-neighborhood MINIMUM, and the = case is filtered),
    and the round ends with a distinct — so an unchanged
    (count, xxhash-sum) fingerprint means fixpoint — one tiny aggregate,
    no set-compare join, and no separate canonicalize pass (r13: the
    former greatest/least + distinct re-canonicalization was a provable
    identity costing one full exchange + dedup per round; dropped).
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("child"),
            F.least("a", "b").alias("parent"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(
                F.xxhash64("child", "parent").cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    prev = fingerprint(e)
    for _ in range(max_iter):
        # Small-frontier local mode (r13, guide §2.1/§2.4): once the
        # surviving edge count (known for free from the convergence
        # fingerprint) fits one partition, narrow-coalesce each round's
        # unions to a single partition. SinglePartition satisfies every
        # clustering requirement, so the window mins and the distinct
        # all plan WITHOUT exchanges and the whole round fuses into one
        # stage — the shrinking CC tail stops paying per-round shuffle
        # latency. Size-derived, not core-count-derived: big graphs
        # keep the distributed plan; only frontiers under
        # CC_LOCAL_EDGE_ROWS (1M edges) flip, on a 100 TB cluster the
        # same way as locally.
        local = prev[0] is not None and prev[0] <= CC_LOCAL_EDGE_ROWS

        def _narrow(df: DataFrame, local=local) -> DataFrame:
            return df.coalesce(1) if local else df

        # ---- large-star: for each node u, m = min(N(u) ∪ {u}); emit
        # (v, m) for every neighbor v > u. The per-neighborhood minimum
        # is a WINDOW min over the symmetrized edge frame (r13, guide
        # §2.4): the former groupBy-min + self-join re-shuffled the same
        # frame twice per star (agg exchange + join exchange); the
        # unordered window computes m in the single exchange's sorted
        # run, so each star costs ONE exchange instead of two. The
        # emitted (child, parent) multiset is identical — m is the same
        # per-u minimum either way. Symmetrization is a map-side
        # explode of the two orientations, not a self-union: one scan,
        # and no duplicated upstream subtree in the single-partition
        # regime (a union's branches cannot share a ReusedExchange once
        # the exchanges are gone).
        sym = _narrow(
            e.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("child").alias("u"),
                            F.col("parent").alias("v"),
                        ),
                        F.struct(
                            F.col("parent").alias("u"),
                            F.col("child").alias("v"),
                        ),
                    )
                ).alias("uv")
            ).select("uv.u", "uv.v")
        )
        wu = Window.partitionBy("u")
        ls = (
            sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("child"), F.col("m").alias("parent"))
            .filter(F.col("child") != F.col("parent"))
        )
        # ---- small-star over the large-star output: edges point child →
        # smaller parent; for each child u, m = min(parents ∪ {u}); emit
        # (v, m) for every parent v and for u itself — both rows explode
        # map-side out of the SAME window row (the self-edge lands once
        # per ls row; duplicates are absorbed by the round-ending
        # distinct, which the fingerprint and the returned frame read
        # after).
        wc = Window.partitionBy("child")
        ss = (
            ls.withColumn(
                "m", F.least(F.min("parent").over(wc), F.col("child"))
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("parent").alias("child"),
                            F.col("m").alias("parent"),
                        ),
                        F.struct(
                            F.col("child").alias("child"),
                            F.col("m").alias("parent"),
                        ),
                    )
                ).alias("cp")
            )
            .select("cp.child", "cp.parent")
            .filter(F.col("child") != F.col("parent"))
            .distinct()
        )
        # Small-star output is already canonical (child > parent, distinct
        # — see docstring), so checkpoint it directly. eager=False: the
        # fingerprint aggregate below is the action that materializes the
        # checkpoint — one pass over the round's result, not two (the
        # same pattern min-label CC uses).
        e = ss.localCheckpoint(eager=False)
        cur = fingerprint(e)
        if cur == prev:
            break
        prev = cur

    ids = nodes.select(F.col(id_col).alias("id"))
    parent_map = e.groupBy("child").agg(F.min("parent").alias("parent"))
    return ids.join(
        parent_map, ids["id"] == parent_map["child"], "left"
    ).select(
        F.col("id").alias(id_col),
        F.coalesce("parent", "id").alias("component_id"),
    )
