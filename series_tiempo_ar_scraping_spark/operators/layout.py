"""Physical-layout operators: Z-order clustering for data skipping.

At 100 TB the fastest scan is the one that never happens: parquet
min/max footer stats (and any engine's file-level zone maps) prune files
whose value range can't match a predicate — but only if the *layout*
gives each file a tight range. A sort on one column gives perfect
locality on that column and none on any other; a Z-order (Morton) sort
interleaves the bits of several columns so every file covers a small
hyper-rectangle in ALL of them, and multi-dimensional predicates skip
proportionally. This module computes Z-values as pure Catalyst
expressions (bit shifts/masks — JVM-side, codegen-friendly, no UDF) and
writes range-partitioned, sorted parquet; `parquet_file_spans` reads the
footers back so tests can measure the locality the layout actually
achieved.

Reference scope note: the reference materializes plain per-distribution
CSVs (base.py:266-279) and never addresses layout — this is one of the
engine-side extensions that only matters at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension; 2 dims -> 32-bit Z-values


def scale_to_grid(col: Column, cmin: Column, cmax: Column,
                  bits: int = ZBITS) -> Column:
    """Map a value into the integer grid [0, 2^bits) by min-max scaling.

    All arithmetic is IEEE double (subtract, multiply, divide, floor) —
    each step correctly rounded, so any engine computing the same tree
    gets bit-identical grid cells; a constant column degenerates to 0.
    """
    top = F.lit(float(2 ** bits - 1))
    scaled = F.floor((col - cmin) * top / (cmax - cmin)).cast("long")
    return F.when(cmax == cmin, F.lit(0).cast("long")).otherwise(scaled)


def interleave_bits(zx: Column, zy: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two grid coordinates: x's bit i lands at 2i+1,
    y's at 2i. Built as a sum of disjoint single-bit terms (addition ==
    OR when no bits collide), one flat codegen-able expression."""
    total: Column | None = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(zx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        yb = F.shiftleft(F.shiftright(zy, i).bitwiseAND(F.lit(1)), 2 * i)
        term = xb + yb
        total = term if total is None else total + term
    assert total is not None
    return total


def interleave_bits_sql(zx: str, zy: str, bits: int = ZBITS) -> str:
    """The identical Morton interleave as ANSI SQL (for oracles)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({zx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({zy} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def with_zvalue(df: DataFrame, xcol: Column, ycol: Column,
                bits: int = ZBITS, out: str = "zv") -> DataFrame:
    """Add a Z-value column over two dimensions. Global min/max come from
    ONE 1-row aggregate broadcast-joined back — no window over the fact
    table, no driver round-trip; the scan stays a single pass."""
    bounds = df.agg(
        F.min(xcol).alias("_xmin"), F.max(xcol).alias("_xmax"),
        F.min(ycol).alias("_ymin"), F.max(ycol).alias("_ymax"),
    )
    joined = df.crossJoin(F.broadcast(bounds))
    zx = scale_to_grid(xcol, F.col("_xmin"), F.col("_xmax"), bits)
    zy = scale_to_grid(ycol, F.col("_ymin"), F.col("_ymax"), bits)
    return joined.withColumn(out, interleave_bits(zx, zy, bits)).drop(
        "_xmin", "_xmax", "_ymin", "_ymax"
    )


def write_zordered(df: DataFrame, path: str, n_files: int,
                   zcol: str = "zv") -> None:
    """Range-partition on the Z-value and sort within partitions, so each
    output file covers one contiguous Z-interval — a bounded rectangle in
    every interleaved dimension. One shuffle (the range exchange), one
    write job; `n_files` maps to cluster parallelism, not driver loops."""
    (
        df.repartitionByRange(n_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def parquet_file_spans(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per-file (min, max) footer statistics for the given columns — the
    exact information a scan's file-pruning consults. Test/diagnostic
    helper (driver-side listing; the data files are never read)."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        lo: dict[str, object] = {}
        hi: dict[str, object] = {}
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                st = col.statistics
                if st.min is not None:
                    lo[name] = st.min if name not in lo else min(lo[name], st.min)
                if st.max is not None:
                    hi[name] = st.max if name not in hi else max(hi[name], st.max)
        spans.append({c: (lo.get(c), hi.get(c)) for c in cols})
    return spans


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` hash-bucketed AND sorted by ``key`` as an external
    table — the co-location layout for repeat joins: two tables bucketed
    the same way on the join key sort-merge-join with NO exchange on
    either side (pinned by tests/test_layout.py), turning the nightly
    fact-to-fact join's dominant shuffle into a map-side merge. The
    write pays one clustering pass; every subsequent join of either
    table on ``key`` rides it. 100 TB: bucket count maps to join
    parallelism — pick it once, corpus-wide, so all co-bucketed tables
    align (Spark requires equal counts to elide both exchanges).

    The pre-write ``repartition(n_buckets, key)`` matters: without it
    every input task writes its own file per bucket, which voids the
    ``sortBy`` metadata (sorted-bucket reads require exactly ONE file
    per bucket) and sprays P x n_buckets small files."""
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )
