"""Multimodal column plumbing (BASELINE.json north-star).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas functions over ``mapInPandas`` — the only sane shape at
100 TB (per-batch Python, columnar transfer, no per-row pickling).

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernel is stubbed: ``decode_stub=True`` computes deterministic fake
features (byte length, md5-based checksum, fake dims) and the real-decode
branch raises ``NotImplementedError`` behind an import gate. Everything
Spark-side — schema, batching, partitioning, UDF signature — is real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat_width", T.IntegerType()),
        T.StructField("feat_height", T.IntegerType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/bench: wrap the documents table's text as binary
    payloads with synthesized kinds — exercising the exact schema a real
    media table would have."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract over Arrow batches.

    Real decoding needs codec libs (gated); the stub path computes
    deterministic features so the distributed plumbing is testable.
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real media decode requires codec libraries not in "
                        "this container; run with decode_stub=True"
                    ) from exc
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    # fake dims derived from the checksum — stable stand-in
                    # for decoded width/height
                    "feat_width": pdf["content"]
                    .map(lambda b: 1 + int(hashlib.md5(b).hexdigest()[:4], 16) % 4096)
                    .astype("int32"),
                    "feat_height": pdf["content"]
                    .map(lambda b: 1 + int(hashlib.md5(b).hexdigest()[4:8], 16) % 4096)
                    .astype("int32"),
                }
            )
            yield out

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(media: DataFrame, max_dim: int = 512,
                 decode_stub: bool = True) -> DataFrame:
    """Resize kernel: cap the longer edge at ``max_dim`` preserving aspect.

    Stub path: dimensions come from the deterministic fake decode
    (checksum-derived, same values ``extract_features`` reports) and are
    rescaled arithmetically; content passes through untouched. Real path
    (PIL) is import-gated. The Spark shape — mapInPandas projection,
    binary in/out, no shuffle — is the real contract.
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real resize requires codec libraries not in this "
                        "container; run with decode_stub=True"
                    ) from exc
            digests = pdf["content"].map(lambda b: hashlib.md5(b).hexdigest())
            w = digests.map(lambda d: 1 + int(d[:4], 16) % 4096)
            h = digests.map(lambda d: 1 + int(d[4:8], 16) % 4096)
            scale = (max_dim / pd.concat([w, h], axis=1).max(axis=1)).clip(
                upper=1.0
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": pdf["content"],
                    "width": (w * scale).map(lambda v: max(1, int(v))).astype("int32"),
                    "height": (h * scale).map(lambda v: max(1, int(v))).astype("int32"),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  decode_stub: bool = True) -> DataFrame:
    """Frame sampling: one output row per sampled frame of each video —
    a fan-out (flatMap) kernel, the batch shape that matters: a 2-hour
    video row becomes ~7200 frame rows inside one Arrow batch stream, no
    driver involvement, no shuffle until someone aggregates.

    Stub: duration is ``meta.duration_ms`` when present else derived from
    byte length; frame checksums are md5(content ∥ frame_idx).
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                try:
                    import av  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg bindings not "
                        "in this container; run with decode_stub=True"
                    ) from exc
            import numpy as np

            dur = pdf["duration_ms"].to_numpy(dtype="float64", na_value=np.nan)
            lens = pdf["content"].map(len).to_numpy(dtype="int64")
            dur = np.where(np.isnan(dur), 1 + (lens % 10) * every_ms, dur)
            n_frames = ((dur - 1) // every_ms).astype("int64") + 1
            bases = pdf["content"].map(
                lambda b: hashlib.md5(b).hexdigest()
            ).to_numpy()
            # vectorized fan-out: repeat row attrs, tile frame indices
            media_ids = np.repeat(pdf["media_id"].to_numpy(), n_frames)
            rep_bases = np.repeat(bases, n_frames)
            idx = np.concatenate(
                [np.arange(n) for n in n_frames]
            ) if len(n_frames) else np.array([], dtype="int64")
            checks = [
                hashlib.md5(f"{b}:{i}".encode()).hexdigest()
                for b, i in zip(rep_bases, idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_ids,
                    "frame_idx": idx.astype("int32"),
                    "ts_ms": (idx * every_ms).astype("int32"),
                    "frame_checksum": checks,
                }
            )

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.mapInPandas(run, FRAMES_SCHEMA)
