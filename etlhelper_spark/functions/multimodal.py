"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition-sized Arrow batches,
mapInPandas signatures, metadata structs — is real and tested. The
actual media decode (PIL/ffmpeg/librosa) is NOT available in this
container, so the decode kernels are stubbed: ``decode_stub=True``
(default) produces deterministic fake features derived from the bytes;
``decode_stub=False`` raises NotImplementedError at the point where a
real decoder library would be imported.

At 100 TB the pattern is: binary parquet columns read with
``spark.sql.files.maxPartitionBytes`` sized so one task holds a few
hundred media blobs; feature extraction runs per Arrow batch via
mapInPandas; outputs are compact numeric/array columns so downstream
joins never move the blobs again.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical schema for a multimodal asset table
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("content_sha", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def attach_binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata that never decodes the blob: byte length
    and a content hash for exact dedup of assets."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def read_media_dir(
    spark, path: str, glob: str | None = None, recursive: bool = True
) -> DataFrame:
    """Ingest a directory of media files via Spark's built-in
    ``binaryFile`` source — the real on-ramp for image/audio corpora:
    each file becomes (path, modificationTime, length, content) with
    the blob as a BinaryType column, split across tasks by file (no
    driver-side listing loop, no Python IO). ``glob`` maps to
    pathGlobFilter (e.g. ``*.jpg``) so filtering happens at listing
    time, before any bytes move. Exact-dedup metadata (sha256, size)
    is attached JVM-side; decode/feature stages chain the same
    mapInPandas operators used by the synthesized-asset path."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return attach_binary_metadata(reader.load(path))


def _fake_features(content: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real embedding: md5-seeded floats.
    Exists so the distributed plumbing is testable without media libs."""
    digest = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in digest[:n]]


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    decode_stub: bool = True,
    batch_feature_dim: int = 8,
) -> DataFrame:
    """Per-asset feature extraction over Arrow batches (mapInPandas).

    Stub mode computes deterministic md5-derived pseudo-features;
    real mode is the integration point for PIL/librosa/ffmpeg decoders
    (not installed here) and raises NotImplementedError.
    """
    if not decode_stub:
        raise NotImplementedError(
            "Real media decoding requires PIL/librosa/ffmpeg, which are "
            "not available in this environment. Use decode_stub=True; "
            "the Spark plumbing (schema, batching, UDF signature) is "
            "identical for a real decoder."
        )

    import pandas as pd

    from .util import ensure_parallelism

    df = ensure_parallelism(df)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "content_sha": [
                        hashlib.sha256(c or b"").hexdigest() for c in pdf[content_col]
                    ],
                    "n_bytes": [len(c or b"") for c in pdf[content_col]],
                    "features": [
                        _fake_features(c, batch_feature_dim)
                        for c in pdf[content_col]
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary assets so the
    multimodal path has real data to run over in this environment."""
    return df.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit("utf-8").alias("codec"),
        ).alias("meta"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ms", LongType(), True),
        StructField("frame_bytes", BinaryType(), True),
    ]
)

CHUNK_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("start_ms", LongType(), True),
        StructField("end_ms", LongType(), True),
        StructField("chunk_bytes", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame at a
    fixed temporal stride, driven by ``meta.duration_ms``.

    The 1→N row expansion, frame addressing, and Arrow batch shapes
    are the real production machinery; the frame EXTRACTION is stubbed
    (deterministic byte slices standing in for ffmpeg seeks).  At
    100 TB the stride bounds output rows to Σ duration/stride
    regardless of codec, and blobs never shuffle — frames are emitted
    in the same task that holds the parent asset."""
    if not decode_stub:
        raise NotImplementedError(
            "Real frame extraction requires ffmpeg/PyAV, not available "
            "in this environment. Use decode_stub=True; the plumbing "
            "(schema, 1->N expansion, batching) is identical."
        )

    import pandas as pd

    from .util import ensure_parallelism

    df = ensure_parallelism(df)

    def run(batches):
        for pdf in batches:
            rows = {
                "asset_id": [],
                "frame_idx": [],
                "frame_ms": [],
                "frame_bytes": [],
            }
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                blob = content or b""
                duration = (meta or {}).get("duration_ms") or 0
                n_frames = max(int(duration // every_ms), 1)
                for i in range(n_frames):
                    lo = (i * len(blob)) // n_frames
                    hi = ((i + 1) * len(blob)) // n_frames
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(i * every_ms)
                    rows["frame_bytes"].append(blob[lo:hi])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, FRAME_SCHEMA)


def chunk_audio(
    df: DataFrame,
    chunk_ms: int = 5000,
    decode_stub: bool = True,
) -> DataFrame:
    """Audio chunking plumbing: fixed-duration windows addressed as
    (asset_id, chunk_idx, start_ms, end_ms), byte ranges proportional
    to time (the constant-bitrate approximation a real resampler
    replaces).  Same stub contract as sample_frames."""
    if not decode_stub:
        raise NotImplementedError(
            "Real audio decoding requires librosa/soundfile, not "
            "available in this environment. Use decode_stub=True."
        )

    import pandas as pd

    from .util import ensure_parallelism

    df = ensure_parallelism(df)

    def run(batches):
        for pdf in batches:
            rows = {
                "asset_id": [],
                "chunk_idx": [],
                "start_ms": [],
                "end_ms": [],
                "chunk_bytes": [],
            }
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                blob = content or b""
                duration = (meta or {}).get("duration_ms") or 0
                n_chunks = max(-(-int(duration) // chunk_ms), 1)
                for i in range(n_chunks):
                    lo = (i * len(blob)) // n_chunks
                    hi = ((i + 1) * len(blob)) // n_chunks
                    rows["asset_id"].append(aid)
                    rows["chunk_idx"].append(i)
                    rows["start_ms"].append(i * chunk_ms)
                    rows["end_ms"].append(min((i + 1) * chunk_ms, duration))
                    rows["chunk_bytes"].append(blob[lo:hi])
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, CHUNK_SCHEMA)
