"""X5 — multimodal (image/audio/video) column plumbing.

Design: media travels as opaque BinaryType columns with a typed
metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched functions over mapInPandas, so each
task processes a columnar batch of blobs without JVM<->Python row
churn.  At 100 TB the binary column lives in its own parquet column
chunk (column pruning means metadata-only queries never read bytes),
and partitioning is by content-defined bucket (hash of media_id), never
by blob size.

The test container ships no image/audio codecs, so the actual decoders
are STUBS: they raise NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder (derived from the blob's bytes)
exercises the full plumbing — schema, batching, partitioning — with
real data shapes.  Swapping in PIL/ffmpeg later changes only the
nested `decode_one`/`_resize_one` bodies.  Worker-side code is nested
inside each builder so cloudpickle ships it by value — executors never
need this package on their sys.path.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("blob", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("brightness", T.DoubleType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests: treat document text bytes as media blobs so
    the plumbing runs against real driver data (no media tables ship)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("blob"),
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).cast("long").alias(
                "n_bytes"
            ),
            F.lit("application/octet-stream").alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    One output row per input row; the blob column is dropped on output
    so downstream stages never shuffle bytes they don't need.
    """

    # nested (not a module-level reference) so cloudpickle ships the
    # decoder BY VALUE: workers must not need this package importable —
    # only the driver has the repo on sys.path (the grading driver runs
    # from an arbitrary cwd)
    def decode_one(blob: bytes) -> tuple[int, int, float]:
        if not fake:
            raise NotImplementedError(
                "image decoding requires an image codec (PIL/opencv); "
                "run with fake=True for the deterministic test decoder"
            )
        digest = hashlib.sha256(blob).digest()
        return 64 + digest[0] % 192, 64 + digest[1] % 192, digest[2] / 255.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_one(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "content_hash": [
                        hashlib.sha256(b).hexdigest() for b in pdf["blob"]
                    ],
                    "brightness": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """Resize stub: passes blobs through mapInPandas preserving the
    media schema with updated metadata.  Real implementation plugs a
    codec into `_resize_one`."""

    def _resize_one(blob: bytes) -> bytes:
        if not fake:
            raise NotImplementedError(
                "image resize requires an image codec; use fake=True"
            )
        # deterministic fake: truncate/pad the blob to min(len, w*h)
        n = min(len(blob), target_w * target_h)
        return blob[:n]

    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [_resize_one(b) for b in pdf["blob"]]
            meta = [
                {
                    "n_bytes": len(b),
                    "mime": m["mime"] if isinstance(m, dict) else m.mime,
                    "source": m["source"] if isinstance(m, dict) else m.source,
                }
                for b, m in zip(blobs, pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "blob": blobs,
                    "meta": meta,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 4096, fake: bool = False
) -> DataFrame:
    """Frame-sampling stub (video -> frames): 1->N row expansion through
    mapInPandas, the shape a real ffmpeg-backed sampler would have."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if not fake:
                    raise NotImplementedError(
                        "frame sampling requires a video codec; use fake=True"
                    )
                for i, off in enumerate(range(0, len(blob), every_n_bytes)):
                    ids.append(mid)
                    frame_nos.append(i)
                    frames.append(bytes(blob[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame": frames}
            )

    return media.mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("frame_no", T.IntegerType()),
                T.StructField("frame", T.BinaryType()),
            ]
        ),
    )


# -- registry ---------------------------------------------------------------
#
# The fake decoder is deterministic (sha256-derived), so the mapInPandas
# Arrow path itself is SQL-checkable: DuckDB recomputes width/height/
# brightness from the same content hash.  That makes the multimodal
# plumbing a first-class graded query, not just a unit-tested stub.


def media_features(spark, sf_dir: str) -> DataFrame:
    """X5 — decode + feature-extract over the documents-as-media adapter
    (blob = utf-8 text bytes; deterministic fake decoder)."""
    from ..io import read_table

    docs = read_table(spark, sf_dir, "documents")
    feats = extract_image_features(documents_as_media(docs), fake=True)
    return feats.withColumn("brightness", F.round("brightness", 6))


def media_frame_stats(spark, sf_dir: str) -> DataFrame:
    """X5 — video frame-sampling shape (1->N row expansion via
    mapInPandas); emits per-frame byte counts, not the bytes, so the
    oracle compares scalars."""
    from ..io import read_table

    docs = read_table(spark, sf_dir, "documents")
    frames = sample_frames(documents_as_media(docs), every_n_bytes=4096, fake=True)
    return frames.select(
        "media_id",
        "frame_no",
        F.octet_length("frame").cast("long").alias("frame_bytes"),
    )


def register() -> dict:
    from ..queries import QueryDef

    # hex digit -> int, for reading sha256 digest bytes in ANSI SQL
    def _hexbyte(pos: int) -> str:
        return (
            f"((position(substr(hash, {pos}, 1) IN '0123456789abcdef') - 1) * 16"
            f" + (position(substr(hash, {pos + 1}, 1) IN '0123456789abcdef') - 1))"
        )

    return {
        "media_features": QueryDef(
            media_features,
            f"""
            WITH h AS (
                SELECT doc_id AS media_id, sha256(text) AS hash,
                       octet_length(encode(text)) AS n_bytes
                FROM documents
            )
            SELECT media_id,
                   CAST(64 + {_hexbyte(1)} % 192 AS INTEGER) AS width,
                   CAST(64 + {_hexbyte(3)} % 192 AS INTEGER) AS height,
                   CAST(n_bytes AS BIGINT) AS n_bytes,
                   hash AS content_hash,
                   ROUND({_hexbyte(5)} / 255.0, 6) AS brightness
            FROM h
            """,
            "X5 image decode/feature-extract via mapInPandas (fake codec)",
        ),
        "media_frame_stats": QueryDef(
            media_frame_stats,
            """
            WITH n AS (
                SELECT doc_id AS media_id,
                       octet_length(encode(text)) AS n_bytes
                FROM documents
            )
            SELECT media_id,
                   CAST(UNNEST(range(0, CAST(CEIL(n_bytes / 4096.0) AS INT)))
                        AS INTEGER) AS frame_no,
                   CAST(LEAST(4096, n_bytes
                        - UNNEST(range(0, CAST(CEIL(n_bytes / 4096.0) AS INT)))
                          * 4096) AS BIGINT) AS frame_bytes
            FROM n
            """,
            "X5 frame-sampling 1->N expansion via mapInPandas (fake codec)",
        ),
    }
