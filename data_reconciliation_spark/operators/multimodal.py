"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages.
The decode kernels themselves are STUBS in this environment (no
image/audio libraries in the container) — clearly marked below — but the
Spark-side contract is real and tested: schema, batch shape, partition
behavior, and the deterministic fake featurizer all run end-to-end.

Design for 100 TB of media: ``mapInPandas`` (not pandas_udf) so one
batch can emit multiple rows (frame sampling) or drop rows (decode
failures) without a second pass; binary columns stream through Arrow
record batches without driver involvement; repartition by byte-size
bucket ahead of decode so one 4K video doesn't stall a partition of
thumbnails.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),     # image|audio|video
        T.StructField("payload", T.BinaryType(), True),   # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real implementation needs an image codec (PIL/cv2), which
    this container does not ship.  The Spark plumbing around it is real."""
    raise NotImplementedError(
        "image decode requires an image library not present in this environment"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake featurizer standing in for decode+embed: byte
    histogram folded to ``dim`` buckets, L2-normalized.  Fully
    reproducible, so tests can assert exact values."""
    if payload is None:
        return None
    counts = np.zeros(dim, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size:
        np.add.at(counts, arr % dim, 1.0)
    norm = float(np.linalg.norm(counts))
    return (counts / norm).astype(np.float32).tolist() if norm else counts.astype(
        np.float32
    ).tolist()


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    One ``mapInPandas`` pass; the iterator contract keeps peak memory at
    one Arrow batch regardless of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling contract for video rows: one output row per sampled
    frame (1 + duration//every_ms rows).  The frame *decode* is stubbed —
    payload passes through as the frame payload — but the row-expansion
    shape (the part Spark cares about) is real."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                for idx, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows.append((r["media_id"], idx, ts, r["payload"]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "payload"]
            )

    return media.where(F.col("kind") == "video").mapInPandas(run, out_schema)


def size_bucketed(media: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Repartition by payload-size bucket so decode cost is balanced
    across tasks (one giant video otherwise stalls its partition)."""
    bucket = F.pmod(
        F.xxhash64("media_id") + F.floor(F.log2(F.length("payload") + 2)), F.lit(n_buckets)
    )
    return media.repartition(n_buckets, bucket)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Image-resize contract: one output row per image row with the
    target dimensions and a payload placeholder.

    The pixel resample itself is STUBBED (no image codec in this
    container): payloads pass through unchanged with the new dims
    recorded, and a deterministic content checksum is computed so the
    pipeline downstream of resize is fully exercisable.  The Spark-side
    contract (schema, Arrow batching, partition behavior) is real.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("checksum", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"],
                    "checksum": [
                        zlib.crc32(p) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.where(F.col("kind") == "image").mapInPandas(run, out_schema)
