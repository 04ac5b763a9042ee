"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
per-batch decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas`` — the pattern that scales
to 100 TB because each task streams record batches and never holds a
partition in memory.

The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the bytes — the Spark-side plumbing (schema, batch
iteration, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
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

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 5)
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"mime": f"{kind}/x-fake", "width": 64 + i, "height": 48 + i, "duration_ms": 1000 * (i % 7)},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    """Codec boundary. Real deployments plug PIL/torchaudio/ffmpeg in
    here; this container has none, so the real path raises and the
    deterministic fake derives an 8-dim feature from the bytes."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    # hash the lowercase-hex form of the bytes (not the raw bytes) so a
    # pure-SQL oracle can reproduce the feature: sha256 over VARCHAR is
    # all DuckDB offers, and hex(payload) is that varchar
    h = hashlib.sha256(payload.hex().encode()).digest()
    return (np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).sum(axis=1) / 255.0).astype(
        np.float32
    )


def extract_features(df: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow record-batch
    streaming; one Python worker call per batch, no per-row overhead
    at the Spark row level)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(bytes(p), k, fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling *plan* for video rows: computes the frame
    timestamps to decode (pure column math — the expensive decode stays
    in extract_features behind the stub)."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.expr(
                f"case when meta.duration_ms <= 0 then cast(array() as array<int>) "
                f"else transform(sequence(0, greatest(cast(meta.duration_ms / {every_ms} as int) - 1, 0)),"
                f" i -> cast(i * {every_ms} as int)) end"
            ),
        )
        .select("media_id", "meta.duration_ms", "frame_ts_ms")
    )
