"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
per-batch decode / feature-extract / frame-sample run as Arrow-batched
functions over ``mapInPandas`` — the pattern that scales to 100 TB
because each task streams record batches and never holds a partition
in memory.

The codec step is REAL byte decoding, pure numpy + stdlib:

  * image — binary PPM (P6): ASCII header ``P6\\n<w> <h>\\n255\\n``
    followed by w*h*3 raw RGB bytes.
  * audio — RIFF/WAVE, PCM16 mono: the decoder walks RIFF chunks to
    the ``fmt `` and ``data`` chunks like any real WAV reader.
  * video — a minimal self-describing container ``VID0`` +
    little-endian u16 (width, height, n_frames) + raw RGB frames.

Real deployments swap these three decoders for PIL/torchaudio/ffmpeg
behind the same ``decode`` boundary; the Spark-side plumbing (schema,
Arrow batch iteration, feature shape) is identical either way.
Reference analog for the payload type-conversion table:
db_trigger_generator_oracle.rb:875-914 (RAW/BLOB handling).
"""

from __future__ import annotations

import struct
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
        # per-row quarantine: decode failures land HERE (feature NULL,
        # error message set) instead of failing the whole Spark task —
        # one corrupt payload in a 100k-row Arrow batch must not kill
        # the other 99,999 (ADVICE r4)
        T.StructField("decode_error", T.StringType()),
    ]
)

_WAV_RATE = 8000


# --------------------------------------------------------------- encoders
def encode_ppm(w: int, h: int, pixels: np.ndarray) -> bytes:
    """Binary PPM (P6). ``pixels`` is a flat uint8 array of w*h*3."""
    assert pixels.dtype == np.uint8 and pixels.size == w * h * 3
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def encode_wav(samples: np.ndarray, rate: int = _WAV_RATE) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + PCM16LE mono samples."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_vid0(w: int, h: int, frames: np.ndarray) -> bytes:
    """VID0 container: magic + u16 dims/frame-count + raw RGB frames.
    ``frames`` is a flat uint8 array of n_frames*w*h*3."""
    assert frames.dtype == np.uint8 and frames.size % (w * h * 3) == 0
    nf = frames.size // (w * h * 3)
    return b"VID0" + struct.pack("<HHH", w, h, nf) + frames.tobytes()


# --------------------------------------------------------------- decoders
def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse binary PPM: magic check, ASCII header scan, raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = three whitespace-separated tokens after the magic;
    # every scan is bounded by the buffer end — a truncated header
    # raises instead of scanning past EOF (b''.isspace() is False, so
    # an unbounded loop would spin forever on b'')
    fields: list[int] = []
    pos, end = 2, len(payload)
    while len(fields) < 3:
        while pos < end and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < end and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        try:
            fields.append(int(payload[start:pos]))
        except ValueError as e:
            raise ValueError(f"malformed PPM header token {payload[start:pos]!r}") from e
    if pos >= end:
        raise ValueError("truncated PPM header")
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pix = np.frombuffer(payload, dtype=np.uint8, offset=pos)
    if pix.size != w * h * 3:
        raise ValueError(f"PPM data size {pix.size} != {w}x{h}x3")
    return w, h, pix


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Chunk-walking RIFF/WAVE parser for PCM16 mono."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", payload, body)
            if (fmt, ch, bits) != (1, 1, 16):
                raise ValueError(f"unsupported WAV format {(fmt, ch, bits)}")
        elif cid == b"data":
            data = np.frombuffer(payload, dtype="<i2", offset=body, count=size // 2)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, data


def decode_vid0(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    if payload[:4] != b"VID0":
        raise ValueError("not a VID0 payload")
    w, h, nf = struct.unpack_from("<HHH", payload, 4)
    frames = np.frombuffer(payload, dtype=np.uint8, offset=10)
    if frames.size != nf * w * h * 3:
        raise ValueError(f"VID0 data size {frames.size} != {nf}x{w}x{h}x3")
    return w, h, nf, frames


def decode(payload: bytes, kind: str) -> tuple[np.ndarray, int, int]:
    """Codec boundary: real byte parsing per kind. Returns
    (units, d1, d2) — the decoded sample array plus two decoded header
    dimensions (image: w, h; audio: rate, n_samples; video: w*h,
    n_frames). Raises ValueError on a corrupt or mismatched payload."""
    try:
        if kind == "image":
            w, h, pix = decode_ppm(payload)
            return pix.astype(np.int64), w, h
        if kind == "audio":
            rate, samples = decode_wav(payload)
            return samples.astype(np.int64), rate, samples.size
        if kind == "video":
            w, h, nf, frames = decode_vid0(payload)
            return frames.astype(np.int64), w * h, nf
    except struct.error as e:
        # truncated fixed-width header fields surface as struct.error —
        # normalize to the documented ValueError contract so callers
        # can quarantine the row instead of failing the task
        raise ValueError(f"truncated {kind} payload: {e}") from e
    raise ValueError(f"unknown media kind {kind!r}")


# --------------------------------------------------------------- synth
def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL encoded payloads. Content
    follows closed-form modular sequences so a SQL oracle can reproduce
    the decoded features without a codec of its own — decoding wrongly
    (bad offset, wrong endianness, header misparse) breaks the match."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 16 + (i % 16), 12 + (i % 8)
            pix = ((i * 97 + np.arange(w * h * 3, dtype=np.int64) * 31) % 256).astype(np.uint8)
            payload, meta = encode_ppm(w, h, pix), ("image/x-portable-pixmap", w, h, 0)
        elif kind == "audio":
            ns = 256 + (i % 32) * 16
            smp = ((i * 211 + np.arange(ns, dtype=np.int64) * 13) % 4096 - 2048).astype(np.int16)
            payload, meta = encode_wav(smp), ("audio/wav", None, None, ns * 1000 // _WAV_RATE)
        else:
            w, h, nf = 8 + (i % 4), 6 + (i % 3), 2 + (i % 4)
            j = np.arange(nf * w * h * 3, dtype=np.int64)
            fr = ((i * 53 + (j // (w * h * 3)) * 101 + (j % (w * h * 3)) * 29) % 256).astype(np.uint8)
            payload, meta = encode_vid0(w, h, fr), ("video/x-vid0", w, h, nf * 500)
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --------------------------------------------------------------- extract
def guard_arrow_batch_for_media(
    spark, payload_bytes: int, max_batch_bytes: int = 256 << 20
) -> int:
    """Make the documented large-payload caveat load-bearing: the
    engine's session default of 100k rows per Arrow batch is sized for
    ~100 B rows (session.py); at media payload sizes the Python-worker
    working set is rows/batch × payload bytes. Given an upper-bound
    payload size, check the session conf and LOWER it (with a warning)
    when a batch could exceed ``max_batch_bytes``. Returns the
    records-per-batch now in effect. The conf is session-wide by Spark
    design — the warning says so, so a mixed workload can restore it."""
    import warnings

    cur = int(spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"))
    if payload_bytes <= 0 or cur * payload_bytes <= max_batch_bytes:
        return cur
    safe = max(1, max_batch_bytes // payload_bytes)
    warnings.warn(
        f"spark.sql.execution.arrow.maxRecordsPerBatch={cur} with ~{payload_bytes} B "
        f"payloads means ~{cur * payload_bytes >> 20} MiB per Python-worker Arrow "
        f"batch; lowering it to {safe} for this SESSION (cap {max_batch_bytes >> 20} "
        "MiB/batch). Restore it for narrow-row work if this session mixes both.",
        stacklevel=3,
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(safe))
    return int(safe)


def extract_features(
    df: DataFrame, payload_bytes_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow record-batch
    streaming; one Python worker call per batch, no per-row overhead at
    the Spark row level). The 8-dim feature is integer-exact decoded
    stats — [n_units, unit_sum, unit_min, unit_max, first, last, d1,
    d2] — every value < 2^24 so the float32 round-trip is lossless.

    Corrupt payloads are QUARANTINED per row, not task-fatal: decode's
    ValueError contract (and the degenerate zero-sample/zero-frame case,
    which decodes but has no units to aggregate) produces a row with
    ``feature`` NULL and ``decode_error`` set; downstream dead-letters
    on ``decode_error IS NOT NULL``.

    Memory bound: one Arrow batch holds up to
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads in the
    Python worker at once. ``guard_arrow_batch_for_media`` enforces the
    large-payload caveat: the bound payload size is taken from
    ``payload_bytes_hint`` when given, else probed from a bounded
    sample (batch frames only — a streaming frame must pass the hint).
    """
    spark = df.sparkSession
    if payload_bytes_hint is None and not df.isStreaming:
        # FULL-frame max, not a sample: a limit() probe can miss the
        # very payloads the guard exists for (small rows first, 10 MB
        # videos later). One column-pruned agg over the payload column
        # — bounded by the decode pass that follows, which scans the
        # same bytes anyway; callers that know their corpus pass
        # payload_bytes_hint and skip it.
        row = df.agg(F.max(F.octet_length("payload")).alias("m")).first()
        payload_bytes_hint = int(row["m"] or 0)
    if payload_bytes_hint is not None:
        guard_arrow_batch_for_media(spark, payload_bytes_hint)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list[list[float] | None] = []
            errs: list[str | None] = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                try:
                    if p is None:
                        raise ValueError("null payload")
                    units, d1, d2 = decode(bytes(p), k)
                    if units.size == 0:
                        # structurally valid but empty (zero-sample WAV,
                        # zero-frame VID0): no units to aggregate —
                        # quarantine as a decode error, not a crash
                        raise ValueError(f"empty {k} payload: zero decoded units")
                    feats.append(
                        np.array(
                            [units.size, int(units.sum()), int(units.min()),
                             int(units.max()), int(units[0]), int(units[-1]), d1, d2],
                            dtype=np.float32,
                        ).tolist()
                    )
                    errs.append(None)
                except ValueError as e:
                    feats.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"]
                    .map(lambda b: len(b) if b is not None else 0)
                    .astype("int32"),
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling *plan* for video rows: computes the frame
    timestamps to decode (pure column math — the expensive decode stays
    in extract_features)."""
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
