"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the Spark-side contract (schema, partition sizing, Arrow batch shape) is
real and tested; the actual codec calls are STUBBED because the sandbox has
no image/audio libraries. Each stub is deterministic so tests are stable;
swap ``_decode_image_stub`` etc. for PIL/librosa/ffmpeg on a real cluster.

Pattern: ``mapInPandas`` over an iterator of Arrow batches — the canonical
shape for per-row heavy media work. Batches stream (no whole-partition
materialization); ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
peak memory per task, which is what keeps 100 TB of media decodable on
fixed-size executors.
"""

from __future__ import annotations

from typing import Iterator

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
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.LongType())),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake 'pixels' derived from the payload.
    Swap for :func:`pil_image_decoder` (or any ``bytes → 2-D ndarray``
    callable) via the ``decoder=`` parameter of :func:`image_features`."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32)


def pil_image_decoder(payload: bytes) -> np.ndarray:
    """REAL image decode: PIL → grayscale 2-D float32 pixel array.

    Imports PIL lazily inside the call so the module stays importable in
    environments without it (this sandbox); pass as
    ``image_features(df, decoder=pil_image_decoder)`` on a cluster with
    Pillow installed. Tested behind ``pytest.importorskip('PIL')``."""
    import io

    from PIL import Image

    return np.asarray(
        Image.open(io.BytesIO(payload)).convert("L"), dtype=np.float32
    )


def image_features(
    df: DataFrame, batch_size_hint: int = 256, decoder=_decode_image_stub
) -> DataFrame:
    """Decode → pooled feature vector per image, streaming Arrow batches.

    ``decoder`` is any ``bytes → 2-D ndarray`` callable, defaulting to the
    deterministic stub (oracle-checkable end-to-end); inject
    :func:`pil_image_decoder` for real JPEG/PNG decode. The callable is
    cloudpickled to executors, so any top-level function works."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = decoder(bytes(payload))
                # 'feature extraction': per-row sum pooling (stub for a CNN
                # head). Integer-exact on purpose: the whole image pipeline
                # stays oracle-checkable end-to-end (DuckDB reproduces the
                # byte sums from the payload hex), unlike a float pooling
                # whose formatting/rounding differs across engines.
                feats.append(img.astype(np.int64).sum(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return df.select("media_id", "payload").mapInPandas(_run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("band_abs", T.ArrayType(T.LongType())),
    ]
)


def _decode_audio_stub(payload: bytes) -> np.ndarray:
    """STUB decode: payload bytes reinterpreted as int16 LE PCM samples.
    Swap for :func:`wav_audio_decoder` (or any ``bytes → 1-D int64
    ndarray`` callable) via ``audio_features(df, decoder=...)``."""
    raw = payload[: len(payload) - len(payload) % 2]
    return np.frombuffer(raw, dtype="<i2").astype(np.int64)


def wav_audio_decoder(payload: bytes) -> np.ndarray:
    """REAL audio decode: RIFF/WAV container → int64 PCM samples, using
    only the stdlib ``wave`` module (no external deps — this path runs in
    the sandbox test suite, unlike the PIL image path). 16-bit PCM only;
    multi-channel frames are interleaved samples, returned as-is."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"wav_audio_decoder handles 16-bit PCM only, "
                f"got sampwidth={w.getsampwidth()}"
            )
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.int64)


def audio_features(df: DataFrame, decoder=_decode_audio_stub) -> DataFrame:
    """Decode → sample count, total energy, RMS and coarse band magnitudes
    per clip, streaming Arrow batches. ``decoder`` is any ``bytes → 1-D
    int64 ndarray`` callable — the deterministic stub by default (payload
    bytes as int16 LE PCM, keeping the whole pipeline oracle-checkable),
    or :func:`wav_audio_decoder` for real WAV containers; the numpy
    feature math and the mapInPandas plumbing are identical either way.

    Feature math is integer-first on purpose: ``energy`` (sum of squared
    samples) and ``band_abs`` (abs-sum per 4-way strided slice — stub for
    an FFT band split) are exact int64, and ``rms = sqrt(energy/n)`` uses
    only correctly-rounded IEEE ops, so a SQL oracle reproduces every
    column bit-for-bit."""

    def _run(batches):
        for pdf in batches:
            ids, ns, energies, rms, bands = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm = decoder(bytes(payload))
                if len(pcm) == 0:
                    pcm = np.zeros(1, dtype=np.int64)
                energy = int((pcm * pcm).sum())
                ids.append(mid)
                ns.append(len(pcm))
                energies.append(energy)
                rms.append(float(np.sqrt(energy / len(pcm))))
                bands.append([int(np.abs(pcm[i::4]).sum()) for i in range(4)])
            yield pd.DataFrame(
                {"media_id": ids, "n_samples": ns, "energy": energies, "rms": rms, "band_abs": bands}
            )

    return df.select("media_id", "payload").mapInPandas(_run, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4, max_frames: int = 3) -> DataFrame:
    """Frame-sample 'videos': emit ≤max_frames chunks per payload (stub:
    byte-range slices standing in for decoded frames). One-to-many
    mapInPandas — the UDTF-ish shape for media explode."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(len(raw) // max(every_n, 1), 1)
                for i in range(min(max_frames, max(len(raw) // step, 1))):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_frames.append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_payload": out_frames}
            )

    return df.select("media_id", "payload").mapInPandas(_run, FRAME_SAMPLE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payload from sha2 bytes)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("kind"),
            F.to_binary(F.sha2(F.concat(F.lit("media:"), F.col("id").cast("string")), 512), F.lit("hex")).alias("payload"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.lit(8).cast("int").alias("width"),
                F.lit(8).cast("int").alias("height"),
                (F.col("id") * 1000).cast("long").alias("duration_ms"),
            ).alias("meta"),
        )
    )
