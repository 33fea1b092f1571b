"""Real-decoder injection points for the multimodal operators.

The default decoders stay the deterministic stubs (q34/q42/q45 remain
oracle-exact); these tests exercise the ``decoder=`` injection with REAL
codecs — stdlib ``wave`` for audio (runs everywhere), PIL for images
(importorskip — skipped in the sandbox, runs on clusters with Pillow)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from arches_rascoll_etl_spark.operators import multimodal


def _make_wav(samples, framerate=8000, channels=1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_wav_audio_decoder_roundtrip():
    samples = [0, 100, -100, 32767, -32768, 7]
    pcm = multimodal.wav_audio_decoder(_make_wav(samples))
    assert pcm.dtype == np.int64
    assert pcm.tolist() == samples


def test_wav_audio_decoder_rejects_non_16bit():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="16-bit"):
        multimodal.wav_audio_decoder(buf.getvalue())


def test_audio_features_with_real_wav_decoder(spark):
    """End-to-end: real WAV containers through the SAME mapInPandas
    pipeline the stub uses — only the injected decoder differs."""
    clips = {
        0: [0, 3, -4],
        1: [100] * 8,
        2: [-32768, 32767],
    }
    df = spark.createDataFrame(
        [(mid, bytearray(_make_wav(s))) for mid, s in clips.items()],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in multimodal.audio_features(
            df, decoder=multimodal.wav_audio_decoder
        ).collect()
    }
    for mid, s in clips.items():
        pcm = np.array(s, dtype=np.int64)
        energy = int((pcm * pcm).sum())
        assert out[mid]["n_samples"] == len(s)
        assert out[mid]["energy"] == energy
        assert out[mid]["rms"] == pytest.approx(float(np.sqrt(energy / len(s))))
        assert out[mid]["band_abs"] == [
            int(np.abs(pcm[i::4]).sum()) for i in range(4)
        ]


def test_audio_stub_default_unchanged(spark):
    """The injection point must not perturb the stub path (oracle parity:
    q42's expected values are derived from raw-bytes-as-PCM)."""
    media = multimodal.synth_media(spark, n=9).where(F.col("kind") == "audio")
    a = multimodal.audio_features(media).collect()
    b = multimodal.audio_features(
        media, decoder=multimodal._decode_audio_stub
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_image_features_with_pil_decoder(spark):
    """Real JPEG/PNG decode path — runs only where Pillow is installed."""
    PIL_Image = pytest.importorskip("PIL.Image")

    img = PIL_Image.new("L", (8, 8))
    img.putdata(list(range(64)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    out = multimodal.image_features(
        df, decoder=multimodal.pil_image_decoder
    ).collect()
    expect = np.arange(64, dtype=np.int64).reshape(8, 8).sum(axis=1).tolist()
    assert out[0]["feature"] == expect


def test_pil_decoder_import_error_without_pillow():
    """Without Pillow the real decoder raises ImportError at CALL time;
    module import and the stub path stay usable."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed here; sandbox asserts the lazy import")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        multimodal.pil_image_decoder(b"\x89PNG\r\n\x1a\n")
