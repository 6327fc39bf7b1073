"""Audio modality: vendored WAV codec round-trip + the Spark ops
against a pure-Python reference."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_scd_spark.functions import audiocodec


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=64
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(min_value=1, max_value=2),
)
@settings(max_examples=50, deadline=None)
def test_wav16_roundtrip(samples, rate, channels):
    payload = audiocodec.encode_wav(samples, rate, channels, 16)
    assert audiocodec.sniff(payload)
    meta, got = audiocodec.decode_wav(payload)
    assert got == samples
    assert meta["sample_rate"] == rate
    assert meta["n_channels"] == channels
    assert meta["bits_per_sample"] == 16
    assert meta["n_frames"] == len(samples) // channels


@given(
    samples=st.lists(
        st.integers(min_value=-128, max_value=127), max_size=64
    )
)
@settings(max_examples=25, deadline=None)
def test_wav8_roundtrip(samples):
    payload = audiocodec.encode_wav(samples, 8000, 1, 8)
    meta, got = audiocodec.decode_wav(payload)
    assert got == samples
    assert meta["bits_per_sample"] == 8


def test_decode_skips_foreign_chunks():
    """Chunk walking must skip unknown chunks (LIST/INFO) and odd-length
    padding, as real writers emit them."""
    import struct

    base = audiocodec.encode_wav([1, -2, 3], 8000)
    # splice a LIST chunk with odd length between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = base[12:]
    spliced = (
        b"RIFF"
        + struct.pack("<I", 4 + len(junk) + len(body))
        + b"WAVE"
        + junk
        + body
    )
    meta, got = audiocodec.decode_wav(spliced)
    assert got == [1, -2, 3]
    assert meta["sample_rate"] == 8000


def test_non_pcm_raises():
    import struct

    import pytest

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # 85 = MP3
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        audiocodec.decode_wav(payload)


def test_audio_ops_match_python_reference(spark):
    """decode_audio_features / audio_window_energy over real WAV bytes
    equal the synthesis formula computed directly."""
    from pyspark_scd_spark.operators import multimodal

    ids = [1, 5, 17, 192, 193, 400]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    payloads = multimodal.with_audio_payload(df)

    feats = {
        r["doc_id"]: r.asDict()
        for r in multimodal.decode_audio_features(payloads).collect()
    }
    energy = {}
    for r in multimodal.audio_window_energy(payloads, window=16).collect():
        energy.setdefault(r["doc_id"], {})[r["win_idx"]] = (
            r["n_samples"], r["energy"]
        )

    for i in ids:
        samples = multimodal._synth_samples(i)
        f = feats[i]
        assert f["n_frames"] == len(samples) == 64 + i % 193
        assert f["sample_rate"] == multimodal.AUDIO_RATE
        assert f["duration_us"] == len(samples) * 1_000_000 // 8000
        assert f["peak_abs"] == max(abs(s) for s in samples)
        assert f["sum_squares"] == sum(s * s for s in samples)
        want = {}
        for w in range(0, len(samples), 16):
            seg = samples[w : w + 16]
            want[w // 16] = (len(seg), sum(s * s for s in seg))
        assert energy[i] == want


def test_encode_8bit_out_of_range_raises():
    import pytest

    with pytest.raises(ValueError, match="out of range"):
        audiocodec.encode_wav([200], 8000, 1, 8)


def test_truncated_data_chunk_raises():
    import pytest
    import struct

    good = audiocodec.encode_wav([1, 2, 3, 4], 8000)
    truncated = good[:-4]  # cut PCM bytes; header still claims them
    with pytest.raises(ValueError, match="truncated"):
        audiocodec.decode_wav(truncated)


def test_short_fmt_chunk_raises():
    import pytest
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 16)[:12]
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="fmt chunk too short"):
        audiocodec.decode_wav(payload)
