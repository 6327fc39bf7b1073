"""PNG codec: vendored encoder/decoder round-trip (all five scanline
filters, gray/RGB/RGBA), corruption detection, and the Spark ops
against a pure-Python reference."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_scd_spark.functions import imagecodec


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    channels=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip(w, h, channels, seed):
    # LCG pixels: cheap, deterministic, full 0..255 coverage
    n = w * h * channels
    px, s = [], seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        px.append(s % 256)
    payload = imagecodec.encode_png(w, h, channels, px)
    assert imagecodec.sniff(payload)
    gw, gh, gc, got = imagecodec.decode(payload)
    assert (gw, gh, gc) == (w, h, channels)
    assert got == px


def test_png_all_filters_exercised():
    """h=10 rows cycle row%5 twice — every filter reconstructs against
    a non-trivial previous row (the h<5 case can't cover Paeth)."""
    w, h, c = 6, 10, 3
    px = [(y * 37 + x * 11 + ch * 5) % 256 for y in range(h)
          for x in range(w) for ch in range(c)]
    raw = zlib.decompress(
        _idat_body(imagecodec.encode_png(w, h, c, px))
    )
    stride = w * c + 1
    ftypes = {raw[r * stride] for r in range(h)}
    assert ftypes == {0, 1, 2, 3, 4}
    assert imagecodec.decode(imagecodec.encode_png(w, h, c, px))[3] == px


def _idat_body(payload: bytes) -> bytes:
    pos, out = 8, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            out.extend(payload[pos + 8 : pos + 8 + length])
        pos += 12 + length
    return bytes(out)


def test_png_crc_mismatch_raises():
    p = bytearray(imagecodec.encode_png(4, 6, 3, [0] * 72))
    p[20] ^= 0x01  # flip a bit inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        imagecodec.decode(bytes(p))


def test_png_truncated_raises():
    p = imagecodec.encode_png(4, 6, 3, list(range(72)))
    with pytest.raises(ValueError):
        imagecodec.decode(p[:24])


def test_png_unsupported_raises():
    # 16-bit IHDR: depth byte = 16
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported"):
        imagecodec.decode(imagecodec.PNG_MAGIC + chunk)


def test_png_ops_match_python_reference(spark):
    """with_png_payload -> png_pixel_stats through Spark equals the
    pure-Python signal arithmetic (decode never sees the synth side's
    intermediate pixels — only real PNG bytes)."""
    from pyspark_scd_spark.operators import multimodal

    ids = [0, 1, 7, 19, 40, 123]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r
        for r in multimodal.png_pixel_stats(
            multimodal.with_png_payload(df)
        ).collect()
    }
    for i in ids:
        w, h = multimodal._png_dims(i)
        px = multimodal._png_pixels(i, w, h)
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["sum_r"] == sum(px[0::3])
        assert r["sum_g"] == sum(px[1::3])
        assert r["sum_b"] == sum(px[2::3])
        assert r["max_r"] == max(px[0::3])
