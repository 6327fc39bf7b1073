"""GIF codec: LZW round-trip (dictionary growth, KwKwK, 4096-entry
clear/rebuild), malformed-payload rejection, extension skipping, and
the Spark ops against a pure-Python reference."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_scd_spark.functions import gifcodec


def _lcg_stream(seed, n, mod):
    out, s = [], seed
    for _ in range(n):
        s = (s * 1103515245 + 12345) % (1 << 31)
        out.append(s % mod)
    return out


@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    nbits=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip(w, h, nbits, seed):
    n = 1 << nbits
    pal = _lcg_stream(seed ^ 7, 3 * n, 256)
    idx = _lcg_stream(seed, w * h, n)
    payload = gifcodec.encode_gif87a(w, h, pal, idx)
    assert gifcodec.sniff(payload)
    gw, gh, gpal, gidx = gifcodec.decode(payload)
    assert (gw, gh) == (w, h)
    assert gpal == pal and gidx == idx


def test_gif_kwkwk_and_runs():
    """Long runs force the KwKwK code-equals-next_code case and the
    width schedule; the payload must also genuinely compress."""
    w, h = 64, 64
    idx = ([0] * 1000 + [1, 2, 3] * 1100)[: w * h]
    p = gifcodec.encode_gif87a(w, h, [0] * 12, idx)
    assert gifcodec.decode(p)[3] == idx
    assert len(p) < w * h // 4  # real compression, not clear-per-pixel


def test_gif_dict_overflow_clear_rebuild():
    """256-color noise overflows the 4096-entry dictionary: the
    encoder must emit CLEAR and both sides rebuild in lockstep."""
    w, h, n = 128, 128, 256
    pal = [(i * 37) % 256 for i in range(3 * n)]
    idx = _lcg_stream(99, w * h, n)
    assert gifcodec.decode(gifcodec.encode_gif87a(w, h, pal, idx))[3] == idx


def test_gif_extension_blocks_skipped():
    """GIF89a writers splice graphics-control extensions before the
    image descriptor; the block walk must skip them."""
    p = gifcodec.encode_gif87a(4, 4, [0] * 6, [0] * 16)
    spliced = (
        p[: 13 + 6]
        + bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
        + p[13 + 6 :]
    )
    assert gifcodec.decode(spliced)[3] == [0] * 16


def test_gif_malformed_raises():
    p = gifcodec.encode_gif87a(4, 4, [0] * 6, list(range(2)) * 8)
    with pytest.raises(ValueError):
        gifcodec.decode(p[:10])  # truncated header
    with pytest.raises(ValueError):
        gifcodec.decode(b"GIF87a" + p[6:12])  # truncated table
    interlaced = bytearray(p)
    # image descriptor flags byte: set the interlace bit
    idesc = p.index(0x2C, 13 + 6)
    interlaced[idesc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gifcodec.decode(bytes(interlaced))
    with pytest.raises(ValueError):
        gifcodec.encode_gif87a(2, 2, [0] * 9, [0] * 4)  # non-2^k palette


def test_gif_ops_match_python_reference(spark):
    from pyspark_scd_spark.operators import multimodal

    ids = [0, 1, 7, 19, 40, 123]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r
        for r in multimodal.gif_pixel_stats(
            multimodal.with_gif_payload(df)
        ).collect()
    }
    pal = multimodal._gif_palette()
    for i in ids:
        w, h = multimodal._gif_dims(i)
        idx = multimodal._gif_indices(i, w, h)
        r = got[i]
        assert (r["width"], r["height"], r["n_palette"]) == (w, h, 64)
        assert r["sum_idx"] == sum(idx)
        assert r["max_idx"] == max(idx)
        assert r["sum_r"] == sum(pal[3 * v] for v in idx)
