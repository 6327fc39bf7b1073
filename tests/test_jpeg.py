"""JPEG codec: vendored baseline encoder/decoder — exactness of the
rational-basis payloads, generality of the coefficient-domain
round-trip, stream-structure checks (byte stuffing, ZRL), gate
behavior outside the baseline envelope, and the Spark ops against a
pure-Python reference."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_scd_spark.functions import jpegcodec as jc

S = [1 if x % 4 in (0, 3) else -1 for x in range(8)]


def _blocks(i: int, c: int, bx_n: int, by_n: int):
    return [
        {
            0: (3 + (i * 31 + c * 101 + bx * 13 + by * 7) % 250) - 128,
            jc.AC44_ZZ: ((i * 17 + c * 29 + bx * 5 + by * 3) % 7) - 3,
        }
        for by in range(by_n)
        for bx in range(bx_n)
    ]


def _expected_sample(i, c, bx, by, x, y):
    v = 3 + (i * 31 + c * 101 + bx * 13 + by * 7) % 250
    k = ((i * 17 + c * 29 + bx * 5 + by * 3) % 7) - 3
    return v + k * S[x] * S[y]


def test_zigzag_is_the_standard_order():
    # spot-pin the algorithmic zigzag against known anchor points
    assert jc.ZIGZAG[0] == 0
    assert jc.ZIGZAG[1] == 1  # (0,1)
    assert jc.ZIGZAG[2] == 8  # (1,0)
    assert jc.ZIGZAG[63] == 63  # (7,7)
    assert sorted(jc.ZIGZAG) == list(range(64))
    assert jc.AC44_ZZ == jc.ZIGZAG.index(36) == 39


@given(i=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_jpeg_rational_payload_exact(i):
    """The deterministic DC+AC(4,4) payloads decode pixel-exactly
    through the full lossy pipeline (the property the oracle relies
    on)."""
    w, h = 16 + 8 * (i % 3), 8 + 8 * (i % 2)
    comp = [_blocks(i, c, w // 8, h // 8) for c in range(3)]
    payload = jc.encode_jpeg(w, h, comp)
    assert jc.sniff(payload)
    gw, gh, nc, planes = jc.decode(payload)
    assert (gw, gh, nc) == (w, h, 3)
    for c in range(3):
        for by in range(h // 8):
            for bx in range(w // 8):
                for y in range(8):
                    for x in range(8):
                        assert planes[c][
                            (by * 8 + y) * w + bx * 8 + x
                        ] == _expected_sample(i, c, bx, by, x, y)


@given(
    seed=st.integers(min_value=0, max_value=2**31),
    bx_n=st.integers(min_value=1, max_value=3),
    by_n=st.integers(min_value=1, max_value=2),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_coefficient_roundtrip_general(seed, bx_n, by_n):
    """Arbitrary small coefficients at arbitrary zigzag positions
    survive encode→decode→re-quantize: IDCT(deq(coefs)) must round
    back losslessly when re-forward-transformed. Checked in the
    coefficient domain via numpy FDCT of the decoded block — this
    exercises runs/sizes/ZRL placement far beyond the deterministic
    payload shape."""
    import numpy as np

    rng = np.random.RandomState(seed % (2**31))
    w, h = bx_n * 8, by_n * 8
    quant = [1] * 64  # identity dequant isolates the entropy layer
    blocks = []
    for _ in range(bx_n * by_n):
        blk = {0: int(rng.randint(-128, 128))}
        for zi in sorted(rng.choice(range(1, 64), size=4, replace=False)):
            v = int(rng.randint(-15, 16))
            if v:
                blk[int(zi)] = v
        blocks.append(blk)
    payload = jc.encode_jpeg(w, h, [blocks], quant=quant)
    gw, gh, nc, planes = jc.decode(payload)
    assert (gw, gh, nc) == (w, h, 1)
    # the decoded plane must equal the reference IDCT of the ORIGINAL
    # coefficients computed with the same basis — exact equality, so
    # any entropy-layer or dequant slip (wrong run, wrong sign, wrong
    # zigzag slot, dropped EOB) shows as a pixel diff.
    m = jc._idct_basis()
    plane = np.asarray(planes[0]).reshape(h, w)
    for bi, blk in enumerate(blocks):
        by, bx = divmod(bi, bx_n)
        coef = np.zeros((8, 8))
        for zi, v in blk.items():
            nat = jc.ZIGZAG[zi]
            coef[nat // 8, nat % 8] = v  # quant=1
        want = np.clip(np.rint(m.T @ coef @ m) + 128, 0, 255)
        got = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        assert (got == want).all(), bi


def test_jpeg_byte_stuffing_roundtrip():
    """The 0xFF stuffing writer/reader pair, exercised directly:
    writing eight aligned 1-bits must emit FF 00, and the reader must
    consume the stuffing transparently."""
    bw = jc._BitWriter()
    bw.put(0xFF, 8)  # aligned all-ones byte → must stuff
    bw.put(0xABC, 12)
    data = bw.flush()
    assert data[:2] == b"\xff\x00"
    br = jc._BitReader(data, 0)
    assert br.bits(8) == 0xFF
    assert br.bits(12) == 0xABC
    # a bare marker inside the entropy stream is an error, not data
    br2 = jc._BitReader(b"\xff\xd9", 0)
    with pytest.raises(ValueError, match="marker"):
        br2.bits(8)


def test_jpeg_annex_k_dc_table_variable_lengths():
    """Encoding with the real Annex K DC luminance table (code
    lengths 2..9) must decode identically — the multi-length
    canonical Huffman decode path the fixed-length toy tables never
    touch."""
    i = 13
    w, h = 16, 16
    comp = [_blocks(i, c, w // 8, h // 8) for c in range(3)]
    p_toy = jc.encode_jpeg(w, h, comp)
    p_annex = jc.encode_jpeg(w, h, comp, dc_table=jc.ANNEX_K_DC)
    assert p_toy != p_annex  # genuinely different bitstreams
    assert jc.decode(p_toy)[3] == jc.decode(p_annex)[3]


def test_jpeg_gates_outside_envelope():
    i = 7
    w, h = 16, 8
    comp = [_blocks(i, c, w // 8, h // 8) for c in range(3)]
    p = bytearray(jc.encode_jpeg(w, h, comp))
    # progressive: flip SOF0 (FFC0) to SOF2 (FFC2)
    sof = p.find(b"\xff\xc0")
    prog = bytes(p[:sof]) + b"\xff\xc2" + bytes(p[sof + 2 :])
    with pytest.raises(ValueError, match="non-baseline"):
        jc.decode(prog)
    with pytest.raises(ValueError, match="not a JPEG"):
        jc.decode(b"\x00\x01rubbish")
    with pytest.raises(ValueError):
        jc.encode_jpeg(12, 8, comp)  # non-multiple-of-8 dims


def test_jpeg_spark_stats_match_reference(spark):
    """with_jpeg_payload → jpeg_component_stats through the Arrow
    path equals the pure-Python closed form, and
    decode_image_features routes JPEG through the vendored decoder."""
    from pyspark_scd_spark.operators import multimodal

    ids = list(range(23))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    rows = {
        r["doc_id"]: r.asDict()
        for r in multimodal.jpeg_component_stats(
            multimodal.with_jpeg_payload(df)
        ).collect()
    }
    for i in ids:
        w, h = 16 + 8 * (i % 3), 8 + 8 * (i % 2)
        sums = [0, 0, 0]
        sumsq = 0
        mx = 0
        for c in range(3):
            for by in range(h // 8):
                for bx in range(w // 8):
                    for y in range(8):
                        for x in range(8):
                            s = _expected_sample(i, c, bx, by, x, y)
                            sums[c] += s
                            if c == 0:
                                sumsq += s * s
                                mx = max(mx, s)
        r = rows[i]
        assert (r["width"], r["height"], r["n_components"]) == (w, h, 3)
        assert (r["sum_y"], r["sum_cb"], r["sum_cr"]) == tuple(sums)
        assert r["sumsq_y"] == sumsq
        assert r["max_y"] == mx
    feats = {
        r["doc_id"]: r
        for r in multimodal.decode_image_features(
            multimodal.with_jpeg_payload(df), fake=False
        ).collect()
    }
    for i in ids:
        w, h = 16 + 8 * (i % 3), 8 + 8 * (i % 2)
        assert (feats[i]["width"], feats[i]["height"]) == (w, h)
        assert feats[i]["channels"] == 3


def test_jpeg_fill_bytes_and_standalone_markers():
    """ADVICE r8: spec-legal 0xFF fill bytes between header segments
    (ITU T.81 B.1.1.2) must be skipped, and standalone markers (TEM,
    RSTn) between segments must gate with a clear ValueError."""
    i = 3
    comp = [_blocks(i, c, 2, 1) for c in range(1)]
    p = bytearray(jc.encode_jpeg(16, 8, comp))
    # inject two fill bytes before the first DQT marker
    dqt = p.find(b"\xff\xdb")
    padded = bytes(p[:dqt]) + b"\xff\xff" + bytes(p[dqt:])
    w, h, ncomp, planes = jc.decode(padded)
    assert (w, h, ncomp) == (16, 8, 1)
    assert planes == jc.decode(bytes(p))[3]
    # a standalone TEM marker in header position must gate loudly
    tem = bytes(p[:dqt]) + b"\xff\x01" + bytes(p[dqt:])
    with pytest.raises(ValueError, match="standalone marker"):
        jc.decode(tem)


def test_jpeg_encode_out_of_table_range_is_valueerror():
    """ADVICE r8: coefficients outside the default Huffman tables'
    envelope gate with ValueError naming the table, not KeyError."""
    # |AC| = 1100 has category 11 > 10 (max AC size in Annex K)
    blocks = [{0: 0, 1: 1100}]
    with pytest.raises(ValueError, match="ac_table"):
        jc.encode_jpeg(8, 8, [blocks])
    # DC diff category 12+ needs |diff| >= 2048 (table covers 0..11)
    blocks2 = [{0: 5000}]
    with pytest.raises(ValueError, match="dc_table"):
        jc.encode_jpeg(8, 8, [blocks2])


def test_jpeg_truncated_after_fill_bytes_is_valueerror():
    """ADVICE r9: a payload whose tail is 0xFF fill bytes (no marker
    byte after the skip), or whose skip leaves <4 bytes before a
    non-EOI marker's length field, must raise ValueError — never
    IndexError / struct.error. `FF FF D9` (fill byte + EOI) at the
    very end stays legal."""
    i = 3
    comp = [_blocks(i, c, 2, 1) for c in range(1)]
    p = bytearray(jc.encode_jpeg(16, 8, comp))
    dqt = p.find(b"\xff\xdb")
    head = bytes(p[:dqt])
    # tail of pure 0xFF bytes long enough for the outer loop guard
    # (pos+4 <= n) to admit the position: the skip runs to pos+1 == n
    with pytest.raises(ValueError, match="truncated"):
        jc.decode(head + b"\xff" * 5)
    # skip leaves a marker byte but <4 bytes for the length field
    with pytest.raises(ValueError, match="truncated"):
        jc.decode(head + b"\xff\xff\xdb\x00")
    # fill byte + EOI at end-of-stream is spec-legal: must NOT raise
    # the truncation gate (decode fails later for lack of SOS/SOF,
    # but inside the ValueError envelope)
    try:
        jc.decode(head + b"\xff\xff\xd9")
    except ValueError:
        pass
