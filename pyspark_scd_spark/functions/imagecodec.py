"""Vendored minimal image codec: pure-Python PPM/PGM (P2/P3/P5/P6)
and uncompressed BMP decode, plus encoders for test payloads.

Purpose: ``operators/multimodal.decode_image_features`` prefers PIL,
but this container ships no codecs — without a fallback its real
branch can never execute in-sandbox and only the deterministic fake
path is ever tested. These two families are simple enough to decode
exactly in ~100 lines with no dependencies, which makes the REAL
decode branch (bytes → width/height/channels/mean-intensity through
the Arrow batch path) executable and testable anywhere. Real cluster
images with PIL still take the PIL path first.

Semantics match what PIL reports for the same files: PGM → 1 channel,
PPM → 3, BMP 24-bit → 3 (RGB), BMP 8-bit → 1 channel of palette
indices (PIL mode 'P' yields indices from getdata(), not palette
colors — we mirror that so the two branches agree).
"""

from __future__ import annotations

import struct

MAGICS = (b"P2", b"P3", b"P5", b"P6", b"BM")


def sniff(payload: bytes) -> bool:
    """True when the payload looks like a format this codec decodes."""
    return payload[:2] in MAGICS


def _pnm_tokens(data: bytes, needed: int, start: int):
    """Yield whitespace-separated ASCII tokens, skipping # comments.
    Returns (tokens, offset-after-last-token)."""
    toks: list[bytes] = []
    i = start
    n = len(data)
    while len(toks) < needed and i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace():
                j += 1
            toks.append(data[i:j])
            i = j
    if len(toks) < needed:
        raise ValueError("truncated PNM header")
    return toks, i


def decode(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode to (width, height, channels, flat samples row-major,
    channel-interleaved). Raises ValueError on anything this codec
    does not understand — callers treat that as 'needs PIL'."""
    magic = payload[:2]
    if magic in (b"P5", b"P6"):
        channels = 3 if magic == b"P6" else 1
        (w, h, maxval), off = _pnm_tokens(payload, 3, 2)
        w, h, maxval = int(w), int(h), int(maxval)
        if maxval > 255:
            raise ValueError("16-bit PNM unsupported")
        off += 1  # single whitespace byte after maxval
        n = w * h * channels
        raw = payload[off : off + n]
        if len(raw) != n:
            raise ValueError("truncated PNM pixel data")
        return w, h, channels, list(raw)
    if magic in (b"P2", b"P3"):
        channels = 3 if magic == b"P3" else 1
        (w, h, maxval), off = _pnm_tokens(payload, 3, 2)
        w, h, maxval = int(w), int(h), int(maxval)
        toks, _ = _pnm_tokens(payload, w * h * channels, off)
        return w, h, channels, [int(t) for t in toks]
    if magic == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if comp != 0:
            raise ValueError("compressed BMP unsupported")
        top_down = h < 0
        h = abs(h)
        if bpp == 24:
            channels, per_px = 3, 3
        elif bpp == 8:
            channels, per_px = 1, 1
        else:
            raise ValueError(f"{bpp}-bpp BMP unsupported")
        row_bytes = (w * per_px + 3) & ~3  # rows pad to 4 bytes
        out: list[int] = []
        for row in range(h):
            src_row = row if top_down else h - 1 - row
            base = data_off + src_row * row_bytes
            line = payload[base : base + w * per_px]
            if len(line) != w * per_px:
                raise ValueError("truncated BMP pixel data")
            if bpp == 24:
                # stored BGR; emit RGB like PIL
                for x in range(w):
                    b, g, r = line[3 * x : 3 * x + 3]
                    out.extend((r, g, b))
            else:
                out.extend(line)
        return w, h, channels, out
    raise ValueError(f"unknown image magic {magic!r}")


def features(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, channels, mean_intensity in [0,1] rounded to
    6dp) — the decode_image_features contract."""
    w, h, c, px = decode(payload)
    n = max(len(px), 1)
    return w, h, c, round(sum(px) / (n * 255.0), 6)


# -- encoders (deterministic test-payload builders) ---------------------


def encode_ppm(w: int, h: int, rgb: list[int]) -> bytes:
    """Binary P6; ``rgb`` is flat row-major RGB, w*h*3 values 0..255."""
    assert len(rgb) == w * h * 3
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb)


def encode_pgm(w: int, h: int, gray: list[int]) -> bytes:
    assert len(gray) == w * h
    return b"P5\n%d %d\n255\n" % (w, h) + bytes(gray)


def encode_bmp24(w: int, h: int, rgb: list[int]) -> bytes:
    """Uncompressed bottom-up 24-bit BMP from flat row-major RGB."""
    assert len(rgb) == w * h * 3
    row_bytes = (w * 3 + 3) & ~3
    img = bytearray()
    for row in range(h - 1, -1, -1):  # bottom-up storage
        line = bytearray()
        for x in range(w):
            r, g, b = rgb[3 * (row * w + x) : 3 * (row * w + x) + 3]
            line.extend((b, g, r))
        line.extend(b"\x00" * (row_bytes - len(line)))
        img.extend(line)
    data_off = 14 + 40
    file_size = data_off + len(img)
    head = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
    )
    return head + dib + bytes(img)
