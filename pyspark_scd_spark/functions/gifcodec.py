"""Vendored minimal GIF87a codec: pure-Python LZW decode (variable
code width, dictionary reconstruction incl. the KwKwK case) and a
real LZW encoder for test payloads.

Purpose: same as imagecodec/audiocodec/videocodec — make the REAL
decode branch executable in-sandbox with zero dependencies. GIF is
the family's first ENTROPY-CODED format (PNG's zlib rides stdlib;
LZW here is implemented from the spec): a hash match on pixel sums
proves the bit-unpacking, the code-width schedule, and the
dictionary reconstruction, byte for byte.

Scope: GIF87a, one image, global color table, no interlace, no
extensions on the encode side (the decoder SKIPS 0x21 extension
blocks, as GIF89a writers emit them). Everything outside that —
interlace, local color tables — raises ValueError ('needs PIL'),
the shared vendored-codec contract.
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def sniff(payload: bytes) -> bool:
    return payload[:6] in GIF_MAGICS


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: LSB-first bit stream, CLEAR and EOI codes,
    code width grows when the dict fills its width (cap 12 bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: [i] for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                next_code = eoi + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError("GIF LZW code out of sequence")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    raise ValueError("GIF LZW stream ended without EOI")


def decode(payload: bytes):
    """-> (width, height, palette, indices): palette is a flat
    [r,g,b,...] list; indices are row-major palette indices."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if not flags & 0x80:
        raise ValueError("GIF without global color table unsupported")
    gct_n = 2 << (flags & 0x07)
    pos = 13
    palette = list(payload[pos : pos + 3 * gct_n])
    if len(palette) != 3 * gct_n:
        raise ValueError("truncated GIF color table")
    pos += 3 * gct_n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            _l, _t, iw, ih, iflags = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            if iflags & 0x80:
                raise ValueError("GIF local color table unsupported")
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            pos += 10
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                data.extend(payload[pos + 1 : pos + 1 + n])
                pos += 1 + n
            idx = _lzw_decode(min_code, bytes(data))
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data short")
            return iw, ih, palette, idx[: iw * ih]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF without image data")


# -- encoder (deterministic test-payload builder) -----------------------


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Real dictionary-building LZW (not the clear-per-pixel
    shortcut), so decoding exercises table growth and width bumps."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev: tuple = ()
    for v in indices:
        cur = prev + (v,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            # GIF encoders bump width when next_code EXCEEDS the
            # current width's range; the decoder mirrors this with
            # its ==(1<<width) check after its own increment
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit_clear_width = width  # noqa: F841 (readability)
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = (v,)
    if prev:
        emit(table[prev])
        # the decoder ADDS an entry while processing this tail code
        # (it adds on every code once primed) — mirror its bookkeeping
        # or the EOI is written one bit narrower than the decoder
        # reads it (hypothesis-found: alternating 2-color stream whose
        # final add lands exactly on a width boundary)
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif87a(
    w: int, h: int, palette: list[int], indices: list[int]
) -> bytes:
    """GIF87a with a global color table. ``palette`` is flat
    [r,g,b,...] with a power-of-two entry count in [2, 256];
    ``indices`` are w*h palette indices."""
    n = len(palette) // 3
    if n & (n - 1) or not 2 <= n <= 256 or len(palette) != 3 * n:
        raise ValueError("palette must be 2^k RGB entries, k in 1..8")
    assert len(indices) == w * h
    bits = max(1, (n - 1).bit_length())
    head = b"GIF87a" + struct.pack(
        "<HHBBB", w, h, 0x80 | (bits - 1), 0, 0
    )
    min_code = max(2, bits)
    lzw = _lzw_encode(min_code, indices)
    body = bytearray()
    body.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
    body.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        body.append(len(chunk))
        body.extend(chunk)
    body.append(0)
    body.append(0x3B)
    return head + bytes(palette) + bytes(body)
