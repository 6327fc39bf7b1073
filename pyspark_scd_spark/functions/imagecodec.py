"""Vendored minimal image codec: pure-Python PPM/PGM (P2/P3/P5/P6),
uncompressed BMP, and 8-bit PNG (gray/RGB/RGBA, all five filters —
stdlib zlib inflate) decode, plus encoders for test payloads.

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
import zlib

MAGICS = (b"P2", b"P3", b"P5", b"P6", b"BM")
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(payload: bytes) -> bool:
    """True when the payload looks like a format this codec decodes."""
    return payload[:2] in MAGICS or payload[:8] == PNG_MAGIC


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
    if payload[:8] == PNG_MAGIC:
        return _decode_png(payload)
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


_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit only)


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (RFC 2083 §6.6): pick whichever of
    left/up/up-left is closest to a+b-c, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> tuple[int, int, int, list[int]]:
    """8-bit non-interlaced PNG (color types 0/2/6): chunk walk with
    CRC verification, concatenated-IDAT zlib inflate, and per-row
    reverse of all five scanline filters. Raises ValueError on
    anything outside that envelope (16-bit, palette, Adam7) — callers
    treat that as 'needs PIL', same contract as the other formats."""
    pos = 8
    ihdr = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"PNG depth={depth} color={color} unsupported"
        )
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("PNG compression/filter/interlace unsupported")
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG inflated size mismatch")
    out = bytearray(h * stride)
    prev_start = -1
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        cur_start = row * stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            if row:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if row else 0
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if row else 0
                ul = (
                    out[prev_start + i - channels]
                    if (row and i >= channels)
                    else 0
                )
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[cur_start : cur_start + stride] = line
        prev_start = cur_start
    return w, h, channels, list(out)


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


def encode_png(
    w: int, h: int, channels: int, samples: list[int]
) -> bytes:
    """8-bit PNG from flat row-major channel-interleaved samples
    (channels: 1 gray / 3 RGB / 4 RGBA). Each row is filtered with
    ``row % 5`` — None, Sub, Up, Average, Paeth in rotation — so a
    payload taller than 4 rows forces a decoder through every filter
    reconstruction, not just the trivial one."""
    assert len(samples) == w * h * channels
    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = w * channels
    raw = bytearray()
    prev = bytes(stride)
    for row in range(h):
        cur = bytes(
            samples[row * stride : (row + 1) * stride]
        )
        ftype = row % 5
        raw.append(ftype)
        if ftype == 0:
            raw.extend(cur)
        elif ftype == 1:
            raw.extend(
                (cur[i] - (cur[i - channels] if i >= channels else 0))
                & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:
            raw.extend(
                (cur[i] - prev[i]) & 0xFF for i in range(stride)
            )
        elif ftype == 3:
            raw.extend(
                (
                    cur[i]
                    - (
                        ((cur[i - channels] if i >= channels else 0)
                         + prev[i])
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raw.extend(
                (
                    cur[i]
                    - _paeth(
                        cur[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = cur

    def _chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(
                ">I", zlib.crc32(ctype + body) & 0xFFFFFFFF
            )
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


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
