"""Vendored minimal video codec: pure-Python YUV4MPEG2 (.y4m) encode
and decode, planar C444/C420 8-bit frames.

Purpose: the video analogue of ``functions/audiocodec`` — this
container ships no ffmpeg/opencv, so without a vendored parser the
video branch of the multimodal suite could only byte-slice opaque
blobs. Y4M is a REAL interchange format (ffmpeg's uncompressed pipe
format: a text header, then ``FRAME`` markers with raw planar YUV),
simple enough to parse exactly in ~80 lines, which makes genuine
decode → per-frame feature extraction executable and testable
anywhere. Compressed codecs (H.264/VP9/AV1) stay behind
NotImplementedError — those need a real library.

Layout: ``YUV4MPEG2 W<w> H<h> F<n>:<d> [Ip A1:1 C444]\\n`` then per
frame ``FRAME[ params]\\n`` + Y plane (w·h bytes) + U + V planes
(w·h for C444; w/2·h/2 for C420 variants).
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2 "


def sniff(payload: bytes) -> bool:
    """True when the payload looks like a YUV4MPEG2 stream."""
    return payload[: len(MAGIC)] == MAGIC


def encode_y4m(
    frames,
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C444",
) -> bytes:
    """Encode frames as a Y4M stream.

    ``frames``: iterable of (y_plane, u_plane, v_plane) byte strings /
    byte lists, each plane ``width*height`` long for C444 (the only
    colorspace this encoder writes — full-resolution planes keep the
    pixel arithmetic exact and index-simple)."""
    if colorspace != "C444":
        raise ValueError("encoder writes C444 only")
    plane_len = width * height
    out = [
        MAGIC
        + f"W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C444".encode()
        + b"\n"
    ]
    for y, u, v in frames:
        y, u, v = bytes(y), bytes(u), bytes(v)
        if not (len(y) == len(u) == len(v) == plane_len):
            raise ValueError(
                f"C444 planes must each be {plane_len} bytes"
            )
        out.append(b"FRAME\n" + y + u + v)
    return b"".join(out)


def decode_y4m(payload: bytes):
    """Parse a Y4M stream → (meta dict, list of (y, u, v) plane bytes).

    meta: width, height, fps_num, fps_den, colorspace, n_frames.
    Handles C444 and the C420 family (C420, C420jpeg, C420mpeg2,
    C420paldv — all share the half-resolution chroma plane layout).
    Truncated frames FAIL loudly (the audiocodec contract: a codec
    that exists to prove byte-exact decode must never return
    plausible-but-wrong planes). Unknown colorspaces raise
    NotImplementedError."""
    if not sniff(payload):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = None
    fps_num, fps_den, cs = 25, 1, "C420jpeg"  # Y4M defaults
    for tok in payload[len(MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:]
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C":
            cs = tok.decode()
    if width is None or height is None:
        raise ValueError("missing W/H in stream header")
    if cs == "C444":
        luma, chroma = width * height, width * height
    elif cs.startswith("C420"):
        luma = width * height
        chroma = (width // 2) * (height // 2)
    else:
        raise NotImplementedError(
            f"colorspace {cs}: only C444/C420* decode without a "
            "video library"
        )
    frames = []
    pos = nl + 1
    frame_len = luma + 2 * chroma
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + frame_len > len(payload):
            raise ValueError(
                f"truncated frame {len(frames)}: {frame_len} plane "
                f"bytes declared, {len(payload) - pos} present"
            )
        y = payload[pos : pos + luma]
        u = payload[pos + luma : pos + luma + chroma]
        v = payload[pos + luma + chroma : pos + frame_len]
        frames.append((y, u, v))
        pos += frame_len
    meta = {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": cs,
        "n_frames": len(frames),
    }
    return meta, frames
