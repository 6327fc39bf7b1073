"""Vendored minimal audio codec: pure-Python RIFF/WAVE PCM encode and
decode (8/16-bit integer PCM, any channel count).

Purpose: the audio analogue of ``functions/imagecodec`` — this
container ships no librosa/soundfile/ffmpeg, so without a vendored
parser the audio branch of the multimodal suite could only ever run a
deterministic fake. Uncompressed WAV is a ~40-line chunked container:
parsing it exactly makes the REAL decode path (bytes → sample matrix →
features through the Arrow batch path) executable and testable
anywhere. Real cluster images with soundfile/librosa would take the
library path first in a production build; compressed codecs (MP3/OGG/
AAC) stay behind NotImplementedError.

Layout (RIFF little-endian): ``RIFF <size> WAVE`` then chunks; the
``fmt `` chunk carries (audio_format, n_channels, sample_rate,
byte_rate, block_align, bits_per_sample), the ``data`` chunk the
interleaved PCM frames. 16-bit samples are signed LE; 8-bit are
UNSIGNED with a 128 bias (the WAV convention) — ``decode_wav``
re-centers them to signed so both widths yield comparable features.
"""

from __future__ import annotations

import struct

MAGIC = b"RIFF"


def sniff(payload: bytes) -> bool:
    """True when the payload looks like a RIFF/WAVE container."""
    return payload[:4] == MAGIC and payload[8:12] == b"WAVE"


def encode_wav(
    samples,
    sample_rate: int,
    n_channels: int = 1,
    bits_per_sample: int = 16,
) -> bytes:
    """Encode interleaved integer samples as an uncompressed PCM WAV.

    ``samples``: flat iterable of ints, channel-interleaved. 16-bit
    input range [-32768, 32767]; 8-bit input range [-128, 127]
    (biased to unsigned on disk per the WAV convention).
    """
    if bits_per_sample not in (8, 16):
        raise ValueError("only 8/16-bit integer PCM")
    # numpy fast path (r13): an int array encodes as its
    # little-endian int16 buffer — byte-identical to struct.pack
    # ('<Nh') — with the same loud out-of-range failure (astype
    # would silently wrap where struct.pack raises).
    if bits_per_sample == 16 and type(samples).__module__ == "numpy":
        import numpy as np

        arr = np.asarray(samples)
        if arr.size and (arr.min() < -32768 or arr.max() > 32767):
            raise ValueError(
                "16-bit sample out of range in numpy input"
            )
        data = arr.astype("<i2").tobytes()
    elif bits_per_sample == 16:
        samples = list(samples)
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        # validate like the 16-bit path (struct.pack raises there):
        # silently wrapping an out-of-range sample would corrupt the
        # round-trip instead of failing loudly
        samples = list(samples)
        bad = next((s for s in samples if not -128 <= s <= 127), None)
        if bad is not None:
            raise ValueError(f"8-bit sample out of range: {bad}")
        data = bytes((s + 128) & 0xFF for s in samples)
    block_align = n_channels * bits_per_sample // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate,
        block_align, bits_per_sample,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks pad to even
    )
    return MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Parse a PCM WAV → (meta dict, flat signed-int sample list).

    meta: sample_rate, n_channels, bits_per_sample, n_frames (frames =
    sample ticks; total samples = n_frames * n_channels). Walks the
    chunk list properly (skipping LIST/INFO etc.), so files from other
    writers parse too. Raises NotImplementedError for non-PCM
    audio_format (compressed codecs need a real library).
    """
    if not sniff(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            # a truncated file must FAIL, not silently decode fewer
            # frames — this codec's purpose is proving byte-exact
            # decode, so wrong-but-plausible output is the worst mode
            raise ValueError(
                f"truncated {cid!r} chunk: header says {clen} bytes, "
                f"{len(body)} present"
            )
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError(f"fmt chunk too short: {clen} bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"audio_format={audio_format}/bits={bits}: only uncompressed "
            "8/16-bit PCM decodes without an audio library"
        )
    if bits == 16:
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    else:
        samples = [b - 128 for b in data]
    meta = {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bits,
        "n_frames": len(samples) // max(n_channels, 1),
    }
    return meta, samples
