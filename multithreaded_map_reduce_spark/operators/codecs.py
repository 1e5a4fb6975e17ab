"""Pure-Python media codecs for the multimodal tier.

The container ships no image/audio libraries (no PIL, no soundfile), so
the "real codec" obligation is met with trivial-but-genuine containers:
binary PPM (P6) for images and RIFF/WAV (PCM u8 mono) for audio. Both
decoders are strict parsers — magic checks, chunk/header walks, length
validation — not lookups of metadata stashed elsewhere; feeding them
corrupted bytes raises.

These run INSIDE Arrow-batched ``mapInPandas`` functions
(operators/multimodal.py), never per-row Python UDFs.
"""

from __future__ import annotations

import struct


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255). ``pixels`` must be width*height*3
    bytes of RGB data."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"raster is {len(pixels)} bytes, need {width * height * 3}"
        )
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


def decode_ppm(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM: returns (width, height, maxval, pixels).

    Handles the container's real grammar — arbitrary whitespace between
    header tokens and ``#`` comments through end-of-line — and raises
    ``ValueError`` on anything malformed (wrong magic, non-numeric
    header token, truncated raster)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM (bad magic)")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(blob):
            c = blob[pos : pos + 1]
            if c in (b" ", b"\t", b"\r", b"\n"):
                pos += 1
            elif c == b"#":
                nl = blob.find(b"\n", pos)
                pos = len(blob) if nl == -1 else nl + 1
            else:
                break
        start = pos
        while pos < len(blob) and blob[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("bad PPM header token")
        vals.append(int(blob[start:pos]))
    width, height, maxval = vals
    pos += 1  # exactly one whitespace byte separates maxval from raster
    pixels = blob[pos : pos + width * height * 3]
    if len(pixels) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return width, height, maxval, pixels


def encode_wav(sample_rate: int, samples: bytes) -> bytes:
    """RIFF/WAV container around unsigned-8-bit mono PCM."""
    n = len(samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8)
        + b"data"
        + struct.pack("<I", n)
        + samples
    )


def decode_wav(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a RIFF/WAV file: returns (sample_rate, channels,
    bits_per_sample, pcm_bytes).

    Walks the real chunk grammar — RIFF/WAVE magic, then arbitrary
    chunks until ``fmt `` and ``data`` are both seen (unknown chunks are
    skipped by their declared size, including the odd-size pad byte).
    Raises ``ValueError`` on bad magic, missing chunks, or truncation."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file (bad magic)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob) and (fmt is None or data is None):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            _audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt = (rate, channels, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return fmt[0], fmt[1], fmt[2], data


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Windows BMP (BITMAPINFOHEADER, 24-bit BI_RGB). ``pixels`` is the
    TOP-DOWN unpadded raster (width*height*3); the encoder writes the
    real on-disk layout — rows bottom-up, each padded to a 4-byte
    stride — so the decoder has genuine work to undo."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"raster is {len(pixels)} bytes, need {width * height * 3}"
        )
    row = 3 * width
    stride = (row + 3) & ~3
    pad = b"\x00" * (stride - row)
    body = b"".join(
        pixels[y * row : (y + 1) * row] + pad for y in range(height - 1, -1, -1)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + body


def decode_bmp(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a 24-bit uncompressed BMP: returns (width, height,
    row_stride, pixels) with pixels re-assembled TOP-DOWN and unpadded.

    Strict about the real format: 'BM' magic, pixel-array offset from
    the file header, 40-byte BITMAPINFOHEADER, bpp 24, BI_RGB only,
    bottom-up (positive height), full-stride rows present. Raises
    ``ValueError`` otherwise."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    (_file_size, _r1, _r2, offset) = struct.unpack_from("<IHHI", blob, 2)
    (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if hdr_size != 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    if width <= 0 or height <= 0:
        raise ValueError("top-down or degenerate BMP not supported")
    row = 3 * width
    stride = (row + 3) & ~3
    need = offset + stride * height
    if len(blob) < need:
        raise ValueError("truncated BMP pixel array")
    rows = [
        blob[offset + y * stride : offset + y * stride + row]
        for y in range(height - 1, -1, -1)
    ]
    return width, height, stride, b"".join(rows)
