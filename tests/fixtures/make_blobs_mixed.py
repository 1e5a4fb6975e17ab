"""One-time generator for the corrupt-blob quarantine fixture
(tests/fixtures/blobs_mixed/): four valid 24-bit BMPs plus three
deterministically corrupted ones — bad magic, header truncated at 30
bytes, pixel array short by 10 bytes — one per strict-decoder failure
branch the quarantine query routes. Byte-deterministic like
make_blobs.py.

Usage: python tests/fixtures/make_blobs_mixed.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from multithreaded_map_reduce_spark.operators.codecs import encode_bmp  # noqa: E402
from tests.fixtures.make_blobs import blob_params  # noqa: E402


def main() -> None:
    out = REPO / "tests" / "fixtures" / "blobs_mixed"
    out.mkdir(parents=True, exist_ok=True)
    for i in range(4):  # valid
        w, h, raster = blob_params(i + 50)
        (out / f"img_{i:03d}.bmp").write_bytes(encode_bmp(w, h, raster))
    w, h, raster = blob_params(54)
    good = encode_bmp(w, h, raster)
    (out / "img_004.bmp").write_bytes(b"XX" + good[2:])  # bad magic
    (out / "img_005.bmp").write_bytes(good[:30])  # truncated header
    (out / "img_006.bmp").write_bytes(good[:-10])  # truncated pixels
    print(f"wrote 7 blobs to {out}")


if __name__ == "__main__":
    main()
