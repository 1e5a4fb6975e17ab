"""One-time generator for the committed binaryFile fixture
(tests/fixtures/blobs/img_NNN.bmp): 24 small real 24-bit BMPs with
deterministic geometry and raster, written by the repo's own strict
encoder. Rerunning reproduces byte-identical files — the fixture is a
pure function of (i), so the Spark binaryFile query and the DuckDB
read_blob oracle always agree on the bytes.

Usage: python tests/fixtures/make_blobs.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from multithreaded_map_reduce_spark.operators.codecs import encode_bmp  # noqa: E402

N_BLOBS = 24


def blob_params(i: int) -> tuple[int, int, bytes]:
    w = i % 13 + 2
    h = i % 9 + 2
    raster = bytes((i * 37 + j * 11) % 256 for j in range(w * h * 3))
    return w, h, raster


def main() -> None:
    out = REPO / "tests" / "fixtures" / "blobs"
    out.mkdir(parents=True, exist_ok=True)
    for i in range(N_BLOBS):
        w, h, raster = blob_params(i)
        (out / f"img_{i:03d}.bmp").write_bytes(encode_bmp(w, h, raster))
    print(f"wrote {N_BLOBS} BMPs to {out}")


if __name__ == "__main__":
    main()
