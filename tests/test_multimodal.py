"""Multimodal plumbing: binary columns, Arrow batches, stubbed decode."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_oracle_parity(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    n = compare(
        spark,
        ALL_QUERIES["multimodal_features"],
        ALL_ORACLES["multimodal_features"],
        SF_SMOKE,
    )
    assert n > 0


def test_media_schema(spark):
    from multithreaded_map_reduce_spark.operators.multimodal import documents_as_media
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    media = documents_as_media(load_table(spark, SF_SMOKE, "documents"))
    types = dict(media.dtypes)
    assert types["media"] == "binary"
    assert types["modality"] == "string"
    row = media.first()
    assert isinstance(row["media"], (bytes, bytearray))
    assert row["meta"]["declared_bytes"] == len(row["media"])  # ASCII fixture


def test_decode_stub_gated():
    """Real codec path is cleanly gated behind the import."""
    from multithreaded_map_reduce_spark.operators.multimodal import decode_image

    try:
        import PIL  # type: ignore # noqa

        pytest.skip("PIL available; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image")


def test_ppm_codec_roundtrip():
    from multithreaded_map_reduce_spark.operators.codecs import decode_ppm, encode_ppm

    pixels = bytes(range(2 * 3 * 3)) * 1
    blob = encode_ppm(2, 3, pixels)
    assert decode_ppm(blob) == (2, 3, 255, pixels)


def test_ppm_decoder_handles_comments_and_whitespace():
    from multithreaded_map_reduce_spark.operators.codecs import decode_ppm

    pixels = b"\x01\x02\x03"
    blob = b"P6 # a comment\n # another\n\t1\r\n1 \n255\n" + pixels
    assert decode_ppm(blob) == (1, 1, 255, pixels)


def test_ppm_decoder_rejects_malformed():
    import pytest

    from multithreaded_map_reduce_spark.operators.codecs import decode_ppm, encode_ppm

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00\x00\x00")  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(b"P6\nx 1\n255\n\x00\x00\x00")  # non-numeric token
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(2, 2, bytes(12))[:-3])  # truncated raster


def test_multimodal_decode_oracle(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark,
        ALL_QUERIES["multimodal_decode"],
        ALL_ORACLES["multimodal_decode"],
        SF_SMOKE,
    ) > 0


def test_wav_codec_roundtrip_and_chunk_walk():
    from multithreaded_map_reduce_spark.operators.codecs import decode_wav, encode_wav

    pcm = bytes(range(101))  # odd length: exercises word-align padding math
    blob = encode_wav(16000, pcm)
    assert decode_wav(blob) == (16000, 1, 8, pcm)
    # unknown chunk before fmt/data must be skipped by declared size
    import struct

    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded odd chunk
    patched = blob[:12] + extra + blob[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav(patched) == (16000, 1, 8, pcm)


def test_wav_decoder_rejects_malformed():
    import pytest

    from multithreaded_map_reduce_spark.operators.codecs import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + bytes(40))  # bad magic
    with pytest.raises(ValueError):
        decode_wav(encode_wav(8000, bytes(10))[:-4])  # truncated data


def test_multimodal_audio_oracle(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark,
        ALL_QUERIES["multimodal_audio"],
        ALL_ORACLES["multimodal_audio"],
        SF_SMOKE,
    ) > 0


def test_bmp_codec_roundtrip_stride_and_flip():
    """Encode writes bottom-up padded rows; decode must restore the
    exact top-down unpadded raster and report the real stride."""
    from multithreaded_map_reduce_spark.operators.codecs import decode_bmp, encode_bmp

    px = bytes((i * 7) % 256 for i in range(5 * 3 * 3))  # 5x3, stride 16 != 15
    blob = encode_bmp(5, 3, px)
    w, h, stride, out = decode_bmp(blob)
    assert (w, h, stride) == (5, 3, 16)
    assert out == px
    assert len(blob) == 54 + stride * 3
    # width divisible by 4 → no padding
    px4 = bytes(4 * 2 * 3)
    assert decode_bmp(encode_bmp(4, 2, px4))[2] == 12


def test_bmp_decoder_rejects_malformed():
    import pytest as _pytest

    from multithreaded_map_reduce_spark.operators.codecs import decode_bmp, encode_bmp

    blob = encode_bmp(2, 2, bytes(12))
    for bad in [b"XX" + blob[2:], blob[:40], blob[:-1]]:
        with _pytest.raises(ValueError):
            decode_bmp(bad)


def test_multimodal_bmp_oracle(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["multimodal_bmp"], ALL_ORACLES["multimodal_bmp"], SF_SMOKE
    ) > 0

def test_resize_real(spark):
    """Nearest-neighbor resize on a hand-checkable 2x1 -> 4x3 case."""
    from multithreaded_map_reduce_spark.operators.codecs import encode_ppm
    from multithreaded_map_reduce_spark.operators.multimodal import (
        resize_image_features,
    )

    # 2x1 raster: pixel0 = (1,2,3), pixel1 = (10, 20, 30)
    blob = encode_ppm(2, 1, bytes([1, 2, 3, 10, 20, 30]))
    media = spark.createDataFrame([(1, bytearray(blob))], "media_id long, media binary")
    row = resize_image_features(media, 4, 3).collect()[0]
    # sx = [0,0,1,1] per row, 3 rows -> 2 copies of each pixel x 3 rows
    expected = 3 * (2 * (1 + 2 + 3) + 2 * (10 + 20 + 30))
    assert (row["out_w"], row["out_h"]) == (4, 3)
    assert row["resized_checksum"] == expected
