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


def test_resize_stub(spark):
    from multithreaded_map_reduce_spark.operators.multimodal import (
        documents_as_media,
        resize_stub,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    media = documents_as_media(load_table(spark, SF_SMOKE, "documents"))
    out = resize_stub(media, 64, 64)
    rows = out.collect()
    assert all(r["width"] == 64 and r["height"] == 64 and r["est_bytes"] >= 0 for r in rows)
