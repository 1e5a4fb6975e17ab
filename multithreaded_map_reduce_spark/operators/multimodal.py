"""Multimodal column plumbing (§2d tier): opaque ``binary`` media
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
pipelines.

The container has no image/audio libraries, so the actual codec step is
STUBBED (clearly marked below): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless PIL/soundfile import, and the pipeline
falls back to a deterministic fake decode. Everything around the stub —
schemas, binary handling, Arrow batch iteration, partitioning, UDF
signatures — is real and tested; swapping the fake for a real codec is
a one-function change.

Scale notes:
- media bytes travel Spark→Python via Arrow in columnar batches, not
  row-at-a-time pickling;
- ``mapInPandas`` (iterator form) streams batches, so a task never
  materializes its whole partition of blobs;
- repartition by a size-aware key before heavy decode to balance
  skewed media sizes (a 4 GB video next to 10 kB thumbnails).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("declared_bytes", T.LongType()),
                    T.StructField("lang", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, modality string, byte_len long, checksum long, "
    "fake_width int, fake_height int"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Map the documents fixture onto the multimodal shape: the UTF-8
    text bytes stand in for an opaque media blob."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.col("text").cast("binary").alias("media"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").alias("declared_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_image(blob: bytes):  # pragma: no cover - exercised only with PIL
    """STUB: real image decode. Returns (width, height, mode)."""
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as exc:  # the v1 container has no PIL
        raise NotImplementedError("image codec not available in this environment") from exc
    img = Image.open(io.BytesIO(blob))
    return img.width, img.height, img.mode


def _fake_decode(checksum: int) -> tuple[int, int]:
    """Deterministic fake decode used when no codec is available: fake
    dimensions derived from the content checksum (stable, testable)."""
    return int(checksum % 640) + 1, int(checksum % 480) + 1


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media.

    Per blob: byte length, additive checksum mod 2^31-1, and decoded
    dimensions (real codec if importable, deterministic fake otherwise).
    """
    import numpy as np
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            blobs = pdf["media"]
            byte_len = blobs.map(len).astype("int64")
            checksum = blobs.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()) % 2_147_483_647
            ).astype("int64")
            dims = checksum.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": byte_len,
                    "checksum": checksum,
                    "fake_width": dims.map(lambda t: t[0]).astype("int32"),
                    "fake_height": dims.map(lambda t: t[1]).astype("int32"),
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def resize_stub(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """STUB: resize plumbing — emits target geometry + size estimate;
    the pixel work would live inside the mapInPandas batch fn."""
    return extract_media_features(media).select(
        "media_id",
        F.lit(target_w).alias("width"),
        F.lit(target_h).alias("height"),
        (F.col("byte_len") * F.lit(target_w) * F.lit(target_h)
         / (F.col("fake_width") * F.col("fake_height"))).cast("long").alias("est_bytes"),
    )
