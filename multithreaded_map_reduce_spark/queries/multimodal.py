"""Multimodal gate queries.

``multimodal_features`` runs the Arrow-batched binary pipeline
(mapInPandas) and STILL has an exact DuckDB oracle: the media blobs are
the documents' UTF-8 bytes, and the oracle recomputes byte length and
the additive byte checksum over the actual UTF-8 encoding
(``hex(encode(text))`` → per-byte values), so non-ASCII documents hash
identically on both sides. This differentially tests the Python/Arrow
path itself against the JVM-free oracle, not just JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    documents_as_bmp_images,
    extract_bmp_features,
    documents_as_media,
    documents_as_ppm_images,
    documents_as_wav_audio,
    extract_audio_features,
    extract_image_features,
    extract_media_features,
)
from ..sources.catalog import load_table


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(documents_as_media(docs))


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip under the gate: synthesize binary PPM blobs
    (dims from doc_id, raster = UTF-8 text bytes cycled), parse them
    with the strict pure-Python decoder, and emit decoded geometry +
    raster checksum. The oracle recomputes every feature arithmetically
    from doc_id and the text bytes — if either the encoder or the
    parser mishandles one byte, the hash comparison fails."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_image_features(documents_as_ppm_images(docs))


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of multimodal_decode: RIFF/WAV chunk-walk parse of
    synthesized PCM blobs, with the same arithmetic oracle discipline."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_audio_features(documents_as_wav_audio(docs))


def multimodal_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third codec round-trip: 24-bit BMP with real layout grammar —
    4-byte row-stride padding and bottom-up row order that the strict
    decoder must undo byte-exactly. The oracle recomputes geometry,
    the padded on-disk size, and the top-down raster checksum purely
    arithmetically from doc_id + text bytes."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_bmp_features(documents_as_bmp_images(docs))


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_decode": multimodal_decode,
    "multimodal_audio": multimodal_audio,
    "multimodal_bmp": multimodal_bmp,
}

# Additive checksum over the UTF-8 BYTES (not codepoints): decode each
# 2-hex-digit byte of hex(encode(text)) — exact for non-ASCII text too.
_HEXDIG = "'0123456789ABCDEF'"
_BYTE_AT = (
    f"CAST((strpos({_HEXDIG}, substring(_hx, (i-1)*2+1, 1)) - 1) * 16"
    f" + (strpos({_HEXDIG}, substring(_hx, (i-1)*2+2, 1)) - 1) AS BIGINT)"
)
_CHECKSUM = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(range(1, CAST(octet_length(encode(text)) AS INTEGER) + 1), "
    f"i -> {_BYTE_AT})), "
    "(x, y) -> x + y) % 2147483647"
)

# Raster checksum of the PPM round-trip: the raster is the text's UTF-8
# bytes cycled to w*h*3 bytes, so its sum = full_cycles * (total byte
# sum) + (prefix sum of the first npix % tb bytes) — pure arithmetic.
_BYTESUM = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(range(1, CAST(_tb AS INTEGER) + 1), "
    f"i -> {_BYTE_AT})), "
    "(x, y) -> x + y)"
)
_PREFIXSUM_R = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    f"list_transform(range(1, CAST(_r AS INTEGER) + 1), "
    f"i -> {_BYTE_AT})), "
    "(x, y) -> x + y)"
)

ORACLES = {
    "multimodal_audio": f"""
        WITH sized AS (
            SELECT doc_id,
                   hex(encode(text)) AS _hx,
                   CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
                   CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
                   CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples,
                   (CAST(doc_id % 500 + 100 AS BIGINT))
                       % CAST(octet_length(encode(text)) AS BIGINT) AS _r
            FROM documents WHERE length(text) > 0
        )
        SELECT doc_id AS media_id,
               44 + n_samples AS byte_len,  -- RIFF(12) + fmt(24) + data hdr(8)
               sample_rate,
               1 AS channels,
               8 AS bits,
               n_samples,
               ((n_samples // _tb) * {_BYTESUM} + {_PREFIXSUM_R}) % 2147483647
                   AS sample_checksum
        FROM sized
    """,
    "multimodal_decode": None,  # filled below via ppm_decode_oracle()
}


def ppm_decode_oracle(where: str = "length(text) > 0") -> str:
    """The PPM decode-feature oracle as a TEMPLATE taking the WHERE
    clause as a parameter — shared with connector_binaryfile_decode,
    which previously patched this SQL with a post-hoc ``.replace()``
    (ADVICE r4: a reworded anchor silently no-ops the replace and
    diverges the oracle; the failure class of commit a4c766f)."""
    return f"""
        WITH geom AS (
            SELECT doc_id,
                   hex(encode(text)) AS _hx,
                   CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
                   CAST(doc_id % 16 + 1 AS INTEGER) AS width,
                   CAST(doc_id % 12 + 1 AS INTEGER) AS height
            FROM documents WHERE {where}
        ), sized AS (
            SELECT *,
                   CAST(width AS BIGINT) * height * 3 AS _npix,
                   (CAST(width AS BIGINT) * height * 3) % _tb AS _r
            FROM geom
        )
        SELECT doc_id AS media_id,
               -- 'P6\\n' + 'w h\\n' + '255\\n' + raster
               3 + length(CAST(width AS VARCHAR)) + 1
                 + length(CAST(height AS VARCHAR)) + 1 + 4 + _npix AS byte_len,
               width,
               height,
               255 AS maxval,
               ((_npix // _tb) * {_BYTESUM} + {_PREFIXSUM_R}) % 2147483647
                   AS pix_checksum
        FROM sized
    """


ORACLES["multimodal_decode"] = ppm_decode_oracle()

ORACLES.update({
    "multimodal_features": f"""
        WITH hexed AS (
            SELECT doc_id, text, hex(encode(text)) AS _hx FROM documents
        )
        SELECT doc_id AS media_id,
               'text' AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST({_CHECKSUM} AS BIGINT) AS checksum,
               CAST(({_CHECKSUM}) % 640 + 1 AS INTEGER) AS fake_width,
               CAST(({_CHECKSUM}) % 480 + 1 AS INTEGER) AS fake_height
        FROM hexed
    """,
    "multimodal_bmp": f"""
        WITH geom AS (
            SELECT doc_id,
                   hex(encode(text)) AS _hx,
                   CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
                   CAST(doc_id % 13 + 1 AS INTEGER) AS width,
                   CAST(doc_id % 9 + 1 AS INTEGER) AS height
            FROM documents WHERE length(text) > 0
        ), sized AS (
            SELECT *,
                   CAST(width AS BIGINT) * height * 3 AS _npix,
                   (CAST(width AS BIGINT) * height * 3) % _tb AS _r,
                   -- 4-byte-aligned row stride: (3w + 3) & ~3
                   CAST(((3 * width + 3) // 4) * 4 AS INTEGER) AS row_stride
            FROM geom
        )
        SELECT doc_id AS media_id,
               54 + CAST(row_stride AS BIGINT) * height AS byte_len,
               width,
               height,
               row_stride,
               ((_npix // _tb) * {_BYTESUM} + {_PREFIXSUM_R}) % 2147483647
                   AS pix_checksum
        FROM sized
    """,
})


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor image resize under the gate: PPM decode →
    (4×3) resample → resized-raster checksum. The oracle replays every
    output byte arithmetically: target pixel (ty,tx,c) reads source
    byte ((⌊ty·h/3⌋·w + ⌊tx·w/4⌋)·3 + c) mod len(text-bytes)."""
    from ..operators.multimodal import resize_image_features

    docs = load_table(spark, sf_dir, "documents")
    return resize_image_features(documents_as_ppm_images(docs), 4, 3)


QUERIES["multimodal_resize"] = multimodal_resize


def _byte_at(idx_expr: str) -> str:
    """DuckDB: text byte value at 0-based index ``idx_expr`` of the
    UTF-8 encoding (via the hex(encode(text)) string ``_hx``)."""
    return (
        f"CAST((strpos({_HEXDIG}, substring(_hx, ({idx_expr})*2+1, 1)) - 1) * 16"
        f" + (strpos({_HEXDIG}, substring(_hx, ({idx_expr})*2+2, 1)) - 1) AS BIGINT)"
    )


_TW, _TH = 4, 3
# output byte o in [0, 3*tw*th): channel c=o%3, tx=(o//3)%tw, ty=o//(3*tw)
_SRC_IDX = (
    f"(((((o // {3 * _TW}) * h) // {_TH}) * w"
    f" + (((o // 3) % {_TW}) * w) // {_TW}) * 3 + (o % 3)) % _tb"
)

ORACLES["multimodal_resize"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 16 + 1 AS BIGINT) AS w,
               CAST(doc_id % 12 + 1 AS BIGINT) AS h
        FROM documents WHERE length(text) > 0
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS src_w,
           CAST(h AS INTEGER) AS src_h,
           CAST({_TW} AS INTEGER) AS out_w,
           CAST({_TH} AS INTEGER) AS out_h,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(0, {3 * _TW * _TH}),
                   o -> {_byte_at(_SRC_IDX)})),
               (x, y) -> x + y) % 2147483647 AS resized_checksum
    FROM sized
"""


def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame-sampling under the gate: WAV decode → every-4th
    PCM sample → frame count + checksum, oracle-replayed byte-by-byte."""
    from ..operators.multimodal import frame_sample_audio_features

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_audio_features(documents_as_wav_audio(docs), every=4)


QUERIES["multimodal_framesample"] = multimodal_framesample

_EVERY = 4

ORACLES["multimodal_framesample"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples
        FROM documents WHERE length(text) > 0
    )
    SELECT doc_id AS media_id,
           n_samples,
           (n_samples + {_EVERY - 1}) // {_EVERY} AS n_frames,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(0, CAST((n_samples + {_EVERY - 1}) // {_EVERY} AS INTEGER)),
                   j -> {_byte_at(f"(j * {_EVERY}) % _tb")})),
               (x, y) -> x + y) % 2147483647 AS frame_checksum
    FROM sized
"""


def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: 64-bit dHash per synthesized PPM (as two
    BIGINT halves — bit 63 would overflow a signed weight) plus the
    exact-duplicate group size per hash. The oracle recomputes the
    WHOLE pipeline — decode geometry, integer grayscale, 9×8
    nearest-neighbor downsample, gradient bits — arithmetically from
    (doc_id, text), so the perceptual hash is differentially verified
    bit-for-bit."""
    from pyspark.sql import Window as W_

    from ..operators.multimodal import extract_image_dhash

    docs = load_table(spark, sf_dir, "documents")
    d = extract_image_dhash(documents_as_ppm_images(docs))
    w = W_.partitionBy("dhash_lo", "dhash_hi")
    return d.withColumn(
        "n_same", F.count(F.lit(1)).over(w)
    ).select("media_id", "dhash_lo", "dhash_hi", "n_same")


QUERIES["multimodal_phash"] = multimodal_phash

# gray value of downsampled grid cell j (0..71, row-major over 8 rows ×
# 9 cols): source pixel (r,c) = ((j//9)·H//8, (j%9)·W//9), raster byte
# base p0 = 3·(r·W + c), gray = (b0+b1+b2) // 3
_PH_P0 = "(3 * (((j // 9) * height // 8) * width + ((j % 9) * width // 9)))"
_PH_GRAY = (
    f"({_byte_at(f'({_PH_P0}) % _tb')} + {_byte_at(f'({_PH_P0} + 1) % _tb')}"
    f" + {_byte_at(f'({_PH_P0} + 2) % _tb')}) // 3"
)


def _ph_half(lo_bit: int) -> str:
    # sum of gradient bits (g[r][c] < g[r][c+1]) weighted 2^(j - lo_bit)
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range({lo_bit}, {lo_bit + 32}), "
        "j -> CASE WHEN g[CAST((j // 8) * 9 + (j % 8) AS INTEGER) + 1] "
        "< g[CAST((j // 8) * 9 + (j % 8) AS INTEGER) + 2] "
        f"THEN CAST(1 AS BIGINT) << CAST(j - {lo_bit} AS INTEGER) "
        "ELSE CAST(0 AS BIGINT) END)), (x, y) -> x + y)"
    )


ORACLES["multimodal_phash"] = f"""
    WITH geom AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 16 + 1 AS BIGINT) AS width,
               CAST(doc_id % 12 + 1 AS BIGINT) AS height
        FROM documents WHERE length(text) > 0
    ), grays AS (
        SELECT media_id,
               list_transform(range(0, 72), j -> {_PH_GRAY}) AS g
        FROM geom
    ), hashes AS (
        SELECT media_id,
               {_ph_half(0)} AS dhash_lo,
               {_ph_half(32)} AS dhash_hi
        FROM grays
    )
    SELECT media_id, dhash_lo, dhash_hi,
           count(*) OVER (PARTITION BY dhash_lo, dhash_hi) AS n_same
    FROM hashes
"""


# ----------------------------------- perceptual near-dup (banded dHash)
# Image near-duplicate detection — the multimodal twin of
# dedup_simhash's banding: the 64-bit dHash splits into 8 bands of
# 8 bits, candidates share >= 1 band, survivors verify exact Hamming
# distance <= HAM_K. With HAM_K = 7 < 8 bands the scheme is LOSSLESS by
# pigeonhole (7 differing bits cannot touch all 8 bands), so banding is
# pure pruning — same guarantee discipline as the minhash/simhash
# rungs, and the oracle replays banding + cap + verify exactly.
# Hot bands (tiny constant-gradient images collide hard) are capped at
# HAM_CAP distinct images before pair expansion, replayed by the
# oracle — the standard boilerplate-bucket rail.

HAM_BANDS = 8
HAM_K = 7  # < HAM_BANDS -> pigeonhole-lossless
HAM_CAP = 100


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_image_dhash

    docs = load_table(spark, sf_dir, "documents")
    d = extract_image_dhash(documents_as_ppm_images(docs))
    band_structs = []
    for b in range(HAM_BANDS):
        src = F.col("dhash_lo") if b < 4 else F.col("dhash_hi")
        band_structs.append(
            F.struct(
                F.lit(b).cast("long").alias("band_id"),
                F.shiftright(src, 8 * (b % 4)).bitwiseAND(F.lit(255)).alias(
                    "band_val"
                ),
            )
        )
    bands = d.select(
        "media_id", F.explode(F.array(*band_structs)).alias("s")
    ).select("media_id", F.col("s.band_id").alias("band_id"), F.col("s.band_val").alias("band_val"))
    sizes = bands.groupBy("band_id", "band_val").agg(
        F.countDistinct("media_id").alias("_n")
    )
    capped = bands.join(
        sizes.filter(F.col("_n") <= HAM_CAP).select("band_id", "band_val"),
        ["band_id", "band_val"],
    )
    a, bb = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"), F.col("b.media_id").alias("id_b")
        )
        .distinct()
    )
    ha = d.select(
        F.col("media_id").alias("id_a"),
        F.col("dhash_lo").alias("lo_a"),
        F.col("dhash_hi").alias("hi_a"),
    )
    hb = d.select(
        F.col("media_id").alias("id_b"),
        F.col("dhash_lo").alias("lo_b"),
        F.col("dhash_hi").alias("hi_b"),
    )
    hamming = (
        F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
        + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    ).cast("int")
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= HAM_K)
    )


QUERIES["multimodal_phash_neardup"] = multimodal_phash_neardup

ORACLES["multimodal_phash_neardup"] = f"""
    WITH geom AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 16 + 1 AS BIGINT) AS width,
               CAST(doc_id % 12 + 1 AS BIGINT) AS height
        FROM documents WHERE length(text) > 0
    ), grays AS (
        SELECT media_id,
               list_transform(range(0, 72), j -> {_PH_GRAY}) AS g
        FROM geom
    ), hashes AS (
        SELECT media_id,
               {_ph_half(0)} AS dhash_lo,
               {_ph_half(32)} AS dhash_hi
        FROM grays
    ), bands AS (
        SELECT media_id, t.b AS band_id,
               CASE WHEN t.b < 4 THEN (dhash_lo >> CAST(8 * t.b AS INTEGER)) & 255
                    ELSE (dhash_hi >> CAST(8 * (t.b - 4) AS INTEGER)) & 255
               END AS band_val
        FROM hashes, (SELECT unnest(range(0, {HAM_BANDS})) AS b) t
    ), sizes AS (
        SELECT band_id, band_val, count(DISTINCT media_id) AS _n
        FROM bands GROUP BY 1, 2
    ), capped AS (
        SELECT bands.* FROM bands JOIN sizes USING (band_id, band_val)
        WHERE _n <= {HAM_CAP}
    ), cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM capped a JOIN capped b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.media_id < b.media_id
    ), scored AS (
        SELECT id_a, id_b,
               CAST(bit_count(xor(ha.dhash_lo, hb.dhash_lo))
                    + bit_count(xor(ha.dhash_hi, hb.dhash_hi)) AS INTEGER)
                   AS hamming
        FROM cand
        JOIN hashes ha ON id_a = ha.media_id
        JOIN hashes hb ON id_b = hb.media_id
    )
    SELECT id_a, id_b, hamming FROM scored WHERE hamming <= {HAM_K}
"""


# ------------------------------ perceptual clusters (canonical images)
# Pairs -> canonical ids: the same closure dedup_clusters applies to
# text near-dups, over the banded-Hamming image pairs — per image the
# min-id of its perceptual component (its own id when unique). This is
# the relation an image-dedup pass actually consumes (keep one
# canonical per cluster); CC runs the min-label-propagation operator
# (O(log n) rounds), the oracle the recursive closure.


def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components
    from ..operators.multimodal import extract_image_dhash

    docs = load_table(spark, sf_dir, "documents")
    media = extract_image_dhash(documents_as_ppm_images(docs)).select("media_id")
    pairs = multimodal_phash_neardup(spark, sf_dir).select("id_a", "id_b")
    labels = connected_components(pairs).select(
        F.col("id").alias("media_id"), F.col("root").alias("_root")
    )
    return media.join(labels, "media_id", "left").select(
        "media_id",
        F.coalesce("_root", F.col("media_id")).alias("canonical_id"),
    )


QUERIES["multimodal_phash_clusters"] = multimodal_phash_clusters

ORACLES["multimodal_phash_clusters"] = f"""
    WITH RECURSIVE ph_pairs AS ({ORACLES['multimodal_phash_neardup']}),
    media AS (
        SELECT doc_id AS media_id FROM documents WHERE length(text) > 0
    ), nodes AS (
        SELECT id_a AS id FROM ph_pairs UNION SELECT id_b FROM ph_pairs
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM ph_pairs
        UNION SELECT id_b, id_a FROM ph_pairs
    ), reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), roots AS (
        SELECT a AS media_id, min(b) AS root FROM reach GROUP BY a
    )
    SELECT m.media_id, coalesce(r.root, m.media_id) AS canonical_id
    FROM media m LEFT JOIN roots r USING (media_id)
"""


# ------------------------------------------------ audio fingerprinting
# round 8 — see operators/multimodal.audio_fingerprint_features.

_FP_FRAME = 8
_FP_BITS = 32

#: (applicationId, sf_dir) -> lazily localCheckpoint-ed decoded PCM.
_AUDIO_PCM_CACHE: dict[str, DataFrame] = {}


def _shared_audio_pcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-once decoded-PCM rail artifact (r14 OPT, VERDICT r13
    item 6): five audio statistics queries each re-ran documents scan →
    WAV synth → RIFF chunk-walk decode per call before their own cheap
    NumPy pass. One checkpointed (media_id, pcm) relation per session
    replaces all of that; each rider keeps its own measured statistic
    fresh. ``multimodal_audio_fingerprint`` / ``multimodal_audio`` (the
    decode primaries) deliberately do NOT ride the cache — their bench
    rows keep measuring the synth+decode. Keyed by applicationId
    (ADVICE r12) so a restarted session rebuilds."""
    from ..operators.multimodal import decoded_audio_pcm
    from ..session import artifact_cached

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return decoded_audio_pcm(
            documents_as_wav_audio(docs)
        ).localCheckpoint(eager=False)

    return artifact_cached(_AUDIO_PCM_CACHE, spark, sf_dir, build)


def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_fingerprint_features

    docs = load_table(spark, sf_dir, "documents")
    return audio_fingerprint_features(
        documents_as_wav_audio(docs), frame=_FP_FRAME, bits=_FP_BITS
    )


QUERIES["multimodal_audio_fingerprint"] = multimodal_audio_fingerprint

# energies: E_t = sum of 8 pcm bytes, pcm[j] = text byte (j % _tb);
# bits: sign of E[t+1] - E[t] packed little-endian
_FP_ENERGY = (
    "list_transform(range(0, CAST(n_samples // 8 AS INTEGER)),"
    " t -> list_reduce(list_prepend(CAST(0 AS BIGINT),"
    f" list_transform(range(0, 8), k -> {_byte_at('(t * 8 + k) % _tb')})),"
    " (x, y) -> x + y))"
)

ORACLES["multimodal_audio_fingerprint"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples
        FROM documents WHERE length(text) > 0
    ), framed AS (
        SELECT doc_id AS media_id,
               n_samples // 8 AS n_frames,
               least(32, greatest(n_samples // 8 - 1, 0)) AS fp_bits,
               {_FP_ENERGY} AS e
        FROM sized
    )
    SELECT media_id, n_frames, CAST(fp_bits AS INTEGER) AS fp_bits,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(0, CAST(fp_bits AS INTEGER)),
                   t -> CASE WHEN e[t + 2] > e[t + 1]
                        THEN (CAST(1 AS BIGINT) << t) ELSE CAST(0 AS BIGINT) END)),
               (x, y) -> x + y) AS fingerprint
    FROM framed
"""


def multimodal_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup grouping by the energy-slope fingerprint — the
    audio twin of exact dedup's hash-groupBy (gain-shifted re-encodes
    of the same material collide by construction of the delta-sign
    fingerprint). Groups on (fingerprint, fp_bits) so short clips with
    fewer compared frames never collide with full-length ones; min
    media_id is the canonical survivor. One groupBy over the
    fingerprint relation — no pairwise work at any scale."""
    fps = multimodal_audio_fingerprint(spark, sf_dir)
    return (
        fps.groupBy("fingerprint", "fp_bits")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_matches"),
        )
        .filter(F.col("n_matches") >= 2)
    )


QUERIES["multimodal_audio_fp_neardup"] = multimodal_audio_fp_neardup

ORACLES["multimodal_audio_fp_neardup"] = f"""
    WITH fps AS ({ORACLES['multimodal_audio_fingerprint']})
    SELECT fingerprint, fp_bits,
           min(media_id) AS keep_id,
           count(*) AS n_matches
    FROM fps GROUP BY 1, 2 HAVING count(*) >= 2
"""


# ----------------------------------------------- image byte histogram
# Round 9: per-image channel-byte histogram through the REAL BMP
# round-trip (encode → strict decode → bincount) — the
# exposure/blank-frame screen a vision intake runs before
# resize/near-dup. The oracle never decodes: raster bytes are the
# UTF-8 text bytes cycled to w·h·3 (the synthesis contract), so
# bucket counts are (need div L) full text-histograms plus the
# rem-byte prefix histogram, recomputed arithmetically from the hex
# machinery — one wrong byte anywhere in encoder or decoder shifts a
# bucket and fails the hash. All 8 buckets emitted per image (fixed
# spine, zero-count included).
#
# Scale: Arrow-batched mapInPandas decode (the multimodal rail),
# per-image work linear in raster bytes; the oracle-side closed form
# is why the gate stays exact without a second decoder.


def multimodal_bmp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        documents_as_bmp_images,
        extract_bmp_histogram,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_bmp_histogram(documents_as_bmp_images(docs))


QUERIES["multimodal_bmp_histogram"] = multimodal_bmp_histogram


def _bmp_hist_oracle() -> str:
    # bucket histogram of the text's bytes: full-cycle count × per-text
    # histogram + prefix histogram of the first rem bytes
    return f"""
    WITH d AS (
        SELECT doc_id, hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS L,
               CAST((doc_id % 13 + 1) * (doc_id % 9 + 1) * 3 AS BIGINT)
                   AS need
        FROM documents WHERE length(text) > 0
    ), by AS (
        SELECT doc_id, need, L, i, ({_BYTE_AT}) // 32 AS bucket
        FROM (
            SELECT doc_id, _hx, need, L,
                   unnest(range(1, CAST(L AS INTEGER) + 1)) AS i
            FROM d
        )
    ), per AS (
        SELECT doc_id, need, L, bucket,
               CAST(count(*) AS BIGINT) AS full_cnt,
               CAST(sum(CASE WHEN i <= need % L THEN 1 ELSE 0 END)
                    AS BIGINT) AS prefix_cnt
        FROM by GROUP BY 1, 2, 3, 4
    ), spine AS (
        SELECT d.doc_id, d.need, d.L, k.bucket
        FROM d, (SELECT unnest(range(0, 8)) AS bucket) k
    )
    SELECT s.doc_id AS media_id,
           CAST(s.bucket AS INTEGER) AS bucket,
           CAST(coalesce((s.need // s.L) * p.full_cnt + p.prefix_cnt, 0)
                AS BIGINT) AS n_bytes
    FROM spine s
    LEFT JOIN per p ON s.doc_id = p.doc_id AND s.bucket = p.bucket
"""


ORACLES["multimodal_bmp_histogram"] = _bmp_hist_oracle()


# ---------------------------------------------- audio VAD segmentation
# Round 9: run-structure of the energy gate over the REAL WAV decode —
# the silence-trim/diarization primitive. Threshold 900 sits just
# above the ~800 average energy of 8 ASCII letters, so text-derived
# PCM produces a non-trivial active/inactive mix. The oracle replays
# frame energies from (doc_id, text) (the fingerprint's _FP_ENERGY
# machinery) and derives the SAME run statistics with pure list HOFs:
# segment count = rises of the activity mask, longest run via a
# struct-state fold — no decode, no Python, bit-exact.

_VAD_THRESH = 900


def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_activity_segments

    return audio_activity_segments(
        _shared_audio_pcm(spark, sf_dir),
        frame=_FP_FRAME,
        thresh=_VAD_THRESH,
        pcm_col="pcm",
    )


QUERIES["multimodal_audio_segments"] = multimodal_audio_segments

ORACLES["multimodal_audio_segments"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples
        FROM documents WHERE length(text) > 0
    ), framed AS (
        SELECT doc_id AS media_id,
               n_samples // 8 AS n_frames,
               {_FP_ENERGY} AS e
        FROM sized
    ), masked AS (
        SELECT media_id, n_frames,
               list_transform(e, x -> CASE WHEN x >= {_VAD_THRESH}
                                      THEN 1 ELSE 0 END) AS a
        FROM framed
    )
    SELECT media_id, n_frames,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), a),
                (x, y) -> x + y) AS BIGINT) AS n_active,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, len(a) + 1),
                    i -> CASE WHEN a[i] = 1
                              AND (i = 1 OR a[i - 1] = 0)
                         THEN 1 ELSE 0 END)),
                (x, y) -> x + y) AS BIGINT) AS n_segments,
           CAST((list_reduce(list_prepend({{'cur': CAST(0 AS BIGINT),
                                            'best': CAST(0 AS BIGINT)}},
                list_transform(a, v -> {{'cur': CAST(v AS BIGINT),
                                         'best': CAST(0 AS BIGINT)}})),
                (acc, p) -> {{'cur': CASE WHEN p['cur'] = 1
                                     THEN acc['cur'] + 1 ELSE 0 END,
                             'best': greatest(acc['best'],
                                     CASE WHEN p['cur'] = 1
                                     THEN acc['cur'] + 1 ELSE 0 END)}}))['best']
                AS BIGINT) AS longest_run
    FROM masked
"""


# ------------------------------------------- binaryFile-source intake
# Round 10 (VERDICT r9 item 7 / SURVEY §2c): every other multimodal
# query synthesizes its media in-query from the documents table; this
# one completes the CONNECTOR story by reading REAL on-disk blobs via
# Spark's binaryFile source (`spark.read.format("binaryFile")`) — the
# ingestion shape a 100 TB vision/audio intake actually starts from
# (path, modificationTime, length, content). The fixture is 24
# committed 24-bit BMPs written by the repo's own strict encoder
# (tests/fixtures/make_blobs.py — deterministic geometry/raster per
# file index), the decode is the SAME strict decode_bmp the synthetic
# rail uses, and the oracle re-reads the identical files with DuckDB's
# read_blob and re-derives the histogram from raw bytes: header parsed
# (LE int32 width/height/pixel-offset), rows de-padded via the stride
# arithmetic, NO shared decoder — one wrong byte in either engine's
# file handling breaks the hash.
#
# 100 TB: binaryFile is a standard FileScan — splittable listing,
# pathGlobFilter pushdown, one task per file group; the per-file
# decode is the Arrow-batched mapInPandas chain (bounded by file size,
# embarrassingly parallel). Small-files pressure at scale is handled
# the usual way (coalesced file groups via maxPartitionBytes), not in
# this query.

_BLOB_DIR = None


def _blob_dir() -> str:
    global _BLOB_DIR
    if _BLOB_DIR is None:
        from pathlib import Path

        _BLOB_DIR = str(
            Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "blobs"
        )
    return _BLOB_DIR


def multimodal_binaryfile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import extract_bmp_histogram

    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(_blob_dir())
        .select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp", 1)
            .cast("long")
            .alias("media_id"),
            F.col("content").alias("media"),
        )
    )
    return extract_bmp_histogram(media)


QUERIES["multimodal_binaryfile_histogram"] = multimodal_binaryfile_histogram


def _le32(p: str) -> str:
    """DuckDB expr: little-endian uint32 at 0-based byte offset ``p``
    of the hex dump ``_hx`` (arbitrary integer expression)."""

    def byte_at(off: str) -> str:
        return (
            f"((strpos({_HEXDIG}, substring(_hx, ({off}) * 2 + 1, 1)) - 1) * 16"
            f" + (strpos({_HEXDIG}, substring(_hx, ({off}) * 2 + 2, 1)) - 1))"
        )

    return (
        f"CAST({byte_at(p)} + 256 * {byte_at(f'({p}) + 1')}"
        f" + 65536 * {byte_at(f'({p}) + 2')}"
        f" + 16777216 * {byte_at(f'({p}) + 3')} AS BIGINT)"
    )


def _binaryfile_hist_oracle() -> str:
    pix_byte = (
        f"CAST((strpos({_HEXDIG}, substring(_hx, (data_off + i) * 2 + 1, 1)) - 1)"
        f" * 16 + (strpos({_HEXDIG}, substring(_hx, (data_off + i) * 2 + 2, 1)) - 1)"
        " AS BIGINT)"
    )
    return f"""
    WITH f AS (
        SELECT CAST(regexp_extract(filename, 'img_(\\d+)\\.bmp', 1) AS BIGINT)
                   AS media_id,
               hex(content) AS _hx
        FROM read_blob('{_blob_dir()}/*.bmp')
    ), hdr AS (
        SELECT media_id, _hx,
               {_le32('10')} AS data_off,
               {_le32('18')} AS w,
               {_le32('22')} AS h
        FROM f
    ), by AS (
        SELECT media_id, ({pix_byte}) // 32 AS bucket
        FROM (
            SELECT media_id, _hx, data_off, w,
                   ((3 * w + 3) // 4) * 4 AS stride,
                   unnest(range(0, CAST(h * (((3 * w + 3) // 4) * 4)
                                        AS INTEGER))) AS i
            FROM hdr
        )
        WHERE (i % stride) < 3 * w
    ), per AS (
        SELECT media_id, bucket, CAST(count(*) AS BIGINT) AS n_bytes
        FROM by GROUP BY 1, 2
    ), spine AS (
        SELECT f.media_id, k.bucket
        FROM f, (SELECT unnest(range(0, 8)) AS bucket) k
    )
    SELECT s.media_id,
           CAST(s.bucket AS INTEGER) AS bucket,
           CAST(coalesce(p.n_bytes, 0) AS BIGINT) AS n_bytes
    FROM spine s
    LEFT JOIN per p ON s.media_id = p.media_id AND s.bucket = p.bucket
"""


ORACLES["multimodal_binaryfile_histogram"] = _binaryfile_hist_oracle()


# ----------------------------------------- binaryFile quarantine intake
# Round 10: the badRecords path of the blob connector — a real intake
# never assumes its files decode. The mixed fixture dir
# (tests/fixtures/make_blobs_mixed.py) plants one file per strict-
# decoder failure branch (bad magic, header truncated mid-struct,
# pixel array short of the declared stride·height) among valid BMPs;
# the query routes every blob to (status, geometry) instead of failing
# the job — the quarantine split that feeds dq_quarantine_orders'
# discipline on the multimodal rail. The oracle re-derives each status
# from the RAW BYTES with the same check ordering (magic → header
# length → DIB sanity → pixel-array length) — no decoder shared.

_BLOBS_MIXED_DIR = None


def _blobs_mixed_dir() -> str:
    global _BLOBS_MIXED_DIR
    if _BLOBS_MIXED_DIR is None:
        from pathlib import Path

        _BLOBS_MIXED_DIR = str(
            Path(__file__).resolve().parents[2]
            / "tests" / "fixtures" / "blobs_mixed"
        )
    return _BLOBS_MIXED_DIR


_BMP_STATUS = {
    "not a BMP (bad magic)": "bad_magic",
    "truncated BMP header": "truncated_header",
    "truncated BMP pixel array": "truncated_pixels",
}


def multimodal_binaryfile_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(_blobs_mixed_dir())
        .select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp", 1)
            .cast("long")
            .alias("media_id"),
            F.col("content").alias("media"),
        )
    )

    def batches(it):
        import pandas as pd

        from ..operators.codecs import decode_bmp

        for pdf in it:
            out = {"media_id": [], "status": [], "width": [], "height": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                try:
                    w, h, _, _ = decode_bmp(bytes(blob))
                    st, ww, hh = "ok", w, h
                except ValueError as exc:
                    st = _BMP_STATUS.get(str(exc), "unsupported")
                    ww = hh = None
                out["media_id"].append(mid)
                out["status"].append(st)
                out["width"].append(ww)
                out["height"].append(hh)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "media_id long, status string, width int, height int"
    )


QUERIES["multimodal_binaryfile_quarantine"] = multimodal_binaryfile_quarantine


def _binaryfile_quarantine_oracle() -> str:
    return f"""
    WITH f AS (
        SELECT CAST(regexp_extract(filename, 'img_(\\d+)\\.bmp', 1) AS BIGINT)
                   AS media_id,
               hex(content) AS _hx,
               CAST(octet_length(content) AS BIGINT) AS sz
        FROM read_blob('{_blobs_mixed_dir()}/*.bmp')
    ), hdr AS (
        SELECT media_id, sz,
               substring(_hx, 1, 4) AS magic,
               {_le32('10')} AS data_off,
               {_le32('14')} AS hdr_size,
               {_le32('18')} AS w,
               {_le32('22')} AS h,
               ({_le32('28')} % 65536) AS bpp,
               {_le32('30')} AS compression
        FROM f
    )
    SELECT media_id,
           CASE
               WHEN magic != '424D' THEN 'bad_magic'
               WHEN sz < 54 THEN 'truncated_header'
               WHEN hdr_size != 40 OR bpp != 24 OR compression != 0
                    OR w <= 0 OR h <= 0 THEN 'unsupported'
               WHEN sz < data_off + (((3 * w + 3) // 4) * 4) * h
                    THEN 'truncated_pixels'
               ELSE 'ok'
           END AS status,
           CASE WHEN magic = '424D' AND sz >= 54 AND hdr_size = 40
                     AND bpp = 24 AND compression = 0 AND w > 0 AND h > 0
                     AND sz >= data_off + (((3 * w + 3) // 4) * 4) * h
                THEN CAST(w AS INTEGER) END AS width,
           CASE WHEN magic = '424D' AND sz >= 54 AND hdr_size = 40
                     AND bpp = 24 AND compression = 0 AND w > 0 AND h > 0
                     AND sz >= data_off + (((3 * w + 3) // 4) * 4) * h
                THEN CAST(h AS INTEGER) END AS height
    FROM hdr
"""


ORACLES["multimodal_binaryfile_quarantine"] = _binaryfile_quarantine_oracle()


# --------------------------------------------------- ViT-style patchify
# Round 10: the geometry step under every vision-transformer intake —
# an image becomes a sequence of PATCH×PATCH tiles before embedding.
# Runs on the REAL BMP rail (synth → strict stride-unpadding decode →
# numpy tiling in Arrow batches); the oracle never decodes: it replays
# the raster byte cycle straight from (doc_id, text) — pixel p of a
# w×h image reads bytes tb[(3p+c) mod L] — and re-derives every
# per-tile count/sum/mean with pure integer arithmetic, so one wrong
# byte in the decoder's row-stride undo breaks the hash.

PATCH = 4


def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        documents_as_bmp_images,
        extract_bmp_patches,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_bmp_patches(documents_as_bmp_images(docs), patch=PATCH)


QUERIES["multimodal_image_patches"] = multimodal_image_patches


def _bmp_patches_oracle(patch: int = PATCH) -> str:
    return f"""
    WITH d AS (
        SELECT doc_id, hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS L,
               CAST(doc_id % 13 + 1 AS BIGINT) AS w,
               CAST(doc_id % 9 + 1 AS BIGINT) AS h
        FROM documents WHERE length(text) > 0
    ), px3 AS (
        -- (pixel, channel) grid; i is the 1-based byte position the
        -- shared _BYTE_AT macro expects
        SELECT doc_id, (p // w) // {patch} AS py, (p % w) // {patch} AS px,
               p, ((3 * p + c) % L) + 1 AS i, _hx
        FROM (
            SELECT doc_id, _hx, L, w,
                   unnest(range(0, CAST(w * h AS INTEGER))) AS p
            FROM d
        ), (SELECT unnest(range(0, 3)) AS c)
    )
    SELECT doc_id AS media_id,
           CAST(py AS INTEGER) AS py,
           CAST(px AS INTEGER) AS px,
           CAST(count(*) // 3 AS BIGINT) AS n_px,
           CAST(sum({_BYTE_AT}) AS BIGINT) AS sum_bytes,
           CAST((2000 * sum({_BYTE_AT}) + count(*))
                // (2 * count(*)) AS BIGINT) AS mean_milli
    FROM px3
    GROUP BY doc_id, py, px
"""


ORACLES["multimodal_image_patches"] = _bmp_patches_oracle()


# ------------------------------------------------- video shot detection
# Round 10: the video-intake segmentation primitive on a REAL
# container structure — a concatenated-BMP stream split by each
# frame's own file-size header (one wrong size desyncs the stream),
# each frame strict-decoded, adjacent rasters compared in exact L1,
# cuts = distances over threshold. The synthesis plants one hard cut
# at the shot boundary (second shot reads the text cycle from L//2),
# so the oracle can reproduce every distance arithmetically from
# (doc_id, text): within-shot distances are 0 by construction and the
# single boundary distance is Σ|tb[i mod L] − tb[(L//2 + i) mod L]|.

def multimodal_shot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        detect_bmp_shot_cuts,
        documents_as_bmp_video,
    )

    docs = load_table(spark, sf_dir, "documents")
    return detect_bmp_shot_cuts(documents_as_bmp_video(docs))


QUERIES["multimodal_shot_detection"] = multimodal_shot_detection


def _shot_oracle() -> str:
    from ..operators.multimodal import VIDEO_FRAMES, VIDEO_SHOT_LEN

    d_expr = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(0, CAST(need AS INTEGER)), "
        f"i -> abs({_byte_at('i % L')}"
        f" - {_byte_at('(L // 2 + i) % L')}))), "
        "(x, y) -> x + y)"
    )
    return f"""
    WITH d AS (
        SELECT doc_id, hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS L,
               CAST((doc_id % 13 + 1) * (doc_id % 9 + 1) * 3 AS BIGINT)
                   AS need
        FROM documents WHERE length(text) > 0
    ), dist AS (
        SELECT doc_id, {d_expr} AS boundary_diff FROM d
    )
    SELECT doc_id AS media_id,
           CAST({VIDEO_FRAMES} AS INTEGER) AS n_frames,
           CAST(boundary_diff AS BIGINT) AS total_diff,
           CAST(CASE WHEN boundary_diff > 0 THEN 1 ELSE 0 END AS INTEGER)
               AS n_cuts,
           CAST(CASE WHEN boundary_diff > 0 THEN {VIDEO_SHOT_LEN}
                END AS INTEGER) AS first_cut,
           CAST(CASE WHEN boundary_diff > 0 THEN {VIDEO_SHOT_LEN}
                     ELSE {VIDEO_FRAMES} END AS INTEGER) AS longest_shot
    FROM dist
"""


ORACLES["multimodal_shot_detection"] = _shot_oracle()


# ------------------------------------------------- keyframe selection
# Round 11: the step after multimodal_shot_detection in a real video
# curation pipeline — one representative frame per shot feeds the
# expensive downstream stage (embedding/captioning), not all frames.
# The operator picks, per cut-bounded shot, the frame minimizing the
# EXACT integer L1 distance to the shot mean (Σ|k·frame − Σshot|,
# ties → earliest) and reports its byte checksum. On the synthesized
# container every within-shot frame is identical, so the oracle
# replays the selection arithmetically from (doc_id, text): keyframe
# = shot start, checksum = the cycled text-byte sum at the shot's
# offset — which makes the whole container-split → shot-group →
# argmin chain hash-checkable.


def multimodal_keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        documents_as_bmp_video,
        select_bmp_keyframes,
    )

    docs = load_table(spark, sf_dir, "documents")
    return select_bmp_keyframes(documents_as_bmp_video(docs))


QUERIES["multimodal_keyframe_select"] = multimodal_keyframe_select


def _keyframe_oracle() -> str:
    from ..operators.multimodal import VIDEO_FRAMES, VIDEO_SHOT_LEN

    bdiff = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(0, CAST(need AS INTEGER)), "
        f"i -> abs({_byte_at('i % L')}"
        f" - {_byte_at('(L // 2 + i) % L')}))), "
        "(x, y) -> x + y)"
    )
    sum0 = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(0, CAST(need AS INTEGER)), "
        f"i -> {_byte_at('i % L')})), (x, y) -> x + y)"
    )
    sum1 = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(range(0, CAST(need AS INTEGER)), "
        f"i -> {_byte_at('(L // 2 + i) % L')})), (x, y) -> x + y)"
    )
    return f"""
    WITH d AS (
        SELECT doc_id, hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS L,
               CAST((doc_id % 13 + 1) * (doc_id % 9 + 1) * 3 AS BIGINT)
                   AS need
        FROM documents WHERE length(text) > 0
    ), m AS (
        SELECT doc_id, {bdiff} AS boundary_diff,
               {sum0} AS s0, {sum1} AS s1
        FROM d
    )
    SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS shot_idx,
           CAST(0 AS INTEGER) AS start_frame,
           CAST(CASE WHEN boundary_diff > 0 THEN {VIDEO_SHOT_LEN - 1}
                     ELSE {VIDEO_FRAMES - 1} END AS INTEGER) AS end_frame,
           CAST(0 AS INTEGER) AS keyframe_idx,
           CAST(s0 AS BIGINT) AS key_checksum
    FROM m
    UNION ALL
    SELECT doc_id AS media_id, CAST(1 AS INTEGER) AS shot_idx,
           CAST({VIDEO_SHOT_LEN} AS INTEGER) AS start_frame,
           CAST({VIDEO_FRAMES - 1} AS INTEGER) AS end_frame,
           CAST({VIDEO_SHOT_LEN} AS INTEGER) AS keyframe_idx,
           CAST(s1 AS BIGINT) AS key_checksum
    FROM m WHERE boundary_diff > 0
"""


ORACLES["multimodal_keyframe_select"] = _keyframe_oracle()


# --------------------------------------------- image byte entropy
# Round 12: the blank/flat-frame screen on top of the histogram rail —
# Shannon entropy (nats) of each image's channel-byte bucket
# distribution: ~0 for a constant image (drop before expensive decode
# work), approaching ln(8) for balanced exposure. Pure relational
# layer OVER multimodal_binaryfile_histogram (the strict binaryFile →
# Arrow decode chain), so the decode plumbing is shared and this query
# adds one per-image aggregate. Exactness: H = ln N − (Σ c·ln c)/N
# with every ln taking an EXACT INTEGER argument, snapped to nanos
# (the house ln contract); the division is the half-up integer
# rational. Zero-count buckets contribute 0 (excluded; 0·ln 0 := 0).


def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units

    hist = multimodal_binaryfile_histogram(spark, sf_dir)
    per = hist.groupBy("media_id").agg(
        F.sum("n_bytes").alias("n_total"),
        F.sum(
            F.when(
                F.col("n_bytes") > 0,
                F.col("n_bytes") * iunits(F.log("n_bytes"), 9),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("clnc"),
    )
    return per.select(
        "media_id",
        F.col("n_total").cast("long").alias("n_bytes_total"),
        (
            iunits(F.log("n_total"), 9)
            - ratio_units("clnc", "n_total", 1)
        ).alias("entropy_nanos"),
    )


QUERIES["multimodal_image_entropy"] = multimodal_image_entropy

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_ent,
    sql_ratio_units as _sql_ru_ent,
)

ORACLES["multimodal_image_entropy"] = f"""
    WITH hist AS ({_binaryfile_hist_oracle()}),
    per AS (
        SELECT media_id,
               CAST(sum(n_bytes) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN n_bytes > 0
                        THEN n_bytes * {_sql_iu_ent('ln(n_bytes)', 9)}
                        ELSE 0 END) AS BIGINT) AS clnc
        FROM hist GROUP BY 1
    )
    SELECT media_id,
           n_total AS n_bytes_total,
           CAST({_sql_iu_ent('ln(n_total)', 9)}
                - {_sql_ru_ent('clnc', 'n_total', 1)} AS BIGINT)
               AS entropy_nanos
    FROM per
"""


# ------------------------------------------------- audio energy ratio
# Round 12: the SNR-style readout next to multimodal_audio_segments'
# run structure — total frame energy above vs below the VAD gate,
# per media. A silence-trim pipeline uses this as its keep/drop
# economics (how much signal mass would trimming at this threshold
# discard), which the segment COUNTS alone cannot answer. Same strict
# WAV decode rail and frame/threshold constants as the segments
# query; energies are exact uint8-sum integers, the ratio of MEAN
# active to MEAN inactive frame energy one half-up micros rational
# (NULL when either side is empty). The oracle replays the framing
# and gating from raw hex with no shared decoder.


def multimodal_audio_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec
    from ..operators.multimodal import audio_energy_ratio

    per = audio_energy_ratio(
        _shared_audio_pcm(spark, sf_dir),
        frame=_FP_FRAME,
        thresh=_VAD_THRESH,
        pcm_col="pcm",
    )
    return per.select(
        "media_id",
        "n_active",
        "n_inactive",
        "act_energy",
        "inact_energy",
        F.when(
            (F.col("n_active") == 0)
            | (F.col("n_inactive") == 0)
            | (F.col("inact_energy") == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            ratio_units_dec(
                "CAST(act_energy AS DECIMAL(38,0)) * n_inactive",
                "CAST(inact_energy AS DECIMAL(38,0)) * n_active",
            )
        )
        .alias("snr_micros"),
    )


QUERIES["multimodal_audio_snr"] = multimodal_audio_snr

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_snr,
)

ORACLES["multimodal_audio_snr"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples
        FROM documents WHERE length(text) > 0
    ), framed AS (
        SELECT doc_id AS media_id, {_FP_ENERGY} AS e
        FROM sized
    ), split AS (
        SELECT media_id,
               CAST(len(list_filter(e, x -> x >= {_VAD_THRESH}))
                    AS BIGINT) AS n_active,
               CAST(len(list_filter(e, x -> x < {_VAD_THRESH}))
                    AS BIGINT) AS n_inactive,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_filter(e, x -> x >= {_VAD_THRESH})),
                    (x, y) -> x + y) AS BIGINT) AS act_energy,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_filter(e, x -> x < {_VAD_THRESH})),
                    (x, y) -> x + y) AS BIGINT) AS inact_energy
        FROM framed
    )
    SELECT media_id, n_active, n_inactive, act_energy, inact_energy,
           CASE WHEN n_active = 0 OR n_inactive = 0 OR inact_energy = 0
                THEN NULL
                ELSE {_sql_rud_snr(
                    'CAST(act_energy AS HUGEINT) * n_inactive',
                    'CAST(inact_energy AS HUGEINT) * n_active')}
           END AS snr_micros
    FROM split
"""


# ------------------------------------------------ audio level audit
# Round 12: the mastering/ingest-QA readout next to the SNR economics
# (multimodal_audio_snr) — three numbers a speech pipeline gates on
# BEFORE spending decode/ASR budget: hard-clip evidence (samples at
# the uint8 rails 0/255 — loudness-war limiting or a broken gain
# stage), DC offset (mean − 128 midpoint — a miswired ADC shifts the
# whole waveform), and crest factor (peak over RMS — over-compressed
# audio collapses toward 1). Integer-exact: per-media (n, peak,
# n_rail, Σs, Σs²) come off the strict WAV decode rail
# (operators/multimodal.py audio_level_stats); DC offset is a SIGNED
# micros rational (Σs − 128n)/n, crest² = n·peak²/Σs² a DECIMAL
# micros rational (squares avoid the sqrt — monotone equivalent).
# The oracle replays samples from raw hex (text bytes cycled to
# n_samples, the documents_as_wav_audio contract).


def multimodal_audio_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec, ratio_units_dec_signed
    from ..operators.multimodal import audio_level_stats

    per = audio_level_stats(_shared_audio_pcm(spark, sf_dir), pcm_col="pcm")
    return per.select(
        "media_id",
        "n_samples",
        "peak",
        "n_rail",
        F.when(F.col("n_samples") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec_signed(
                "CAST(sum_s AS DECIMAL(38,0)) - 128 * CAST(n_samples AS DECIMAL(38,0))",
                "n_samples",
                off=256,
            )
        )
        .alias("dc_offset_micros"),
        F.when(F.col("sum_s2") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(
                "CAST(n_samples AS DECIMAL(38,0)) * peak * peak", "sum_s2"
            )
        )
        .alias("crest2_micros"),
    )


QUERIES["multimodal_audio_levels"] = multimodal_audio_levels

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_lv,
    sql_ratio_units_dec_signed as _sql_ruds_lv,
)

ORACLES["multimodal_audio_levels"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples
        FROM documents WHERE length(text) > 0
    ), samp AS (
        SELECT doc_id AS media_id, n_samples,
               list_transform(range(0, CAST(n_samples AS INTEGER)),
                              j -> {_byte_at('j % _tb')}) AS s
        FROM sized
    ), agg AS (
        SELECT media_id,
               CAST(n_samples AS BIGINT) AS n_samples,
               CAST(list_aggregate(s, 'max') AS BIGINT) AS peak,
               CAST(len(list_filter(s, x -> x = 0 OR x = 255))
                    AS BIGINT) AS n_rail,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), s),
                    (x, y) -> x + y) AS BIGINT) AS sum_s,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(s, x -> x * x)),
                    (x, y) -> x + y) AS BIGINT) AS sum_s2
        FROM samp
    )
    SELECT media_id, n_samples, peak, n_rail,
           CASE WHEN n_samples = 0 THEN NULL
                ELSE {_sql_ruds_lv(
                    'CAST(sum_s AS HUGEINT) - 128 * CAST(n_samples AS HUGEINT)',
                    'n_samples', off=256)}
           END AS dc_offset_micros,
           CASE WHEN sum_s2 = 0 THEN NULL
                ELSE {_sql_rud_lv(
                    'CAST(n_samples AS HUGEINT) * peak * peak', 'sum_s2')}
           END AS crest2_micros
    FROM agg
"""


# ------------------------------------------------ image colorfulness
# Round 12: the Hasler–Süsstrunk (2003) colorfulness metric — the
# standard one-number screen for grayscale/duotone/synthetic-flat
# images a vision-data pipeline drops before training: with opponent
# channels rg = R−G and yb = (R+G)/2 − B,
# C = sqrt(σ²_rg + σ²_yb) + 0.3·sqrt(μ²_rg + μ²_yb). Integer rail:
# keep yb doubled (yb2 = R+G−2B) so every moment sum is an exact
# BIGINT off the strict PPM decode (operators/multimodal.py
# image_color_stats); then C = (1/(2n))·[√(4(nΣrg²−(Σrg)²) +
# (nΣyb2²−(Σyb2)²)) + 0.3·√(4(Σrg)² + (Σyb2)²)] — the two sqrt
# arguments are exact integers emitted as audit columns, and C is
# one fixed double expression + pround(6) (the Wilson discipline).
# The oracle replays pixels arithmetically from doc_id + text bytes.


def multimodal_image_colorfulness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.rounding import pround
    from ..operators.multimodal import image_color_stats

    docs = load_table(spark, sf_dir, "documents")
    per = image_color_stats(documents_as_ppm_images(docs))
    dec = "decimal(38,0)"
    var_num = (
        f"(4 * (CAST(n_pix AS {dec}) * sum_rg2"
        f" - CAST(sum_rg AS {dec}) * sum_rg)"
        f" + (CAST(n_pix AS {dec}) * sum_yb22"
        f" - CAST(sum_yb2 AS {dec}) * sum_yb2))"
    )
    mu_num = (
        f"(4 * CAST(sum_rg AS {dec}) * sum_rg"
        f" + CAST(sum_yb2 AS {dec}) * sum_yb2)"
    )
    base = per.select(
        "media_id",
        "n_pix",
        F.expr(var_num).cast("long").alias("var_num"),
        F.expr(mu_num).cast("long").alias("mu_num"),
    )
    c = (
        F.sqrt(F.col("var_num").cast("double"))
        + F.lit(0.3) * F.sqrt(F.col("mu_num").cast("double"))
    ) / (F.lit(2.0) * F.col("n_pix").cast("double"))
    return base.select(
        "media_id",
        "n_pix",
        "var_num",
        "mu_num",
        F.when(F.col("n_pix") == 0, F.lit(None).cast("double"))
        .otherwise(pround(c, 6))
        .alias("colorfulness"),
    )


QUERIES["multimodal_image_colorfulness"] = multimodal_image_colorfulness

from ..functions.rounding import sql_pround as _sql_pr_cf  # noqa: E402

ORACLES["multimodal_image_colorfulness"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 16 + 1 AS BIGINT) AS w,
               CAST(doc_id % 12 + 1 AS BIGINT) AS h
        FROM documents WHERE length(text) > 0
    ), px AS (
        SELECT doc_id,
               w * h AS n_pix,
               list_transform(range(0, CAST(w * h AS INTEGER)),
                   p -> {_byte_at('(3 * p) % _tb')}
                        - {_byte_at('(3 * p + 1) % _tb')}) AS rg,
               list_transform(range(0, CAST(w * h AS INTEGER)),
                   p -> {_byte_at('(3 * p) % _tb')}
                        + {_byte_at('(3 * p + 1) % _tb')}
                        - 2 * {_byte_at('(3 * p + 2) % _tb')}) AS yb2
        FROM sized
    ), agg AS (
        SELECT doc_id AS media_id,
               CAST(n_pix AS BIGINT) AS n_pix,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), rg),
                    (x, y) -> x + y) AS BIGINT) AS sum_rg,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(rg, x -> x * x)),
                    (x, y) -> x + y) AS BIGINT) AS sum_rg2,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), yb2),
                    (x, y) -> x + y) AS BIGINT) AS sum_yb2,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(yb2, x -> x * x)),
                    (x, y) -> x + y) AS BIGINT) AS sum_yb22
        FROM px
    ), nums AS (
        SELECT media_id, n_pix,
               CAST(4 * (CAST(n_pix AS HUGEINT) * sum_rg2
                         - CAST(sum_rg AS HUGEINT) * sum_rg)
                    + (CAST(n_pix AS HUGEINT) * sum_yb22
                       - CAST(sum_yb2 AS HUGEINT) * sum_yb2)
                    AS BIGINT) AS var_num,
               CAST(4 * CAST(sum_rg AS HUGEINT) * sum_rg
                    + CAST(sum_yb2 AS HUGEINT) * sum_yb2
                    AS BIGINT) AS mu_num
        FROM agg
    )
    SELECT media_id, n_pix, var_num, mu_num,
           CASE WHEN n_pix = 0 THEN NULL
                ELSE {_sql_pr_cf(
                    '(sqrt(CAST(var_num AS DOUBLE))'
                    ' + 0.3 * sqrt(CAST(mu_num AS DOUBLE)))'
                    ' / (2.0 * CAST(n_pix AS DOUBLE))', 6)}
           END AS colorfulness
    FROM nums
"""


# ------------------------------------------------ audio periodicity
# Round 12: the envelope-autocorrelation periodicity probe (the
# tempo/hum detector of classic audio QA — a strong peak at lag ℓ
# means the energy envelope repeats every ℓ frames: machine hum,
# loops, metronomic speech): over the exact frame-energy vector
# (operators/multimodal.py audio_frame_energies, the fingerprint
# rail's envelope), demean exactly (u_t = nf·e_t − Σe), and take
# R(ℓ) = Σ u_t·u_{t+ℓ} for ℓ ∈ 2..16 — every R an exact BIGINT.
# best_lag = argmax R(ℓ) (lag-asc tie-break, decided on integers);
# strength = R(ℓ*)/R(0) as a SIGNED micros rational (offset-shifted
# DECIMAL — autocorrelation is in [−1, 1]). Lags with fewer than 2
# overlapping frames are excluded; media too short for any lag (or
# a flat envelope, R(0)=0) report NULL. Scale: per-media arrays are
# ≤ ⌈500/8⌉ entries; the lag expansion is a 15-row broadcast.

AP_MIN_LAG = 2
AP_MAX_LAG = 16


def multimodal_audio_periodicity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.rounding import ratio_units_dec_signed
    from ..operators.multimodal import audio_periodicity_stats

    # r14 OPT (guide §4.2): the lag sweep + argmax run inside the NumPy
    # rider over the shared PCM artifact — the old form crossJoined 15
    # broadcast lags and evaluated an interpreted aggregate(zip_with(
    # slice…)) lambda per (media, lag) plus a per-media rank window.
    # Same integers, same NULL gating (no qualifying lag → NULL).
    per = audio_periodicity_stats(
        _shared_audio_pcm(spark, sf_dir),
        frame=_FP_FRAME,
        min_lag=AP_MIN_LAG,
        max_lag=AP_MAX_LAG,
        pcm_col="pcm",
    )
    return (
        per.select(
            "media_id",
            F.col("nf").cast("long").alias("n_frames"),
            F.col("lag").cast("int").alias("best_lag"),
            F.when(
                F.col("r0").isNull()
                | (F.col("r0") == 0)
                | F.col("r").isNull(),
                F.lit(None).cast("long"),
            )
            .otherwise(
                ratio_units_dec_signed(
                    "CAST(r AS DECIMAL(38,0))", "r0", off=16
                )
            )
            .alias("strength_micros"),
        )
        .orderBy("media_id")
    )


QUERIES["multimodal_audio_periodicity"] = multimodal_audio_periodicity

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec_signed as _sql_ruds_ap,
)

ORACLES["multimodal_audio_periodicity"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples
        FROM documents WHERE length(text) > 0
    ), framed AS (
        SELECT doc_id AS media_id, {_FP_ENERGY} AS e
        FROM sized
    ), uu AS (
        SELECT media_id,
               CAST(len(e) AS BIGINT) AS nf,
               list_transform(e, x -> CAST(len(e) AS BIGINT) * x
                   - list_reduce(list_prepend(CAST(0 AS BIGINT), e),
                                 (a, b) -> a + b)) AS u
        FROM framed
    ), r0 AS (
        SELECT media_id, nf,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(u, x -> x * x)),
                    (a, b) -> a + b) AS BIGINT) AS r0
        FROM uu
    ), rl AS (
        SELECT media_id, CAST(l.range AS INTEGER) AS lag,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(
                        range(0, CAST(nf - l.range AS INTEGER)),
                        i -> u[CAST(i AS INTEGER) + 1]
                             * u[CAST(i + l.range AS INTEGER) + 1])),
                    (a, b) -> a + b) AS BIGINT) AS r
        FROM uu, range({AP_MIN_LAG}, {AP_MAX_LAG + 1}) l
        WHERE nf - l.range >= 2
    ), best AS (
        SELECT media_id, lag, r,
               row_number() OVER (
                   PARTITION BY media_id ORDER BY r DESC, lag ASC
               ) AS rn
        FROM rl
    )
    SELECT r0.media_id,
           CAST(r0.nf AS BIGINT) AS n_frames,
           CAST(b.lag AS INTEGER) AS best_lag,
           CASE WHEN r0.r0 IS NULL OR r0.r0 = 0 OR b.r IS NULL THEN NULL
                ELSE {_sql_ruds_ap('b.r', 'r0.r0', off=16)}
           END AS strength_micros
    FROM r0
    LEFT JOIN (SELECT media_id, lag, r FROM best WHERE rn = 1) b
        USING (media_id)
    ORDER BY media_id
"""


# -------------------------------------------------- audio zero crossings
# Round 13: zero-crossing rate — the third classical time-domain audio
# screen next to levels (DC/crest) and periodicity (autocorrelation):
# ZCR separates voiced speech (low) from fricatives/noise (high) and
# is the cheapest VAD feature there is. A crossing = consecutive
# samples straddling the uint8 midpoint 128 on the decoded PCM; the
# operator (operators/multimodal.py audio_zcr_stats) emits pure
# integer counts over the WAV decode rail, the query adds the ZCR and
# high-side share as exact micros rationals, and the oracle replays
# the crossings from raw hex with a shifted-pair list comparison —
# per-sample semantics fully under the differential gate.
# Scale: one Arrow mapInPandas pass, counts only; per-media work is
# linear in samples.


def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units
    from ..operators.multimodal import audio_zcr_stats

    per = audio_zcr_stats(_shared_audio_pcm(spark, sf_dir), pcm_col="pcm")
    return per.select(
        "media_id",
        "n_samples",
        "n_above",
        "n_zc",
        F.when(F.col("n_samples") <= 1, F.lit(None).cast("long"))
        .otherwise(ratio_units("n_zc", "n_samples - 1"))
        .alias("zcr_micros"),
        F.when(F.col("n_samples") == 0, F.lit(None).cast("long"))
        .otherwise(ratio_units("n_above", "n_samples"))
        .alias("above_share_micros"),
    )


QUERIES["multimodal_audio_zcr"] = multimodal_audio_zcr

from ..functions.rounding import sql_ratio_units as _sql_ru_zcr  # noqa: E402

ORACLES["multimodal_audio_zcr"] = f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 500 + 100 AS BIGINT) AS n_samples
        FROM documents WHERE length(text) > 0
    ), samp AS (
        SELECT doc_id AS media_id, n_samples,
               list_transform(range(0, CAST(n_samples AS INTEGER)),
                              j -> CAST({_byte_at('j % _tb')} >= 128
                                   AS INTEGER)) AS hi
        FROM sized
    ), agg AS (
        SELECT media_id,
               CAST(n_samples AS BIGINT) AS n_samples,
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), hi),
                    (x, y) -> x + y) AS BIGINT) AS n_above,
               CAST(CASE WHEN n_samples <= 1 THEN 0 ELSE
                    len(list_filter(
                        range(1, CAST(n_samples AS INTEGER)),
                        j -> hi[j] != hi[j + 1]))
               END AS BIGINT) AS n_zc
        FROM samp
    )
    SELECT media_id, n_samples, n_above, n_zc,
           CASE WHEN n_samples <= 1 THEN NULL
                ELSE {_sql_ru_zcr('n_zc', 'n_samples - 1')}
           END AS zcr_micros,
           CASE WHEN n_samples = 0 THEN NULL
                ELSE {_sql_ru_zcr('n_above', 'n_samples')}
           END AS above_share_micros
    FROM agg
"""


# ----------------------------------------------- image border geometry
# Round 13: the letterbox/pillarbox screen — scraped images routinely
# carry uniform padding bars that waste pixels and poison crop-based
# augmentation, so a vision-data pipeline counts uniform border rows/
# columns before deciding to crop. Per image over the strict PPM
# decode rail (operators/multimodal.py image_border_stats): counts of
# consecutive rows from the top/bottom (columns from left/right)
# whose every pixel equals that edge's corner pixel — pure integer
# prefix counts, replayed by the oracle from raw hex with nested
# list lambdas (per-row/column all-bytes-match flags, then the
# first-zero prefix position). Scale: one Arrow mapInPandas pass,
# per-image work linear in pixels.


def multimodal_image_borders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        documents_as_ppm_images,
        image_border_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    per = image_border_stats(documents_as_ppm_images(docs))
    return per.select(
        "media_id",
        "w",
        "h",
        "top_rows",
        "bottom_rows",
        "left_cols",
        "right_cols",
        (
            (F.col("top_rows") > 0)
            | (F.col("bottom_rows") > 0)
            | (F.col("left_cols") > 0)
            | (F.col("right_cols") > 0)
        )
        .cast("int")
        .alias("has_border"),
    )


QUERIES["multimodal_image_borders"] = multimodal_image_borders


def _border_sql() -> str:
    # per-row flag: every byte of row r equals the corner pixel's
    # channel byte; prefix length = position of the first non-uniform
    # row (h when all rows are uniform)
    def rowflag(row_idx: str, corner_ch: str) -> str:
        return (
            f"CASE WHEN len(list_filter(range(0, 3 * w), k ->"
            f" {_byte_at(f'(({row_idx}) * 3 * w + k) % _tb')}"
            f" != {_byte_at(f'({corner_ch}) % _tb')})) = 0"
            f" THEN 1 ELSE 0 END"
        )

    def colflag(col_idx: str, corner_base: str) -> str:
        return (
            f"CASE WHEN len(list_filter(range(0, 3 * h), j ->"
            f" {_byte_at(f'(((j // 3) * w + ({col_idx})) * 3 + (j % 3)) % _tb')}"
            f" != {_byte_at(f'(({corner_base}) + (j % 3)) % _tb')})) = 0"
            f" THEN 1 ELSE 0 END"
        )

    # DuckDB list_position returns 0 (not NULL) when the element is
    # absent — nullif maps the all-uniform case to the full extent
    top = (
        f"coalesce(nullif(list_position(list_transform(range(0, h),"
        f" r -> {rowflag('r', 'k % 3')}), 0), 0) - 1, h)"
    )
    bottom = (
        f"coalesce(nullif(list_position(list_transform(range(0, h),"
        f" r -> {rowflag('h - 1 - r', '(h - 1) * 3 * w + (k % 3)')}), 0), 0)"
        f" - 1, h)"
    )
    left = (
        f"coalesce(nullif(list_position(list_transform(range(0, w),"
        f" c -> {colflag('c', '0')}), 0), 0) - 1, w)"
    )
    right = (
        f"coalesce(nullif(list_position(list_transform(range(0, w),"
        f" c -> {colflag('w - 1 - c', '(w - 1) * 3')}), 0), 0) - 1, w)"
    )
    return f"""
    WITH sized AS (
        SELECT doc_id,
               hex(encode(text)) AS _hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS _tb,
               CAST(doc_id % 16 + 1 AS BIGINT) AS w,
               CAST(doc_id % 12 + 1 AS BIGINT) AS h
        FROM documents WHERE length(text) > 0
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS w,
           CAST(h AS INTEGER) AS h,
           CAST({top} AS INTEGER) AS top_rows,
           CAST({bottom} AS INTEGER) AS bottom_rows,
           CAST({left} AS INTEGER) AS left_cols,
           CAST({right} AS INTEGER) AS right_cols,
           CAST({top} > 0 OR {bottom} > 0 OR {left} > 0 OR {right} > 0
                AS INTEGER) AS has_border
    FROM sized
"""


ORACLES["multimodal_image_borders"] = _border_sql()
