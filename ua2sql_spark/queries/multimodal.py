"""Multimodal columns: SURVEY.md §2.11 X6.

Media are opaque ``binary`` payload columns plus typed metadata. The
container has no image/audio codecs, so the *decode* step is a
deterministic stand-in (documented stub — see
``ua2sql_spark.functions.media`` for the real-codec seam); everything
Spark-side — binary schema, Arrow batching through ``mapInPandas``,
partition-preserving metadata extraction — is real and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ua2sql_spark.catalog import load_table
from ua2sql_spark.registry import query


# ---------------------------------------------------------------------------
# X6a: binary payload + typed metadata, all in-plan (no Python). The
# payload here is the utf-8 encoding of `text` standing in for image
# bytes; at scale this column comes from `binaryFile` reads.
# ---------------------------------------------------------------------------
@query(
    "x52_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           sha256(text) AS payload_sha,
           substring(sha256(text), 1, 8) AS shard_key,
           (octet_length(encode(text)) % 640) AS fake_width,
           (octet_length(encode(text)) % 480) AS fake_height
    FROM documents
    """,
)
def x52_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    nbytes = F.octet_length(payload)
    sha = F.sha2(payload, 256)
    return d.select(
        "doc_id",
        nbytes.alias("payload_bytes"),
        sha.alias("payload_sha"),
        F.substring(sha, 1, 8).alias("shard_key"),
        (nbytes % 640).alias("fake_width"),
        (nbytes % 480).alias("fake_height"),
    )


# ---------------------------------------------------------------------------
# X6b: the decode path — Arrow-batched mapInPandas over binary payloads.
# The "decoder" is a deterministic stub (real codecs are not in this
# container); the oracle replicates its arithmetic in SQL, so what's
# verified is the full Spark plumbing: binary column in, typed schema
# out, batch-wise pandas execution.
# ---------------------------------------------------------------------------
_DECODE_SCHEMA = "doc_id BIGINT, width INT, height INT, mean_pixel DOUBLE"


def decode_images(df: DataFrame, decoder=None) -> DataFrame:
    """The X6 image-decode operator: (doc_id, payload binary) →
    (doc_id, width, height, mean_pixel) via Arrow-batched mapInPandas.

    ``decoder`` is any `payload bytes -> {width, height, mean_pixel}`
    callable — `functions.media.decode_image_real` (actual PPM/PGM/BMP
    pixel decode, the default) or `fake_decode_image` (length-derived
    stand-in the SQL oracle can mirror). Same plan either way; only the
    per-batch Python body differs."""
    from ua2sql_spark.functions.media import decode_image_real

    dec = decoder or decode_image_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [dec(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(
                        [d["width"] for d in decoded], dtype="int32"
                    ),
                    "height": pd.Series(
                        [d["height"] for d in decoded], dtype="int32"
                    ),
                    "mean_pixel": pd.Series(
                        [d["mean_pixel"] for d in decoded], dtype="float64"
                    ),
                }
            )

    return df.mapInPandas(batches, schema=_DECODE_SCHEMA)


def _fake_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image decoder: derives dimensions and
    a 'mean pixel' from payload length alone — vectorized, so the
    oracle-checked hot path stays column-wise; the per-payload real-codec
    path is `decode_images`."""
    for pdf in batches:
        nbytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (nbytes % 640).astype("int32"),
                "height": (nbytes % 480).astype("int32"),
                "mean_pixel": ((nbytes * 37) % 256).astype("float64") / 255.0,
            }
        )


@query(
    "x53_decode_mapinpandas",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) * 37 % 256 AS DOUBLE) / 255.0 AS mean_pixel
    FROM documents
    """,
)
def x53_decode_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return with_payload.mapInPandas(_fake_decode_batches, schema=_DECODE_SCHEMA)


def thumbnail_images(
    df: DataFrame, target_long_side: int = 256, quality: int = 85
) -> DataFrame:
    """The X6 thumbnailing operator: (doc_id, payload binary) →
    (doc_id, thumb binary, thumb_width, thumb_height) via Arrow-batched
    mapInPandas. Decode → aspect-preserving downscale → baseline-JPEG
    re-encode, all inside ``functions.media.thumbnail_real`` (pure
    stdlib here; a cluster binds the same seam to libjpeg-turbo).
    Payloads in unsupported formats pass through as NULL thumbs rather
    than failing the batch — corrupt media must never kill a 100 TB
    job."""
    from ua2sql_spark.functions.media import thumbnail_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs, widths, heights = [], [], []
            for p in pdf["payload"]:
                try:
                    t, w, h = thumbnail_real(p, target_long_side, quality)
                    thumbs.append(t)
                    widths.append(w)
                    heights.append(h)
                except NotImplementedError:
                    thumbs.append(None)
                    widths.append(None)
                    heights.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_width": pd.array(widths, dtype="Int32"),
                    "thumb_height": pd.array(heights, dtype="Int32"),
                }
            )

    return df.mapInPandas(
        batches,
        schema="doc_id bigint, thumb binary, thumb_width int, thumb_height int",
    )


def probe_media(df: DataFrame) -> DataFrame:
    """The X6 media-triage operator: (doc_id, payload binary) → typed
    metadata (kind, width, height, duration_s, sample_rate, n_tracks)
    via Arrow-batched mapInPandas over ``functions.media``'s unified
    probe. Full image decode where supported, header-level probing for
    MP3/MP4 (the duration/bitrate a pipeline filter needs, no PCM or
    pixels), kind='unknown' for anything else — corrupt payloads never
    fail the batch. This is the first pass of every multimodal ingest:
    gate on dimensions/duration before any expensive decode."""
    from ua2sql_spark.functions.media import probe_media_metadata

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            probed = [probe_media_metadata(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [d["kind"] for d in probed],
                    "width": pd.array([d["width"] for d in probed], dtype="Int32"),
                    "height": pd.array([d["height"] for d in probed], dtype="Int32"),
                    "duration_s": pd.array(
                        [d["duration_s"] for d in probed], dtype="Float64"
                    ),
                    "sample_rate": pd.array(
                        [d["sample_rate"] for d in probed], dtype="Int32"
                    ),
                    "n_tracks": pd.array(
                        [d["n_tracks"] for d in probed], dtype="Int32"
                    ),
                    "exif_orientation": pd.array(
                        [d["exif_orientation"] for d in probed], dtype="Int32"
                    ),
                    "exif_datetime": [d["exif_datetime"] for d in probed],
                }
            )

    return df.mapInPandas(
        batches,
        schema=(
            "doc_id bigint, kind string, width int, height int, "
            "duration_s double, sample_rate int, n_tracks int, "
            "exif_orientation int, exif_datetime string"
        ),
    )


# ---------------------------------------------------------------------------
# X6c: frame sampling — the 1→N multimodal expansion (one video payload
# row out to many sampled-frame rows) through Arrow-batched mapInPandas.
# The fake codec derives frames from payload length (functions/media.py
# is the real-codec seam); the oracle replicates its arithmetic, so the
# verified part is the expansion plumbing: batch in, variable-length
# frame rows out, schema preserved.
# ---------------------------------------------------------------------------
@query(
    "x83_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(frame_no AS BIGINT) AS frame_no,
           CAST(frame_no * 100 AS BIGINT) AS frame_offset,
           md5(doc_id || '|' || frame_no) AS frame_hash
    FROM (
        SELECT doc_id,
               unnest(range(0, octet_length(encode(text)) // 100, 10)) AS frame_no
        FROM documents
    )
    """,
)
def x83_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.functions.media import fake_sample_frames

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fr in fake_sample_frames(doc_id, payload):
                    rows.append(
                        (doc_id, fr["frame_no"], fr["frame_offset"], fr["frame_hash"])
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_offset", "frame_hash"]
            )

    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return with_payload.mapInPandas(
        sample_batches,
        schema="doc_id bigint, frame_no bigint, frame_offset bigint, frame_hash string",
    )


# ---------------------------------------------------------------------------
# X6d: EXIF orientation + capture-timestamp extraction — the highest-
# frequency metadata a real multimodal pipeline reads (VERDICT r5
# next-round #8). The corpus is text, so each doc's payload is a REAL
# 8x8 baseline JPEG (pure-stdlib encoder) with a per-doc APP1/Exif
# segment spliced after SOI, tags derived deterministically from doc_id
# in BOTH engines (the x111/x143 injection pattern): the Spark side
# provably round-trips actual EXIF bytes through the marker walk +
# TIFF-IFD parse, and the oracle replicates the derivation arithmetic.
# Map-only: one Arrow-batched mapInPandas, no shuffle — at 100 TB this
# rides the same binaryFile scan as the rest of media triage.
# ---------------------------------------------------------------------------
from functools import lru_cache


@lru_cache(maxsize=1)
def _exif_base_jpeg() -> bytes:
    from ua2sql_spark.functions.jpeg import encode_jpeg

    raster = bytes((x * 17 + y * 31) % 256 for y in range(8) for x in range(8))
    return encode_jpeg(8, 8, 1, raster, quality=90)


@query(
    "x153_exif_probe",
    oracle="""
    SELECT doc_id,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(doc_id % 8 + 1 AS INTEGER) AS exif_orientation,
           '2024:01:0' || CAST(doc_id % 9 + 1 AS VARCHAR)
               || ' 00:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
               AS exif_datetime
    FROM documents
    """,
)
def x153_exif_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.functions.media import encode_exif_app1, probe_media_metadata

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = _exif_base_jpeg()
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                dt = f"2024:01:0{i % 9 + 1} 00:00:{i % 60:02d}"
                payload = base[:2] + encode_exif_app1(
                    orientation=i % 8 + 1, datetime_original=dt
                ) + base[2:]
                d = probe_media_metadata(payload)
                rows.append(
                    (i, d["width"], d["height"], d["exif_orientation"],
                     d["exif_datetime"])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "exif_orientation",
                    "exif_datetime",
                ],
            )

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        batches,
        schema=(
            "doc_id bigint, width int, height int, "
            "exif_orientation int, exif_datetime string"
        ),
    )


# ---------------------------------------------------------------------------
# X6f: audio feature extraction through a REAL encode→decode round
# trip. Each row synthesizes a deterministic 16-bit PCM mono WAV
# (samples from an integer formula on doc_id, so SQL can replay them),
# writes it with the stdlib encoder, then decodes it back through
# ``functions.media.decode_audio_real`` — the same seam a cluster
# binds to libsndfile — inside one Arrow-batched mapInPandas. The
# oracle recomputes every emitted number from the sample formula
# alone, so what the gate verifies is that the WAV bytes on the wire
# round-trip losslessly: a header/byte-order/width bug in either codec
# direction breaks payload_bytes, n_samples, or rms.
#
# All interior arithmetic is integer (sum of s² ≤ n·2048² ≪ 2⁵³, so
# the one cast to double is exact in both engines); rms/duration are
# single correctly-rounded divisions. Scale: map-only per-row Python
# at Arrow batch granularity — the deliberate Python hot path, benched
# alongside x53.
# ---------------------------------------------------------------------------
_AUD_RATE = 16000


def _audio_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import io
    import wave

    from ua2sql_spark.functions.media import decode_audio_real

    for pdf in it:
        rows = {k: [] for k in
                ("doc_id", "payload_bytes", "channels", "sample_rate",
                 "n_samples", "duration_s", "rms")}
        import numpy as np

        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = 800 + (doc_id % 7) * 160
            # exact int64 arithmetic — identical values to the naive
            # per-sample loop (and to the oracle's list_transform)
            k = np.arange(n, dtype=np.int64)
            samples = ((doc_id * 131 + k * 17) % 4096) - 2048
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(_AUD_RATE)
                w.writeframes(samples.astype("<i2").tobytes())
            payload = buf.getvalue()
            stats = decode_audio_real(payload)
            rows["doc_id"].append(doc_id)
            rows["payload_bytes"].append(len(payload))
            rows["channels"].append(stats["channels"])
            rows["sample_rate"].append(stats["sample_rate"])
            rows["n_samples"].append(stats["n_samples"])
            rows["duration_s"].append(round(stats["duration_s"], 6))
            rows["rms"].append(round(stats["rms"], 6))
        yield pd.DataFrame(rows)


@query(
    "x180_audio_features",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, 800 + (doc_id % 7) * 160 AS n FROM documents
    ),
    s AS (
        SELECT doc_id, n,
               unnest(list_transform(range(0, n),
                      k -> ((doc_id * 131 + k * 17) % 4096) - 2048)) AS v
        FROM p
    ),
    a AS (
        SELECT doc_id, ANY_VALUE(n) AS n, SUM(v * v) AS ss
        FROM s GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(44 + 2 * n AS BIGINT) AS payload_bytes,
           1 AS channels, {_AUD_RATE} AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           ROUND(CAST(n AS DOUBLE) / {_AUD_RATE}, 6) AS duration_s,
           ROUND(SQRT(CAST(ss AS DOUBLE) / n), 6) AS rms
    FROM a ORDER BY doc_id
    """,
)
def x180_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # the projected column is 8 bytes/row — repartition is near-free and
    # spreads the per-row codec work across executors (the table is a
    # handful of files, so the scan alone gives ~1 task)
    return d.select("doc_id").repartition(32, "doc_id").mapInPandas(
        _audio_batches,
        schema=(
            "doc_id bigint, payload_bytes bigint, channels int, "
            "sample_rate int, n_samples bigint, duration_s double, rms double"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# X6g: EXIF-orientation-aware thumbnailing (VERDICT r6 next-round #7 /
# r7 carry). Each doc synthesizes a REAL asymmetric grayscale JPEG
# (pure-stdlib encoder, dims derived from doc_id) tagged with a
# per-doc APP1/Exif orientation, then runs the PRODUCTION thumbnail
# chain (functions/media.thumbnail_real): decode -> orient upright
# BEFORE the downscale -> aspect-preserving resize -> re-encode. The
# hashed columns are the MEASURED thumb dimensions — integer-exact —
# and the oracle predicts them arithmetically (orientations 5-8 swap
# the visual axes; resize is floor integer scaling), so the whole
# decode/orient/resize geometry is pinned cross-engine without hashing
# codec bytes. Map-only: one Arrow-batched mapInPandas, no shuffle —
# the engine's deliberate Python media seam (same as x153/x180).
# Reference parity: ua2sql.py has no media path; SURVEY §2.11 X6.
# ---------------------------------------------------------------------------
_OT_TARGET = 10


@query(
    "x187_oriented_thumbs",
    oracle=f"""
    WITH spec AS (
        SELECT doc_id,
               CAST(doc_id % 8 + 1 AS INTEGER) AS exif_orientation,
               CAST(12 + (doc_id % 3) * 4 AS INTEGER) AS src_w,
               CAST(8 + (doc_id % 5) * 2 AS INTEGER) AS src_h
        FROM documents
    ),
    vis AS (
        SELECT doc_id, exif_orientation, src_w, src_h,
               CASE WHEN exif_orientation >= 5 THEN src_h ELSE src_w END AS vw,
               CASE WHEN exif_orientation >= 5 THEN src_w ELSE src_h END AS vh
        FROM spec
    )
    SELECT doc_id, exif_orientation, src_w, src_h,
           CAST(vw * {_OT_TARGET} // GREATEST(vw, vh) AS INTEGER) AS thumb_w,
           CAST(vh * {_OT_TARGET} // GREATEST(vw, vh) AS INTEGER) AS thumb_h
    FROM vis
    """,
)
def x187_oriented_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ua2sql_spark.functions.jpeg import encode_jpeg
    from ua2sql_spark.functions.media import encode_exif_app1, thumbnail_real

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 12 + (i % 3) * 4, 8 + (i % 5) * 2
                raster = bytes(
                    (x * 13 + y * 29 + i) % 256 for y in range(h) for x in range(w)
                )
                base = encode_jpeg(w, h, 1, raster, quality=90)
                tagged = base[:2] + encode_exif_app1(i % 8 + 1) + base[2:]
                _, tw, th = thumbnail_real(tagged, _OT_TARGET, quality=85)
                rows.append((i, i % 8 + 1, w, h, tw, th))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "exif_orientation", "src_w", "src_h",
                    "thumb_w", "thumb_h",
                ],
            )

    d = load_table(spark, sf_dir, "documents")
    # small parquet scans land in ONE partition; the per-row Python
    # encode->orient->resize->encode chain is the expensive part, so
    # spread it (x180's 6x lesson — the projected column is 8 B/row,
    # the repartition is near-free)
    return d.select("doc_id").repartition(32, "doc_id").mapInPandas(
        batches,
        schema=(
            "doc_id bigint, exif_orientation int, src_w int, src_h int, "
            "thumb_w int, thumb_h int"
        ),
    )
