"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual byte decoding is
STUBBED (``real_decode_image`` raises NotImplementedError unless PIL is
importable). Everything Spark-side — schema, partitioning, UDF signature,
Arrow batch shape, frame sampling — is real and tested. The deterministic
fake decode is a pure function of the payload byte length, so the DuckDB
oracle can mirror it exactly (octet_length arithmetic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def with_media_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct to each doc.
    (In production the payload is the fetched media blob; here it is the
    utf-8 encoding of the text — deterministic and size-realistic.)"""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
            kind.alias("kind"),
        ).alias("media_meta"),
    )


def fake_decode(b: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic stand-in for image/av decode: dims from byte length.
    Replace with a real decoder (PIL / soundfile / pyav) in production."""
    n = len(b)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    n_frames = 1 if kind == "image" else 1 + n % 8
    return width, height, n_frames


def real_decode_image(b: bytes):  # pragma: no cover - env-gated
    """Real decoder, gated on PIL availability (absent in this container)."""
    try:
        from PIL import Image  # noqa
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container ships without it — "
            "fake_decode is the deterministic test stand-in"
        ) from e
    import io

    return Image.open(io.BytesIO(b))


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, payload, media_meta).
    One Python crossing for the whole pipeline; batches arrive as Arrow
    record batches, the loop below is per-batch not per-row dispatch."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds = pdf["media_meta"].map(lambda m: m["kind"])
            dims = [
                fake_decode(bytes(b), k)
                for b, k in zip(pdf["payload"], kinds)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": kinds,
                    "payload_len": pdf["payload"].map(len),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(_decode, MEDIA_SCHEMA)


def sample_frames(decoded: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame sampling: evenly-strided frame indices (≤ max_frames per doc),
    exploded to one row per sampled frame — the shape a frame-level feature
    extractor consumes. Pure Column expressions (sequence + filter)."""
    stride = F.ceil(F.col("n_frames") / F.lit(max_frames)).cast("int")
    frames = F.filter(
        F.sequence(F.lit(0), F.col("n_frames") - 1),
        lambda i: i % stride == 0,
    )
    return decoded.select(
        "doc_id",
        "kind",
        F.posexplode(frames).alias("frame_pos", "frame_idx"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
    ]
)


def resize_media(decoded: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Aspect-preserving fit into (target_w, target_h): scale =
    min(tw/w, th/h), floor, min 1 px. mapInPandas with the same Arrow batch
    shape the production version uses — there the loop body calls
    ``PIL.Image.resize`` on the payload bytes; the dimension arithmetic
    (what the oracle checks) is identical either way."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            scale = [
                min(target_w / w, target_h / h)
                for w, h in zip(pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": [
                        max(1, math.floor(w * s)) for w, s in zip(pdf["width"], scale)
                    ],
                    "new_height": [
                        max(1, math.floor(h * s)) for h, s in zip(pdf["height"], scale)
                    ],
                }
            )

    return decoded.mapInPandas(_resize, RESIZED_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("feat", ArrayType(DoubleType())),
    ]
)


def media_feature_vector(media: DataFrame) -> DataFrame:
    """Feature extraction over the opaque payload: a 4-d deterministic
    signature (md5-derived, uniform in [0,1)) standing in for an encoder
    embedding. The Arrow plumbing — payload bytes into Python in record
    batches, fixed-width float vector out — is exactly the production shape
    (swap the md5 for a real model forward pass); md5 keeps the DuckDB
    oracle bit-exact (divisions by 2^32 are lossless in double)."""
    import hashlib

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                h = hashlib.md5(bytes(b)).hexdigest()
                feats.append(
                    [int(h[8 * i : 8 * i + 8], 16) / 4294967296.0 for i in range(4)]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["media_meta"].map(lambda m: m["kind"]),
                    "feat": feats,
                }
            )

    return media.mapInPandas(_feat, FEATURE_SCHEMA)


def duckdb_resized_media(
    table: str = "documents", target_w: int = 224, target_h: int = 224
) -> str:
    return f"""
WITH decoded AS ({duckdb_decoded_media(table)}),
s AS (
  SELECT *, least({target_w}.0 / width, {target_h}.0 / height) AS sc
  FROM decoded)
SELECT doc_id, kind, width, height,
       greatest(1, floor(width * sc))::INT AS new_width,
       greatest(1, floor(height * sc))::INT AS new_height
FROM s
"""


def duckdb_media_features(table: str = "documents") -> str:
    parts = ", ".join(
        f"('0x' || substr(md5(text), {8 * i + 1}, 8))::BIGINT / 4294967296.0"
        for i in range(4)
    )
    return f"""
SELECT doc_id,
       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
       [{parts}] AS feat
FROM {table}
"""


def duckdb_decoded_media(table: str = "documents") -> str:
    """Mirror of with_media_payload → decode_media on the documents table."""
    n = "strlen(text)"  # utf-8 byte length
    return f"""
SELECT doc_id,
       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
       {n}::BIGINT AS payload_len,
       (16 + {n} % 64)::INT AS width,
       (16 + ({n} // 64) % 64)::INT AS height,
       (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 1 + {n} % 8 END)::INT AS n_frames
FROM {table}
"""


def duckdb_sampled_frames(table: str = "documents", max_frames: int = 4) -> str:
    return f"""
WITH decoded AS ({duckdb_decoded_media(table)}),
frames AS (
  SELECT doc_id, kind,
         list_filter(range(0, n_frames),
                     i -> i % ceil(n_frames::DOUBLE / {max_frames})::INT = 0)
         AS fs
  FROM decoded
)
SELECT doc_id, kind,
       unnest(range(0, len(fs))) AS frame_pos,
       unnest(fs) AS frame_idx
FROM frames
"""
