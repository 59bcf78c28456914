"""Canonical schemas (SURVEY.md §1, FIXTURES.md).

The product row mirrors the reference's Pydantic model
(/root/reference/app/models/product.py:5-15) with price canonicalized to
DOUBLE; the documents table is exactly BASELINE.json's input_hint; the
frontier table is FIXTURES.md §2.
"""

from __future__ import annotations

from pyspark.sql import types as T

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("store", T.StringType(), False),
        T.StructField("product_name", T.StringType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("in_stock", T.BooleanType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("image_url", T.StringType(), True),
        T.StructField("specifications", T.StringType(), True),
        T.StructField("is_bundle", T.BooleanType(), True),
    ]
)

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# input_hint: (doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
        # provenance (extra cols allowed by the invariant; spans is what's compared)
        T.StructField("store", T.StringType(), True),
        T.StructField("wave", T.IntegerType(), True),
        T.StructField("fetched_seq", T.LongType(), True),
    ]
)

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canonical_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("store", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("allow", T.ArrayType(T.StringType()), True),
        T.StructField("deny", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

QUERY_CACHE_SCHEMA = T.StructType(
    [
        T.StructField("query_hash", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("expires_at", T.TimestampType(), False),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata
# (SURVEY.md — multimodal columns; decode is stubbed, plumbing is real).
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)
