"""Structured Streaming layer: deterministic AvailableNow runs over staged
files; streaming results must equal their batch equivalents."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from price_crawler_spark.streaming import ingest, seen_state


@pytest.fixture()
def tmp_stream_dir(tmp_path):
    d = str(tmp_path / "stream_in")
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_docs_wave(spark, d, wave, rows):
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(d)


def _doc(doc_id, store, wave, kinds):
    spans = [(k, f"t{i}", None, i) for i, k in enumerate(kinds)]
    return (doc_id, spans, store, wave, wave * 100)


def test_stream_span_histogram_matches_batch(spark, tmp_stream_dir):
    rows = [
        _doc("d1", "pchome", 0, ["title", "price", "image"]),
        _doc("d2", "pchome", 0, ["title", "price"]),
        _doc("d3", "coolpc", 1, ["option", "option", "option"]),
    ]
    _write_docs_wave(spark, tmp_stream_dir, 0, rows)

    stream = ingest.stream_documents(spark, tmp_stream_dir)
    assert stream.isStreaming
    result = ingest.run_available_now(
        ingest.spans_per_kind(stream), "spans_hist"
    )
    got = {(r.store, r.kind): r.n_spans for r in result.collect()}
    assert got == {
        ("pchome", "title"): 2,
        ("pchome", "price"): 2,
        ("pchome", "image"): 1,
        ("coolpc", "option"): 3,
    }


def test_windowed_fetch_metrics_watermark(spark, tmp_stream_dir):
    import datetime

    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, "pchome", True, base),
        (2, "pchome", False, base + datetime.timedelta(minutes=3)),
        (3, "coolpc", True, base + datetime.timedelta(minutes=12)),
        # straggler within lateness for the first window
        (4, "pchome", True, base + datetime.timedelta(minutes=4)),
    ]
    df = spark.createDataFrame(rows, ingest.FETCH_LOG_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(tmp_stream_dir)

    stream = (
        spark.readStream.schema(ingest.FETCH_LOG_SCHEMA)
        .parquet(tmp_stream_dir)
    )
    result = ingest.run_available_now(
        ingest.windowed_fetch_metrics(stream), "fetch_metrics"
    )
    got = {
        (r.window_start.minute, r.store): (r.n_fetches, r.n_ok)
        for r in result.collect()
    }
    assert got == {(0, "pchome"): (3, 2), (10, "coolpc"): (1, 1)}


def test_streaming_first_seen_dedups_across_batches(spark, tmp_stream_dir):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("url_hash", LongType(), False),
            StructField("canonical_url", StringType(), True),
        ]
    )
    wave1 = [(1, "u1"), (2, "u2"), (3, "u3")]
    wave2 = [(2, "u2"), (3, "u3"), (4, "u4")]  # 2,3 already seen
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode("append").parquet(tmp_stream_dir)
    spark.createDataFrame(wave2, schema).coalesce(1).write.mode("append").parquet(tmp_stream_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(tmp_stream_dir)
    )
    out = seen_state.streaming_first_seen(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.url_hash, r.canonical_url)
        for r in spark.table("first_seen").collect()
    }

    batch = spark.createDataFrame(wave1 + wave2, schema)
    expected = {
        (r.url_hash, r.canonical_url)
        for r in seen_state.batch_equivalent_first_seen(batch).collect()
    }
    assert got == expected == {(1, "u1"), (2, "u2"), (3, "u3"), (4, "u4")}


def test_seen_state_decode_versioning():
    """The magic-tagged packed-int64 format round-trips, and a legacy v0
    CSV blob still decodes (format evolution never misreads bytes)."""
    import numpy as np

    from price_crawler_spark.streaming.seen_state import (
        SEEN_STATE_MAGIC,
        _decode_seen,
    )

    hashes = {-5, 0, 3, 2**62}
    blob = SEEN_STATE_MAGIC + np.asarray(sorted(hashes), dtype="<i8").tobytes()
    assert _decode_seen(blob) == hashes
    assert _decode_seen(b"1,2,42") == {1, 2, 42}  # legacy CSV
    assert _decode_seen(b"") == set()


def test_streaming_first_seen_binary_state_at_scale(spark, tmp_stream_dir):
    """Batch-equivalence at 10× the small fixture and across 4 micro-batches:
    the packed-int64 state blob must carry the exact seen set between
    batches (heavy cross-batch overlap, multiple shards)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("url_hash", LongType(), False),
            StructField("canonical_url", StringType(), True),
        ]
    )
    waves = []
    for w in range(4):
        # 30 urls/wave, stride 17 → heavy overlap between adjacent waves
        rows = [
            (1000 + (w * 17 + i) % 60, f"u{1000 + (w * 17 + i) % 60}")
            for i in range(30)
        ]
        waves.append(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(tmp_stream_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp_stream_dir)
    )
    out = seen_state.streaming_first_seen(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen_scale")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.url_hash, r.canonical_url)
        for r in spark.table("first_seen_scale").collect()
    }
    flat = [r for rows in waves for r in rows]
    batch = spark.createDataFrame(flat, schema)
    expected = {
        (r.url_hash, r.canonical_url)
        for r in seen_state.batch_equivalent_first_seen(batch).collect()
    }
    assert got == expected
    assert len(got) == 60  # every distinct hash exactly once
