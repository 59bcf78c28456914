"""Streaming document ingest + watermarked fetch metrics.

Batch remains the primary wave driver; these give the engine a continuous
posture:

  * ``stream_documents``   — file-source stream of documents parquet (new
    files appear as the crawler lands waves) → same span-extraction operators
    as batch (the extraction library is pure Column expressions, so it is
    batch/stream agnostic by construction).
  * ``windowed_fetch_metrics`` — per-(window, store) fetch counts with a
    watermark: late fetch logs (stragglers from a slow host partition) are
    folded in up to the allowed lateness, then the window finalizes — the
    streaming analogue of the per-wave lineage metrics table.

Determinism in tests: Trigger.AvailableNow + memory sink processes exactly
the files present, then stops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

FETCH_LOG_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("store", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("fetched_at", T.TimestampType(), False),
    ]
)


def stream_documents(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over the documents table directory. One file =
    one wave commit; maxFilesPerTrigger bounds micro-batch size so a burst
    of waves can't blow up a single batch."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(docs_dir)
    )


def spans_per_kind(docs_stream: DataFrame) -> DataFrame:
    """Streaming span-kind histogram per store — runs the same exploded-span
    shape the batch extraction operators use."""
    return (
        docs_stream.select("store", F.explode("spans").alias("s"))
        .groupBy("store", F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n_spans"))
    )


def windowed_fetch_metrics(
    fetch_stream: DataFrame,
    window: str = "10 minutes",
    lateness: str = "5 minutes",
) -> DataFrame:
    """Watermarked windowed fetch stats: counts finalize once the watermark
    passes window end + lateness; stragglers inside the bound still count."""
    return (
        fetch_stream.withWatermark("fetched_at", lateness)
        .groupBy(F.window("fetched_at", window).alias("w"), "store")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "store",
            "n_fetches",
            "n_ok",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Run the stream over exactly the currently-available input (memory
    sink), block until done, return the result as a batch DataFrame."""
    mode = "complete" if stream_df.isStreaming and _has_agg(stream_df) else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
