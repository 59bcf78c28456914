"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship corpus-health query at sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry
(price_crawler_spark.entry_queries) — one entry per implemented operator
family from SURVEY.md §2 plus the training-data pipeline layer, each with a
DuckDB oracle unless genuinely non-SQL-expressible (the difflib similarity
UDF and the conv()-based sign-LSH probe).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Spark Python workers inherit the driver's env, not its sys.path — without
# this, every pandas-UDF query dies with ModuleNotFoundError when the driver
# process was launched outside the repo root.
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{_pp}" if _pp else _REPO

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-source corpus health over /root/testdata/sf0.001 —
    exact-dedup'd doc counts, mean quality, dominant language, and decoded
    media volume, in one plan (scan → dedup window → agg → broadcast join).
    """
    from price_crawler_spark.functions import text as T
    from price_crawler_spark.pipeline import dedup, multimodal

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    unique = dedup.drop_exact_dupes(docs)
    enriched = unique.select(
        "doc_id",
        "source",
        T.quality_score("text").alias("quality"),
        T.language_id("text").alias("lang"),
    )
    health = enriched.groupBy("source").agg(
        F.count("*").alias("n_unique_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.max_by("lang", F.length("lang")).alias("_"),  # placeholder drop
        F.mode("lang").alias("top_lang"),
    ).drop("_")

    media = multimodal.decode_media(multimodal.with_media_payload(docs))
    media_vol = media.groupBy(F.lit(1).alias("_k")).agg(
        F.sum("payload_len").alias("total_media_bytes")
    )
    return (
        health.crossJoin(F.broadcast(media_vol.drop("_k")))
        .orderBy("source")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from price_crawler_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from price_crawler_spark.entry_queries import ORACLES

    return dict(ORACLES)
