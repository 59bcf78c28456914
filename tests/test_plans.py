"""Plan-shape tests: the scale-critical Catalyst properties (pushdown,
pruning, broadcast, codegen) asserted against real physical plans on the
driver's parquet tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from price_crawler_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_wholestage_codegen,
    explain_str,
)
from price_crawler_spark.plans.partitioning import (
    N_SEEN_SHARDS,
    salted_fetch_key,
    seen_shard,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_filter_pushdown_reaches_parquet(orders):
    df = orders.filter(F.col("o_totalprice") > 1000.0).select("o_orderkey")
    assert_pushed_filters(df, "GreaterThan(o_totalprice,1000.0)")


def test_column_pruning_reaches_parquet(lineitem):
    df = lineitem.select("l_orderkey", "l_quantity")
    assert_read_schema_only(df, "l_orderkey", "l_quantity")


def test_projection_filter_pruned_together(lineitem):
    df = (
        lineitem.filter(F.col("l_returnflag") == "N")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    assert_pushed_filters(df, "EqualTo(l_returnflag,N)")
    assert_read_schema_only(df, "l_returnflag", "l_quantity")
    assert_wholestage_codegen(df)


def test_small_dim_join_broadcasts(spark, orders):
    dim = spark.createDataFrame(
        [(i, f"h{i}") for i in range(20)], ["k", "name"]
    )
    joined = orders.join(dim, orders.o_custkey % 20 == dim.k)
    assert_broadcast_join(joined)


def test_extraction_stays_in_codegen(spark):
    """The scalar-function library compiles into whole-stage codegen — no
    interpreted eval, no Python in the plan."""
    from price_crawler_spark.functions.prices import extract_price
    from price_crawler_spark.functions.urls import canonicalize_with_host

    part = spark.read.parquet(f"{SF}/part.parquet")
    df = part.select(
        extract_price(F.concat(F.lit("NT$"), F.col("p_retailprice"))).alias("p"),
        canonicalize_with_host(F.concat(F.lit("https://x.com/a?b="), "p_name")).alias("c"),
    )
    assert_wholestage_codegen(df)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_similarity_is_arrow_not_row_python(spark):
    """The one Python crossing (difflib similarity) must be Arrow-batched
    (ArrowEvalPython), never row-at-a-time BatchEvalPython."""
    from price_crawler_spark.operators.matcher import similarity_col

    part = spark.read.parquet(f"{SF}/part.parquet")
    df = part.select(similarity_col("red widget", F.col("p_name")).alias("s"))
    plan = explain_str(df)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_topn_plans_as_take_ordered_not_global_window(spark):
    """The global top-N tails (blocked-jaccard pairs, sapphire unpriced cap,
    page-1 pagination) must plan as TakeOrderedAndProject — never a
    single-partition WindowExec."""
    from price_crawler_spark.operators.search import paginate
    from price_crawler_spark.pipeline.dedup import blocked_jaccard_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = explain_str(blocked_jaccard_pairs(docs))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    page1 = paginate(orders, page=1, per_page=20, order_cols=("o_orderkey",))
    plan1 = explain_str(page1)
    assert "TakeOrderedAndProject" in plan1
    assert "Window" not in plan1


def test_embedding_near_pairs_prunes_columns(spark):
    """The block-local embedding self-join reads only (vec_id, label,
    embedding) from parquet and keeps the cosine fold in the JVM (no Python
    in the plan)."""
    from price_crawler_spark.pipeline.ann import embedding_near_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = embedding_near_pairs(emb, threshold=0.2)
    assert_read_schema_only(df, "vec_id", "embedding", "label")
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_seen_shard_is_parallelism_independent(spark):
    """Shard membership depends only on the hash value — never on the
    session's parallelism (SURVEY §7.3.5: resizing the cluster must not
    move keys between Bloom shards)."""
    df8 = spark.range(1000).select(
        seen_shard(F.xxhash64("id")).alias("s")
    )
    rows = [r.s for r in df8.orderBy("id").collect()]
    assert all(0 <= s < N_SEEN_SHARDS for s in rows)
    df_re = spark.range(1000).repartition(3).select(
        "id", seen_shard(F.xxhash64("id")).alias("s")
    )
    rows_re = {r.id: r.s for r in df_re.collect()}
    for i, s in enumerate(rows):
        assert rows_re[i] == s


def test_salted_fetch_key_only_splits_mega_hosts(spark):
    df = spark.createDataFrame(
        [("big.com", i) for i in range(100)] + [("small.com", i) for i in range(100)],
        ["host", "h"],
    ).select("host", salted_fetch_key("host", F.col("h").cast("long"), ["big.com"], 4).alias("k"))
    keys = df.groupBy("host").agg(F.countDistinct("k").alias("n")).collect()
    by_host = {r.host: r.n for r in keys}
    assert by_host["small.com"] == 1
    assert by_host["big.com"] == 4


def test_scan_guard_repartitions_narrow_file_scan_without_rdd_probe(spark):
    """ensure_scan_parallelism: a one-file parquet scan repartitions up to
    defaultParallelism; an in-memory frame and a post-guard frame pass
    through untouched. The probe must stay metadata-only (inputFiles), so
    the plan string of an untouched frame must not grow an Exchange."""
    from price_crawler_spark.plans.partitioning import (
        _size_to_bytes,
        ensure_scan_parallelism,
    )

    target = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert len(docs.inputFiles()) < target  # premise: narrow test scan
    guarded = ensure_scan_parallelism(docs)
    assert guarded.rdd.getNumPartitions() >= target  # test may probe .rdd

    mem = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    assert ensure_scan_parallelism(mem) is mem  # non-file input untouched

    # size-string parser handles every Spark conf spelling
    assert _size_to_bytes("134217728") == 134217728
    assert _size_to_bytes("128m") == 128 << 20
    assert _size_to_bytes("128MB") == 128 << 20
    assert _size_to_bytes("1g") == 1 << 30
    assert _size_to_bytes("512kb") == 512 << 10
    assert _size_to_bytes("64b") == 64
