"""Streaming URL-seen dedup — ``applyInPandasWithState`` keyed by seen
shard.

The batch path (frontier.seen.ShardedBloom) persists Bloom shard bytes to
the snapshot store between waves; the streaming path keeps the same
per-shard state under Spark's state store instead: key = pmod(url_hash,
N_SEEN_SHARDS) (parallelism-independent, SURVEY §7.3.5), state = the exact
seen-hash set of that shard. Each micro-batch emits only first-seen URLs —
across batches, not just within one.

State is the EXACT set (not a Bloom) here: Spark state is per-key
spill-backed, and exactness preserves the engine guarantee that the final
seen-set has no false positives. A production variant holding 10^10 URLs
would store the Bloom bytes + spill the exact tail to the snapshot store —
the group-key discipline is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from price_crawler_spark.plans.partitioning import seen_shard

SEEN_OUT_SCHEMA = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("canonical_url", StringType(), True),
    ]
)
# State is the shard's exact seen-hash set as a 4-byte magic tag + PACKED
# little-endian int64 bytes (8 B/URL — an order of magnitude tighter than
# the v0 CSV string, and zero-parse on load via numpy.frombuffer). Bytes
# are kept sorted so the state blob is deterministic under any batch
# arrival order. The magic tag versions the format: a blob without it is a
# legacy v0 CSV payload (Spark's state-schema check blocks a string→binary
# checkpoint restart anyway, but the decoder never misreads bytes on its
# own format evolution).
SEEN_STATE_MAGIC = b"PCS1"
SEEN_STATE_SCHEMA = StructType([StructField("seen", BinaryType(), True)])


def _decode_seen(blob: bytes) -> set[int]:
    if blob.startswith(SEEN_STATE_MAGIC):
        return set(np.frombuffer(blob[len(SEEN_STATE_MAGIC):], dtype="<i8").tolist())
    return {int(x) for x in blob.decode().split(",") if x}  # legacy v0 CSV


def _dedup_shard(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set[int] = set()
    if state.exists:
        (blob,) = state.get
        if blob:
            seen = _decode_seen(bytes(blob))
    out_h: list[int] = []
    out_u: list[str] = []
    for pdf in batches:
        # deterministic first-wins inside the batch: ascending url_hash
        pdf = pdf.sort_values(["url_hash", "canonical_url"])
        for h, u in zip(pdf["url_hash"], pdf["canonical_url"]):
            h = int(h)
            if h not in seen:
                seen.add(h)
                out_h.append(h)
                out_u.append(u)
    state.update(
        (SEEN_STATE_MAGIC + np.asarray(sorted(seen), dtype="<i8").tobytes(),)
    )
    yield pd.DataFrame({"url_hash": out_h, "canonical_url": out_u})


def streaming_first_seen(candidates: DataFrame) -> DataFrame:
    """candidates(url_hash LONG, canonical_url STRING) stream → first-seen
    rows only, deduped across micro-batches via per-shard state."""
    keyed = candidates.withColumn("shard", seen_shard("url_hash"))
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_shard,
        outputStructType=SEEN_OUT_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_equivalent_first_seen(candidates: DataFrame) -> DataFrame:
    """The batch oracle for the streaming dedup: global first-wins by
    url_hash over the union of all micro-batch inputs."""
    from pyspark.sql import Window

    w = Window.partitionBy("url_hash").orderBy("canonical_url")
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("url_hash", "canonical_url")
    )
