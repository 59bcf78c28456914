"""Similarity search over the ``embeddings`` table (array<float> column).

Three tiers, scale-shaped:

  * cosine_topk     — brute-force scan: one broadcast of the query vector,
                      one pass over the corpus, a single top-k. The baseline
                      and the verifier for the approximate tiers.
  * ivf_topk        — IVF-style: probe only the query's coarse partition
                      (the ``label`` column stands in for a centroid
                      assignment; at 100 TB the table is written partitioned
                      by it, so the probe is a partition-pruned scan).
  * signlsh_topk    — sign-random-projection LSH: 8 deterministic md5-derived
                      hyperplanes → 8-bit bucket; probe only the query's
                      bucket. Deterministic across engines/cluster sizes
                      (hyperplane values derive from md5, not an RNG).

The dot/norm folds are explicit left-to-right ``aggregate`` folds in DOUBLE,
and the DuckDB mirrors use ``list_reduce`` with the same fold order, so
cosine values are bit-identical across engines (no rounding races).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from price_crawler_spark.plans.partitioning import ensure_scan_parallelism

# ---------------------------------------------------------------------------
# cosine primitives (fold order fixed: left-to-right, double precision)
# ---------------------------------------------------------------------------


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        _fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


DUCKDB_FOLD = (
    "list_reduce(list_prepend(0.0::DOUBLE, {terms}), (x, y) -> x + y)"
)


def _duckdb_dot(a: str, b: str) -> str:
    terms = (
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)"
    )
    return DUCKDB_FOLD.format(terms=terms)


def _duckdb_norm(a: str) -> str:
    terms = f"list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)"
    return f"sqrt({DUCKDB_FOLD.format(terms=terms)})"


def duckdb_cosine(a: str, b: str) -> str:
    return f"({_duckdb_dot(a, b)} / ({_duckdb_norm(a)} * {_duckdb_norm(b)}))"


# ---------------------------------------------------------------------------
# brute-force top-k
# ---------------------------------------------------------------------------

def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbours of row ``query_vec_id`` by cosine, excluding itself.
    The single query row is broadcast — the corpus scan never shuffles; the
    final top-k is one global sort-limit (TakeOrderedAndProject)."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec")
    )
    scored = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def duckdb_cosine_topk(query_vec_id: int, k: int = 10, table: str = "embeddings") -> str:
    cos = duckdb_cosine("e.embedding", "q.embedding")
    return f"""
WITH q AS (SELECT embedding FROM {table} WHERE vec_id = {query_vec_id})
SELECT e.vec_id AS vec_id, round({cos}, 6) AS cos
FROM {table} e, q
WHERE e.vec_id <> {query_vec_id}
ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# IVF-style (coarse-partition probe)
# ---------------------------------------------------------------------------

def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    part_col: str = "label",
) -> DataFrame:
    """Probe only the query's coarse partition. With the table partitioned by
    ``part_col`` on disk this is a partition-pruned scan — the 100 TB shape of
    IVF; nprobe>1 = widen the filter to the nearest centroid set."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec"), F.col(part_col).alias("_qpart")
    )
    scored = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col(part_col) == F.col("_qpart"))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def duckdb_ivf_topk(query_vec_id: int, k: int = 10, table: str = "embeddings") -> str:
    cos = duckdb_cosine("e.embedding", "q.embedding")
    return f"""
WITH q AS (SELECT embedding, label FROM {table} WHERE vec_id = {query_vec_id})
SELECT e.vec_id AS vec_id, round({cos}, 6) AS cos
FROM {table} e JOIN q ON e.label = q.label
WHERE e.vec_id <> {query_vec_id}
ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# sign-random-projection LSH
# ---------------------------------------------------------------------------

N_PLANES = 8


def _plane_value(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    md5("p{plane}|{dim}") first 12 hex digits scaled. Same value derivable in
    any engine — no RNG state, no seed file."""
    h = F.md5(F.concat(F.lit(f"p{plane}|"), dim_idx.cast("string")))
    return (
        F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(float(16 ** 12))
        - 0.5
    )


def signlsh_bucket(vec: Column) -> Column:
    """8-bit LSH bucket: bit p = sign of <vec, plane_p>."""
    idxs = F.sequence(F.lit(1), F.size(vec))

    def _proj(plane: int) -> Column:
        return _fold_sum(
            F.zip_with(
                vec, idxs, lambda x, i: x.cast("double") * _plane_value(plane, i)
            )
        )

    bucket = F.lit(0)
    for p in range(N_PLANES):
        bucket = bucket + F.when(_proj(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def _duckdb_plane_value(plane: int, idx_expr: str) -> str:
    """DuckDB mirror of :func:`_plane_value`, bit-identical: same md5 input
    string, same first-12-hex-digits window, and ``('0x'||hex)::BIGINT``
    equals Spark's ``conv(hex, 16, 10)`` exactly (both yield the integer
    value, cast to DOUBLE before one division by 16^12 and one subtraction,
    all in IEEE double)."""
    return (
        f"(('0x' || substr(md5('p{plane}|' || {idx_expr}), 1, 12))::BIGINT"
        f"::DOUBLE / {float(16 ** 12)!r} - 0.5)"
    )


def _duckdb_signlsh_bucket(vec: str) -> str:
    """DuckDB mirror of :func:`signlsh_bucket`: per plane, the projection is
    the same left-to-right double fold as the Spark ``aggregate``, and only
    its SIGN feeds the bucket — identical fold ⇒ identical bit ⇒ identical
    bucket."""
    bits = []
    for p in range(N_PLANES):
        terms = (
            f"list_transform(range(1, len({vec}) + 1), "
            f"i -> {vec}[i]::DOUBLE * {_duckdb_plane_value(p, 'i')})"
        )
        proj = DUCKDB_FOLD.format(terms=terms)
        bits.append(f"CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(bits) + ")::INT"


def duckdb_signlsh_topk(query_vec_id: int, k: int = 10, table: str = "embeddings") -> str:
    cos = duckdb_cosine("e.embedding", "q.embedding")
    bucket = _duckdb_signlsh_bucket("embedding")
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket} AS bkt FROM {table}),
q AS (SELECT embedding, bkt FROM b WHERE vec_id = {query_vec_id})
SELECT e.vec_id AS vec_id, round({cos}, 6) AS cos
FROM b e JOIN q ON e.bkt = q.bkt
WHERE e.vec_id <> {query_vec_id}
ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


def embedding_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (id_a < id_b, cos ≥ threshold),
    the fifth dedup family next to exact/MinHash/SimHash/n-gram Jaccard.

    The self-join keys on the coarse block column (IVF cell / cluster id):
    with the table partitioned by it on disk the join is partition-local —
    never an all-pairs cross join over the corpus. Norms are computed ONCE
    per row before the join (the per-pair work is just the dot fold), and
    the fold order matches the DuckDB mirror bit-for-bit. For a corpus
    without a trained coarse quantizer, :func:`signlsh_bucket` is the
    drop-in content-derived block key (recall < 1, like any LSH blocking).
    """
    base = ensure_scan_parallelism(embeddings).select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = F.round(
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
    )
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def duckdb_embedding_near_pairs(
    threshold: float = 0.3, table: str = "embeddings"
) -> str:
    cos = duckdb_cosine("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos
FROM {table} a JOIN {table} b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({cos}, 6) >= {threshold}
"""


def signlsh_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k within the query's LSH bucket. Bucketing the stored table by
    this key makes the probe a pruned scan at scale (same shape as ivf_topk
    but content-derived, no training step)."""
    with_bucket = embeddings.withColumn("_bkt", signlsh_bucket(F.col(vec_col)))
    q = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec"), F.col("_bkt").alias("_qbkt")
    )
    scored = (
        with_bucket.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("_bkt") == F.col("_qbkt"))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 6).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
