"""Deduplication operators for the document layer.

Four families, each scale-shaped for a 100 TB corpus:

  * exact_dedup        — md5 fingerprint group-by; one shuffle on the hash,
                         map-side partial agg for the copy counts.
  * MinHash + LSH      — shingle → per-permutation minhash (md5-keyed, so the
                         signature is engine-independent) → banded bucket
                         join. Only documents sharing a band bucket are ever
                         paired, so the candidate set is ~linear in corpus
                         size instead of O(n²); exact Jaccard verifies the
                         candidates.
  * SimHash            — 32-bit signature via token-md5 nibble votes; near-dup
                         pairs found by 8-bit chunk banding (Hamming ≤ 3 ⇒ at
                         least one of 4 chunks matches exactly — pigeonhole).
  * blocked n-gram Jaccard — exact Jaccard restricted to cheap blocking keys
                         (source, length band): the quadratic fallback, kept
                         honest by blocking.

Every operator has a DuckDB SQL mirror (``duckdb_*``) used by the oracle
harness; hashing is md5-based end-to-end because md5 is bit-identical across
Spark, DuckDB, and Python (Spark's xxhash64 seed differs from DuckDB's hash).

Cache contract: ``minhash_lsh_pairs`` and ``blocked_jaccard_pairs`` persist
their signature/shingle tables because the returned plan scans them twice
(band join + verify). The cache lives until the CALLER releases it —
``spark.catalog.clearCache()`` after materializing the result (the bench
harness does this between queries); a long-lived service should scope each
invocation the same way.
The frontier URL-seen path (price_crawler_spark.frontier.seen) keeps
xxhash64 — there the key only has to be stable *within* Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from price_crawler_spark.functions.text import shingles
from price_crawler_spark.plans.partitioning import ensure_scan_parallelism

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalized_fingerprint(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (fingerprint, keeper, n_copies) with the
    smallest id as keeper (first-wins, deterministic under any partitioning).
    One hash-shuffle; min/count are map-side combinable."""
    return (
        docs.select(
            normalized_fingerprint(text_col).alias("fingerprint"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("fingerprint")
        .agg(F.min("_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


def drop_exact_dupes(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep only the first (min id) row of each fingerprint group."""
    w = Window.partitionBy(normalized_fingerprint(text_col)).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duckdb_exact_dedup(table: str = "documents") -> str:
    fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    return (
        f"SELECT {fp} AS fingerprint, min(doc_id) AS keeper, "
        f"count(*) AS n_copies FROM {table} GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
#
# Hashing scheme (engine-portable, one md5 per shingle):
#   md5(shingle) hex → h1 = hex[0:12] as int48, h2 = hex[12:24] as int48
#   permutation i:  g_i(s) = h1 + i*h2   (Broder double-hashing family)
# 48-bit halves keep h1 + 15*h2 < 2^53: no int64 overflow anywhere (DuckDB
# raises on BIGINT overflow where Spark wraps — staying under 2^53 keeps the
# two engines bit-identical). 16 md5s/shingle → 1 md5 + 16 mul-adds: ~5×
# cheaper at the 100 TB hot path.


def _hex_int(h: Column, start: int, length: int = 12) -> Column:
    return F.conv(F.substring(h, start, length), 16, 10).cast("long")


_M48 = 1 << 48  # 48-bit hash range: h1 + 15*h2 < 2^53, no ANSI long overflow


def fast_shingle_hash(s: Column) -> Column:
    """int48 shingle hash, JVM-native (xxhash64 ≫ md5 throughput per byte).
    A fully string-free rolling variant (token hashes combined via
    element_at) was measured SLOWER here — higher-order-function lambdas
    evaluate interpreted with per-element boxing, which costs more than the
    shingle-string md5 it avoids — so the fast family keeps the string
    shingles and swaps only the hash."""
    return F.pmod(F.xxhash64(s), F.lit(_M48))


def _minhash_sig(hh: Column, num_hashes: int) -> Column:
    """Array of ``num_hashes`` int64 minhash values from the per-shingle
    (h1, h2) struct array ``hh``. The struct is materialized ONCE before the
    16 permutation scans — conv() is string-based and slow, and Catalyst
    does not CSE it across the separate array_min expressions (measured 13s
    → 0.9s for 5k docs at sf0.1)."""

    def _perm(i: int) -> Column:
        return F.array_min(
            F.transform(hh, lambda x: x.getField("h1") + F.lit(i) * x.getField("h2"))
        )

    return F.array(*[_perm(i) for i in range(num_hashes)])


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    family: str = "portable",
) -> DataFrame:
    """(id, shh, sig) for docs with ≥1 shingle (shorter docs can't be
    near-dup candidates at shingle size k). ``shh`` is the int-hashed
    distinct shingle set — the exact-Jaccard verifier compares int64 arrays,
    not 30-char strings (smaller shuffle, cheaper intersect).

    ``family``: 'portable' = md5-derived 48-bit halves, bit-reproducible in
    DuckDB/Python (the oracle-checked variant); 'fast' = seeded xxhash64
    halves, JVM-native (no engine-portable mirror — the production choice
    when oracle replay isn't required)."""
    sh = F.array_distinct(shingles(text_col, k))
    base = ensure_scan_parallelism(docs).select(
        F.col(id_col).alias("id"), sh.alias("sh")
    ).filter(F.size("sh") > 0)
    if family == "fast":
        hh = F.transform(
            F.col("sh"),
            lambda s: F.struct(
                fast_shingle_hash(s).alias("h1"),
                F.pmod(F.xxhash64(s, F.lit(1)), F.lit(_M48)).alias("h2"),
            ),
        )
    else:
        hh = F.transform(
            F.col("sh"),
            lambda s: F.struct(
                _hex_int(F.md5(s), 1).alias("h1"),
                _hex_int(F.md5(s), 13).alias("h2"),
            ),
        )
    base = base.withColumn("hh", hh).drop("sh")
    shh = F.array_distinct(
        F.transform(F.col("hh"), lambda x: x.getField("h1"))
    )
    return (
        base.withColumn("shh", shh)
        .withColumn("sig", _minhash_sig(F.col("hh"), num_hashes))
        .drop("hh")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
    family: str = "portable",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold) via banded LSH.

    rows-per-band r = num_hashes/bands; a pair collides in a band iff that
    band's minhash slice matches exactly, P ≈ 1-(1-j^r)^bands. Candidates are
    verified with exact Jaccard on the hashed shingle sets, so false
    positives cost only the verify, never wrong output. The band join
    shuffles on (band, key) — ~uniform since the key derives from md5; no
    O(n²) stage anywhere.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, k, num_hashes, family)

    def _band_key(b: int) -> Column:
        # One int64 per (band, slice): xxhash64 over the band index + the
        # r-value signature slice. A hash collision can only MERGE buckets —
        # extra candidates the exact-Jaccard verify rejects — never lose a
        # true candidate, so verified output is identical to exact string
        # keys while the banded shuffle row shrinks to (id, key) = 16 B.
        return F.xxhash64(F.lit(b), F.slice("sig", b * r + 1, r))

    # The band self-join runs on skinny (id, key) rows — shuffling the
    # shingle arrays through the join would move ~50× more bytes. Arrays are
    # joined back per UNIQUE candidate pair from the (small) signature table.
    sigs = sigs.persist()
    band_arr = F.array(*[_band_key(b) for b in range(bands)])
    banded = sigs.select("id", F.explode(band_arr).alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # no broadcast hint: AQE broadcasts the set side while it fits (it does
    # at every test SF); at billions of docs both sides are big and the
    # planner correctly falls back to a shuffled hash join on id.
    sets = sigs.select("id", "shh")
    paired = cand.join(
        sets.select(F.col("id").alias("id_a"), F.col("shh").alias("sh_a")), "id_a"
    ).join(
        sets.select(F.col("id").alias("id_b"), F.col("shh").alias("sh_b")), "id_b"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    return (
        paired.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duckdb_minhash_lsh_pairs(
    table: str = "documents",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.2,
) -> str:
    """DuckDB mirror of :func:`minhash_lsh_pairs` (same hash family, bands)."""
    r = num_hashes // bands
    h1 = "('0x' || substr(h, 1, 12))::BIGINT"
    h2 = "('0x' || substr(h, 13, 12))::BIGINT"
    mins = ", ".join(
        f"list_min(list_transform(hx, h -> {h1} + {i} * {h2}))"
        for i in range(num_hashes)
    )
    band_keys = ", ".join(
        f"array_to_string(list_transform(sig[{b * r + 1}:{b * r + r}],"
        " x -> x::VARCHAR), '|')"
        for b in range(bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM {table}
), sh0 AS (
  SELECT id, CASE WHEN len(t) >= {k} THEN
      list_transform(range(1, len(t) - {k} + 2),
                     i -> array_to_string(t[i:i+{k - 1}], ' '))
    ELSE [] END AS shr
  FROM toks
), shs AS (
  SELECT id, list_transform(list_distinct(shr), s -> md5(s)) AS hx
  FROM sh0 WHERE len(shr) > 0
), hashed AS (
  SELECT id, list_distinct(list_transform(hx, h -> {h1})) AS shh,
         [{mins}] AS sig
  FROM shs
), banded AS (
  SELECT id, shh, unnest(range(0, {bands})) AS band,
         unnest([{band_keys}]) AS key
  FROM hashed
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
), verified AS (
  SELECT c.id_a, c.id_b,
         round(len(list_intersect(sa.shh, sb.shh))::DOUBLE /
               len(list_distinct(list_concat(sa.shh, sb.shh))), 6) AS jaccard
  FROM cand c
  JOIN hashed sa ON sa.id = c.id_a
  JOIN hashed sb ON sb.id = c.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"
SIMHASH_BITS = 32


def _nibble_bit_sql_duckdb(h: str, bit: int) -> str:
    """bit ``bit`` (0 = MSB) of md5-hex column ``h`` in DuckDB SQL."""
    nib = f"(strpos('{_HEX}', substr({h}, {bit // 4 + 1}, 1)) - 1)"
    shift = 3 - (bit % 4)
    return f"(({nib} // {2 ** shift}) % 2)"


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash BIGINT): 32-bit simhash over whitespace tokens (with
    multiplicity). Bit b is set iff the sum over tokens of ±1 (by bit b of
    md5(token)) is ≥ 0. One explode + one groupBy — the aggregation is 32
    map-side-combinable sums, so the shuffle carries 32 ints per doc.

    NO ensure_scan_parallelism here (unlike minhash/ngram/ANN): attributing
    the r3 dedup_simhash bench regression, a guard-on/off A/B at sf0.1
    (quiet box, warm median-of-5) measured 1.755 s vs 1.505 s — simhash's
    pre-shuffle map (one md5 per token, 32 arithmetic bit votes) is cheap
    enough that the guard's repartition costs more than the single-split
    serialization it avoids; the groupBy right after re-parallelizes
    anyway. minhash (16 permutations/shingle) and the vector pipelines
    measured the opposite, so they keep it. Numbers in BASELINE.md."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    ex = docs.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    ).withColumn("h", F.md5("tok"))

    def bit(b: int) -> Column:
        nib = (
            F.instr(F.lit(_HEX), F.substring("h", b // 4 + 1, 1)) - 1
        )
        return F.floor(nib / (2 ** (3 - (b % 4)))) % 2

    votes = [
        F.sum(F.when(bit(b) == 1, 1).otherwise(-1)).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = ex.groupBy("id").agg(*votes)
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") >= 0, F.lit(2 ** (SIMHASH_BITS - 1 - b))).otherwise(
            F.lit(0)
        )
        sim = term if sim is None else sim + term
    return agg.select("id", sim.cast("long").alias("simhash"))


def duckdb_simhash(table: str = "documents") -> str:
    bits = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"sum(CASE WHEN {_nibble_bit_sql_duckdb('h', b)} = 1 "
            f"THEN 1 ELSE -1 END)"
        )
        bits.append(
            f"(CASE WHEN {vote} >= 0 THEN {2 ** (SIMHASH_BITS - 1 - b)} ELSE 0 END)"
        )
    total = " + ".join(bits)
    return f"""
WITH ex AS (
  SELECT doc_id AS id,
         md5(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS h
  FROM {table}
)
SELECT id, CAST({total} AS BIGINT) AS simhash FROM ex GROUP BY id
"""


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: 8-bit chunk banding (Hamming ≤ 3 over 4
    chunks ⇒ some chunk equal) then exact Hamming verify via bit_count(xor).
    """
    sims = simhash(docs)
    chunks = F.array(
        *[
            F.shiftright("simhash", c * 8).bitwiseAND(F.lit(255))
            for c in range(4)
        ]
    )
    banded = sims.select(
        "id", "simhash", F.posexplode(chunks).alias("chunk", "val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# blocked n-gram Jaccard (exact, quadratic within blocks only)
# ---------------------------------------------------------------------------

def blocked_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("source",),
    k: int = 3,
    top_n: int = 20,
    family: str = "portable",
) -> DataFrame:
    """Exact k-gram Jaccard over overlapping pairs sharing a blocking key;
    global top-N by (jaccard desc, id_a, id_b) — fully deterministic.

    Inverted-index formulation: explode (block, shingle_hash, id), self-join
    on (block, shingle) and COUNT co-occurrences per pair — that computes
    |A∩B| touching only the shingles two docs actually share, instead of
    O(|A|+|B|) per pair with array_intersect (17s → ~2s at sf0.1, and the
    co-occurrence count is the formulation that survives a 100 TB corpus:
    every stage is an equi-join/agg with map-side combine, no arrays ever
    cross a shuffle). |A∪B| = |A|+|B|-|A∩B| since shingle sets are distinct.
    Pairs with zero overlap have jaccard 0 and are never near-dups; they are
    excluded by construction."""
    if family == "fast":
        sh = F.array_distinct(
            F.transform(shingles(text_col, k), fast_shingle_hash)
        )
    else:
        sh = F.array_distinct(
            F.transform(shingles(text_col, k), lambda s: _hex_int(F.md5(s), 1))
        )
    base = ensure_scan_parallelism(docs).select(
        F.col(id_col).alias("id"), *block_cols, sh.alias("sh")
    ).filter(F.size("sh") > 0).persist()

    sizes = base.select("id", F.size("sh").alias("sz"))
    ex = base.select("id", *block_cols, F.explode("sh").alias("shg"))
    a, b = ex.alias("a"), ex.alias("b")
    cond = (F.col("a.shg") == F.col("b.shg")) & (F.col("a.id") < F.col("b.id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    co = (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    pairs = (
        co.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sa")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("c") / (F.col("sa") + F.col("sb") - F.col("c")), 6).alias("jaccard"),
        )
    )
    # Global top-N via orderBy().limit(): Spark plans TakeOrderedAndProject
    # (per-partition heap top-N + driver merge). The candidate-pair set is
    # unbounded at corpus scale, so a single-partition row_number window here
    # would be a scale-killer; this shape never shuffles-to-one.
    return pairs.orderBy(F.desc("jaccard"), F.asc("id_a"), F.asc("id_b")).limit(
        top_n
    )


def duckdb_blocked_jaccard_pairs(
    table: str = "documents", k: int = 3, top_n: int = 20
) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS id, source,
         regexp_split_to_array(trim(text), '\\s+') AS t
  FROM {table}
), shs AS (
  SELECT id, source, list_distinct(
    list_transform(range(1, len(t) - {k} + 2),
                   i -> ('0x' || substr(md5(array_to_string(t[i:i+{k - 1}], ' ')), 1, 12))::BIGINT)) AS sh
  FROM toks WHERE len(t) >= {k}
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
               len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
  FROM shs a JOIN shs b ON a.source = b.source AND a.id < b.id
)
SELECT id_a, id_b, jaccard FROM pairs
WHERE jaccard > 0
ORDER BY jaccard DESC, id_a, id_b LIMIT {top_n}
"""
