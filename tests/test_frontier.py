"""Frontier/crawl engine tests: crawl-order + URL-seen equality against the
pure-Python reference oracle, span-sequence equality, politeness quotas,
Bloom/cuckoo invariants, and kill/resume determinism (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from price_crawler_spark.frontier.seen import (
    CuckooShard,
    ShardedBloom,
    dedup_in_batch,
    filter_new,
)
from price_crawler_spark.frontier.wave import CrawlRun
from price_crawler_spark.functions.urls import canonicalize_url

from .oracle_crawler import canonicalize_py, oracle_crawl

QUERIES = ["RTX 4090", "RX 9070"]
WAVE_SECONDS = 10.0


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl"))
    run = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    run.run(max_waves=8)
    return run


@pytest.fixture(scope="module")
def oracle():
    return oracle_crawl(QUERIES, wave_seconds=WAVE_SECONDS, max_waves=8)


def test_canonicalizer_python_mirror(spark):
    urls = [
        "HTTPS://Shop.Example.COM:443//a//b/?utm_source=x&b=2&a=1#frag",
        "http://example.com",
        "https://www.mypc.com.tw/product.php?act=search&keywords=RTX+4090",
        "https://24h.pchome.com.tw/search/?q=RX%209070",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = [r[0] for r in df.select(canonicalize_url("u")).collect()]
    assert got == [canonicalize_py(u) for u in urls]


def test_property_canonicalizer_parity(spark):
    """Engine canonicalizer vs the pure-Python mirror on 400 adversarial
    URL combinations: mixed-case schemes/hosts, default and odd ports,
    doubled slashes, trailing host dots, tracking params, duplicate params,
    fragments, empty paths."""
    import random

    rng = random.Random(13)
    schemes = ["http", "HTTP", "https", "HtTpS", "ftp"]
    hosts = ["Shop.Example.COM", "a.b.c", "X9.example.com.", "localhost"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "//a//b", "/a/b/", "/a.b/c", "/x%20y", "///"]
    qs = ["", "?a=1", "?utm_source=x", "?b=2&a=1&utm_campaign=z&ref=r",
          "?a=1&a=0", "?fbclid=42&z=9"]
    frags = ["", "#f", "#a/b?c=1"]
    cases = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(qs) + rng.choice(frags)
        for _ in range(400)
    ]
    df = spark.createDataFrame([(u,) for u in cases], ["u"])
    got = [r[0] for r in df.select(canonicalize_url("u")).collect()]
    expected = [canonicalize_py(u) for u in cases]
    assert got == expected


def test_canonicalizer_arrow_variant_parity(spark):
    """The Arrow-batch canonicalizer (bench A/B fast path) must emit the
    exact (canonical_url, host) struct of the expression chain on the same
    400 adversarial combinations plus bench-shaped frontier URLs."""
    import random

    from price_crawler_spark.functions.urls import (
        canonicalize_with_host,
        canonicalize_with_host_arrow,
    )

    rng = random.Random(13)
    schemes = ["http", "HTTP", "https", "HtTpS", "ftp"]
    hosts = ["Shop.Example.COM", "a.b.c", "X9.example.com.", "localhost"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "//a//b", "/a/b/", "/a.b/c", "/x%20y", "///"]
    qs = ["", "?a=1", "?utm_source=x", "?b=2&a=1&utm_campaign=z&ref=r",
          "?a=1&a=0", "?fbclid=42&z=9"]
    frags = ["", "#f", "#a/b?c=1"]
    cases = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(qs) + rng.choice(frags)
        for _ in range(400)
    ] + [
        f"https://Shop{i % 64}.example.com/item/{i}?a=1&utm_source=v{i}&b={i % 4}"
        for i in range(100)
    ] + [
        # whitespace padding: ' ' strips in every impl; tab/newline must
        # SURVIVE in every impl (F.trim / DuckDB trim() are space-only —
        # ADVICE r3 arrow-vs-expr drift case)
        "  https://pad.example.com/a?b=1  ",
        "\thttps://pad.example.com/a?b=1\t",
        "\nhttps://pad.example.com/a?b=1\n",
        " \t https://pad.example.com/a ",
    ]
    df = spark.createDataFrame([(u,) for u in cases], ["u"])
    expr_rows = df.select(canonicalize_with_host("u").alias("c")).select(
        "c.canonical_url", "c.host"
    ).collect()
    arrow_rows = df.select(canonicalize_with_host_arrow("u").alias("c")).select(
        "c.canonical_url", "c.host"
    ).collect()
    assert [tuple(r) for r in arrow_rows] == [tuple(r) for r in expr_rows]


def test_crawl_order_matches_reference_oracle(crawl, oracle):
    got = [
        (r["wave"], r["seq_key"], r["doc_id"], r["store"])
        for r in crawl.crawl_order().collect()
    ]
    assert got == oracle["fetch_order"]


def test_url_seen_set_matches_oracle(crawl, oracle, spark):
    frontier = crawl.frontier()
    got = {r[0] for r in frontier.select("canonical_url").distinct().collect()}
    assert got == oracle["seen"]
    # seen table is exactly the enqueued set (no dupes, no misses)
    seen_tbl = crawl.store.read(spark, "seen")
    assert seen_tbl.count() == seen_tbl.distinct().count() == frontier.select("url_hash").distinct().count()


def test_span_sequence_equality(crawl, oracle):
    """Per-row invariant from BASELINE.json input_hint: spans sorted by
    offset must equal the oracle's (kind, text, media_ref, order)."""
    rows = crawl.documents().select("doc_id", "spans").collect()
    assert len(rows) == len(oracle["docs"])
    for r in rows:
        expected = oracle["docs"][r["doc_id"]]
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sorted(r["spans"], key=lambda s: s["offset"])
        ]
        assert got == [tuple(e) for e in expected], r["doc_id"]


def test_blocked_urls(crawl, oracle):
    got = {
        r[0]
        for r in crawl.frontier()
        .filter("status = 'blocked'")
        .select("canonical_url")
        .collect()
    }
    assert got == oracle["blocked"]


def test_politeness_quota_per_wave(crawl, spark):
    """No host exceeds floor(wave_seconds / crawl_delay) fetches per wave
    (isunfar has crawl_delay=2 → quota 5 at wave_seconds=10)."""
    log = crawl.fetch_log()
    quotas = {"www.isunfar.com.tw": 5}
    for r in log.collect():
        q = quotas.get(r["host"], int(WAVE_SECONDS))
        assert r["n_scheduled"] <= q, (r["host"], r["n_scheduled"], q)


def test_retry_semantics(crawl, spark):
    """Transiently-failing URLs end up fetched with attempts>=1; none exceed
    max_retries while still pending."""
    f = crawl.frontier()
    assert f.filter("status = 'pending'").count() == 0
    retried = f.filter("attempts >= 1")
    assert retried.count() > 0  # synthetic web fails ~1/11 first attempts
    assert f.filter("attempts > 3").count() == 0


def test_coolpc_dedup_across_queries(crawl):
    """coolpc's search URL is query-independent → the N queries collapse to
    ONE frontier row (URL-seen dedup, the mega-host case)."""
    n = crawl.frontier().filter("store = 'coolpc' and priority = 0").count()
    assert n == 1


# ---- seen-layer unit tests ---------------------------------------------------

def test_bloom_no_false_negatives(spark):
    bloom = ShardedBloom(n_shards=8, bits_per_shard=1 << 14)
    df = spark.range(0, 500).select(F.xxhash64("id").alias("url_hash"))
    table = bloom.insert(df, None)
    probed = bloom.probe(bloom.with_keys(df), table)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_filter_new_is_exact(spark):
    """filter_new == exact set difference, regardless of Bloom fp-rate
    (tiny bloom forces false positives; anti-join must rescue them)."""
    bloom = ShardedBloom(n_shards=4, bits_per_shard=1 << 8)  # deliberately tiny
    old = spark.range(0, 300).select(F.xxhash64("id").alias("url_hash"))
    table = bloom.insert(old, None)
    cand = spark.range(200, 600).select(
        F.xxhash64("id").alias("url_hash"), F.lpad(F.hex("id"), 8, "0").alias("seq_key")
    )
    new = filter_new(cand, old, table, bloom)
    got = {r[0] for r in new.select("url_hash").collect()}
    expected = {
        r[0]
        for r in spark.range(300, 600).select(F.xxhash64("id")).collect()
    }
    assert got == expected


def test_dedup_in_batch_first_wins(spark):
    df = spark.createDataFrame(
        [(1, "b", "y"), (1, "a", "x"), (2, "c", "z")],
        ["url_hash", "seq_key", "payload"],
    )
    got = {(r["url_hash"], r["payload"]) for r in dedup_in_batch(df).collect()}
    assert got == {(1, "x"), (2, "z")}


def test_cuckoo_insert_contains_delete():
    c = CuckooShard(n_buckets=1 << 10)
    hs = [hash_val * 2654435761 % (1 << 63) for hash_val in range(1, 2000)]
    for h in hs:
        assert c.insert(h)
    assert all(c.contains(h) for h in hs)  # no false negatives
    for h in hs[:500]:
        assert c.delete(h)
    # deleted entries may still "hit" only via fp collisions; re-insert works
    for h in hs[:500]:
        assert c.insert(h)
    assert all(c.contains(h) for h in hs)


def test_cuckoo_serialization_roundtrip():
    c = CuckooShard(n_buckets=1 << 8)
    for h in range(1, 300):
        c.insert(h * 7919)
    c2 = CuckooShard.from_bytes(c.to_bytes(), n_buckets=1 << 8)
    assert all(c2.contains(h * 7919) for h in range(1, 300))


# ---- kill/resume -------------------------------------------------------------

def test_resume_from_checkpoint(spark, tmp_path_factory, oracle):
    """Run 2 waves, abandon the process state, resume with a fresh CrawlRun:
    final state must equal the oracle and committed docs must not be
    re-fetched (no duplicate doc_ids)."""
    root = str(tmp_path_factory.mktemp("resume"))
    run1 = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    run1.run(max_waves=2)
    docs_committed = run1.documents().count()

    run2 = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    assert run2.next_wave() == 2  # picked up from the manifest
    run2.run(max_waves=8)

    got = [
        (r["wave"], r["seq_key"], r["doc_id"], r["store"])
        for r in run2.crawl_order().collect()
    ]
    assert got == oracle["fetch_order"]
    docs = run2.documents()
    assert docs.count() == docs.select("doc_id").distinct().count()
    assert docs.count() >= docs_committed


def test_crash_mid_commit_is_invisible(spark, tmp_path, oracle, monkeypatch):
    """North rule 'resumable from checkpoint', the hard case: a wave that
    dies AFTER its table data is written but BEFORE the manifest swap must
    leave the store at the previous snapshot (orphan data unreferenced), and
    a resume must re-run the wave idempotently to the oracle state."""
    import price_crawler_spark.sources.store as store_mod

    root = str(tmp_path)
    run1 = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    run1.run(max_waves=1)
    snap_before = run1.store.current()["id"]
    docs_before = run1.documents().count()

    real_replace = store_mod.os.replace
    state = {"crashed": False}

    def crash_on_manifest(src, dst):
        if dst.endswith("manifest.json") and dst.startswith(root) and not state["crashed"]:
            state["crashed"] = True
            raise OSError("simulated crash before manifest swap")
        return real_replace(src, dst)

    monkeypatch.setattr(store_mod.os, "replace", crash_on_manifest)
    run2 = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    with pytest.raises(OSError):
        run2.run_wave()
    monkeypatch.setattr(store_mod.os, "replace", real_replace)
    assert state["crashed"]

    # the failed wave is invisible: same snapshot, same committed docs
    probe = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    assert probe.store.current()["id"] == snap_before
    assert probe.documents().count() == docs_before

    # resume replays the wave idempotently to the oracle terminal state
    run3 = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    run3.run(max_waves=8)
    got = [
        (r["wave"], r["seq_key"], r["doc_id"], r["store"])
        for r in run3.crawl_order().collect()
    ]
    assert got == oracle["fetch_order"]
    docs = run3.documents()
    assert docs.count() == docs.select("doc_id").distinct().count()


def test_robots_txt_parser(spark):
    """J5: robots.txt subset parsing — group matching, wildcard fallback,
    crawl-delay, comments, empty disallow."""
    from price_crawler_spark.frontier.politeness import schedule_wave
    from price_crawler_spark.frontier.robots import parse_robots_txt, robots_dim

    body = """
# comment line
User-agent: GoogleBot
Disallow: /google-only

User-agent: *
Disallow: /private
Disallow: /tmp
Allow: /private/ok
Crawl-delay: 2.5

User-agent: EvilBot
Disallow: /
"""
    generic = parse_robots_txt(body, "*")
    assert generic["deny"] == ["/private", "/tmp"]
    assert generic["allow"] == ["/private/ok"]
    assert generic["crawl_delay"] == 2.5
    assert parse_robots_txt(body, "EvilBot/1.0")["deny"] == ["/"]
    assert parse_robots_txt(body, "GoogleBot")["deny"] == ["/google-only"]
    # empty disallow in a group = allow all
    assert parse_robots_txt("User-agent: *\nDisallow:\n", "*")["deny"] == []

    # dim flows into the scheduler: /private urls blocked, delay honored
    dim = robots_dim(spark, {"shop.example.com": body})
    pending = spark.createDataFrame(
        [
            ("u1", "https://shop.example.com/private/x", 1, "shop.example.com",
             "s", 0, 0, 0, "pending", 1),
            ("u2", "https://shop.example.com/item/1", 2, "shop.example.com",
             "s", 0, 0, 0, "pending", 2),
            ("u3", "https://shop.example.com/private/ok/page", 3,
             "shop.example.com", "s", 0, 0, 0, "pending", 3),
        ],
        "url string, canonical_url string, url_hash long, host string, "
        "store string, priority int, attempts int, wave int, status string, "
        "seq_key long",
    )
    scheduled, deferred, blocked = schedule_wave(pending, dim, wave_seconds=10)
    assert [r.url for r in blocked.collect()] == ["u1"]
    sched = sorted(scheduled.collect(), key=lambda r: r.seq_key)
    # u3 survives: Allow /private/ok (longer match) overrides Disallow /private
    assert [r.url for r in sched] == ["u2", "u3"]
    assert sched[0].crawl_delay == 2.5


def test_two_phase_schedule_equals_single_phase(spark):
    """C6: salted two-phase scheduling selects the IDENTICAL set as the
    naive per-host rank, and defers everything else."""
    import random

    from price_crawler_spark.frontier.politeness import schedule_wave
    from price_crawler_spark.schemas import ROBOTS_SCHEMA

    rng = random.Random(11)
    rows = []
    for i in range(400):
        host = "mega.example.com" if i % 2 == 0 else f"s{i % 7}.example.com"
        rows.append(
            (f"u{i}", f"https://{host}/p/{i}", rng.getrandbits(40), host,
             "s", rng.randint(0, 5), 0, 0, "pending", i)
        )
    pending = spark.createDataFrame(
        rows,
        "url string, canonical_url string, url_hash long, host string, "
        "store string, priority int, attempts int, wave int, status string, "
        "seq_key long",
    )
    robots = spark.createDataFrame(
        [("mega.example.com", None, None, 1.0)], ROBOTS_SCHEMA
    )
    s1, d1, _ = schedule_wave(pending, robots, wave_seconds=10)
    s2, d2, _ = schedule_wave(
        pending, robots, wave_seconds=10, mega_hosts=["mega.example.com"]
    )
    sel1 = sorted(r.url for r in s1.collect())
    sel2 = sorted(r.url for r in s2.collect())
    assert sel1 == sel2 and len(sel1) > 0
    assert sorted(r.url for r in d1.collect()) == sorted(r.url for r in d2.collect())


def test_sharded_cuckoo_insert_delete_probe(spark):
    """Distributed cuckoo seen-layer: insert → all maybe_seen; delete half →
    deleted hashes drop out (modulo fp collisions, only FEWER hits allowed,
    never false negatives on the kept half); deterministic across
    partitionings."""
    from price_crawler_spark.frontier.seen import ShardedCuckoo

    ck = ShardedCuckoo(n_shards=8, n_buckets=1 << 10)
    df = spark.range(0, 400).select(F.xxhash64("id").alias("url_hash"))
    table = ck.insert(df, None)
    probed = ck.probe(ck.with_keys(df), table)
    assert probed.filter(~F.col("maybe_seen")).count() == 0

    gone = spark.range(0, 200).select(F.xxhash64("id").alias("url_hash"))
    kept = spark.range(200, 400).select(F.xxhash64("id").alias("url_hash"))
    table2 = ck.delete(gone, table)
    kept_probe = ck.probe(ck.with_keys(kept), table2)
    assert kept_probe.filter(~F.col("maybe_seen")).count() == 0  # no false neg
    gone_probe = ck.probe(ck.with_keys(gone), table2)
    # the overwhelming majority of deleted hashes must now miss
    assert gone_probe.filter(F.col("maybe_seen")).count() < 10

    # determinism: same table bytes under different input partitioning
    t_a = sorted((r.shard, bytes(r.bits)) for r in ck.insert(df, None).collect())
    t_b = sorted(
        (r.shard, bytes(r.bits))
        for r in ck.insert(df.repartition(13), None).collect()
    )
    assert t_a == t_b


def test_live_transport_seam_mocked_session():
    """S1/S2/C4/C5 live-path semantics without network (base_scraper.py:60-95
    parity): retry count, backoff bounds, UA header, timeout param, the
    utf-8→big5→gb2312→ignore decode chain, and non-200 retry."""
    from price_crawler_spark.frontier.fetch import (
        DEFAULT_HEADERS,
        decode_body,
        live_fetch_url,
        ua_for_url_py,
    )

    class Resp:
        def __init__(self, status_code, content=b""):
            self.status_code = status_code
            self.content = content

    class MockSession:
        def __init__(self, script):
            self.script = list(script)  # each item: Resp or Exception
            self.calls = []

        def get(self, url, headers=None, timeout=None):
            self.calls.append({"url": url, "headers": headers, "timeout": timeout})
            nxt = self.script.pop(0)
            if isinstance(nxt, Exception):
                raise nxt
            return nxt

    sleeps = []

    # 200 first try: one call, UA + default headers + timeout forwarded
    s = MockSession([Resp(200, "現貨 NT$1,234".encode("utf-8"))])
    body = live_fetch_url(s, "https://shop.example/p?id=1", sleep=sleeps.append)
    assert body == "現貨 NT$1,234"
    assert len(s.calls) == 1 and not sleeps
    call = s.calls[0]
    assert call["timeout"] == 15.0  # C5 (config.py:18)
    assert call["headers"]["User-Agent"] == ua_for_url_py("https://shop.example/p?id=1")
    for k, v in DEFAULT_HEADERS.items():
        assert call["headers"][k] == v

    # exception then 200: exactly MAX_RETRIES=2 attempts, one backoff sleep
    # inside uniform(1, 2*REQUEST_DELAY) bounds (base_scraper.py:67-70)
    s = MockSession([ConnectionError("boom"), Resp(200, b"ok")])
    body = live_fetch_url(
        s, "https://shop.example/p?id=2",
        sleep=sleeps.append, rand_uniform=lambda a, b: (a + b) / 2,
    )
    assert body == "ok" and len(s.calls) == 2
    assert sleeps == [(1 + 2.0) / 2]

    # persistent failure: None after MAX_RETRIES, never a third call
    s = MockSession([ConnectionError("a"), ConnectionError("b"), Resp(200, b"no")])
    assert live_fetch_url(s, "https://x/1", sleep=lambda _t: None) is None
    assert len(s.calls) == 2

    # non-200 retries too, then succeeds
    s = MockSession([Resp(503), Resp(200, b"late ok")])
    assert live_fetch_url(s, "https://x/2", sleep=lambda _t: None) == "late ok"

    # encoding chain: big5 bytes that are invalid utf-8
    big5 = "現貨供應中".encode("big5")
    assert decode_body(big5) == "現貨供應中"
    assert decode_body("已售完".encode("utf-8")) == "已售完"
    assert decode_body(b"\xff\xfe\xfd") == b"\xff\xfe\xfd".decode("utf-8", "ignore")


def test_live_transport_env_gate(spark, tmp_path):
    """PCS_LIVE_TRANSPORT=0/absent keeps the synthetic transport: the fetch
    stage never imports requests (absent in this sandbox) and produces the
    synthetic spans."""
    import os

    from price_crawler_spark.frontier.fetch import LIVE_TRANSPORT_ENV

    assert os.environ.get(LIVE_TRANSPORT_ENV) != "1"
    # the standard frontier tests above already exercise fetch_scheduled on
    # the synthetic path; this pins the gate's default


def test_cuckoo_crawl_invalidate_refetch_cycle(spark, tmp_path_factory, oracle):
    """End-to-end cuckoo seen-filter (VERDICT r4 item 3): a full crawl gated
    by the deletion-capable ShardedCuckoo reproduces the Bloom run's
    goldens; invalidate() then deletes one fetched URL from the filter +
    exact seen set, re-enqueues it, and the next wave re-fetches it EXACTLY
    once — identical spans (deterministic web), every other document
    untouched, and the URL-seen set restored so later re-discoveries dedup
    again."""
    root = str(tmp_path_factory.mktemp("cuckoo_e2e"))
    run = CrawlRun(
        spark, root, QUERIES, wave_seconds=WAVE_SECONDS, seen_filter="cuckoo"
    )
    run.run(max_waves=8)
    got = [
        (r["wave"], r["seq_key"], r["doc_id"], r["store"])
        for r in run.crawl_order().collect()
    ]
    assert got == oracle["fetch_order"]  # cuckoo-gated run == Bloom goldens

    docs_before = run.documents().count()
    target = (
        run.frontier()
        .filter("status = 'fetched' and store = 'pchome'")
        .orderBy("seq_key")
        .first()
    )
    assert run.invalidate([target["url"]]) == 1
    # the row is live again: back in pending, gone from the terminal log
    assert (
        run.store.read(spark, "pending")
        .filter(F.col("url_hash") == target["url_hash"])
        .count()
        == 1
    )
    assert (
        run.store.read(spark, "frontier_log")
        .filter(F.col("url_hash") == target["url_hash"])
        .count()
        == 0
    )
    assert run.run(max_waves=4) >= 1

    docs = run.documents()
    dup = docs.filter(F.col("doc_id") == target["canonical_url"])
    assert dup.count() == 2  # exactly one re-fetch
    spans = [
        sorted((s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"])
        for r in dup.select("spans").collect()
    ]
    assert spans[0] == spans[1]  # deterministic re-crawl snapshot
    assert docs.count() == docs_before + 1  # nothing else re-fetched
    assert docs.select("doc_id").distinct().count() == docs_before

    # seen set restored exactly (the re-enqueue path re-added the hash once)
    seen_tbl = run.store.read(spark, "seen")
    assert seen_tbl.count() == seen_tbl.distinct().count()
    assert seen_tbl.filter(F.col("url_hash") == target["url_hash"]).count() == 1
    # terminal log holds the URL again, frontier drained
    assert run.frontier().filter("status = 'pending'").count() == 0
    # a second invalidate of a never-fetched URL is a no-op
    assert run.invalidate(["https://nowhere.example.com/x"]) == 0


def test_bloom_run_rejects_invalidate(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloominv"))
    run = CrawlRun(spark, root, QUERIES, wave_seconds=WAVE_SECONDS)
    run.run(max_waves=1)
    with pytest.raises(ValueError, match="cuckoo"):
        run.invalidate(["https://x.example.com/1"])


def test_pending_drains_under_persistent_failure(spark, tmp_path_factory):
    """VERDICT r4 item 6: a host that fails 100% of fetches must not cycle
    in pending forever — its rows exit to frontier_log as 'failed' after
    exactly max_retries+1 attempts, the run drains, and the fetch_log's
    pending_size lineage column records the drain."""
    from price_crawler_spark.frontier.seeds import STORE_HOST

    host = STORE_HOST["sunfar"]
    root = str(tmp_path_factory.mktemp("deadhost"))
    run = CrawlRun(
        spark, root, QUERIES, wave_seconds=WAVE_SECONDS, fail_hosts=[host]
    )
    waves = run.run(max_waves=12)
    assert waves < 12  # drained, not stuck

    f = run.frontier()
    assert f.filter("status = 'pending'").count() == 0
    dead = f.filter(F.col("host") == host)
    n_dead = dead.count()
    assert n_dead > 0
    assert dead.filter("status != 'failed'").count() == 0
    # max_retries=2 → every dead-host URL attempted exactly 3 times
    assert dead.filter("attempts != 3").count() == 0
    log = run.fetch_log().toPandas()
    assert log[log.host == host].n_scheduled.sum() == 3 * n_dead
    assert (log[log.host == host].n_ok == 0).all()

    # pending_size: stamped every wave, and the tail drains below the peak
    per_wave = log.groupby("wave").pending_size.max().sort_index()
    assert len(per_wave) == waves
    assert (per_wave > 0).all()
    assert per_wave.iloc[-1] < per_wave.max()


def test_frontier_commit_is_delta_not_full_rewrite(crawl, spark):
    """100 TB write-path invariant (r4): each wave REPLACES only the bounded
    pending table (manifest holds exactly one file group for it) and
    APPENDS terminal rows to frontier_log (≤ one group per wave, never
    rewritten — every group path recorded in an earlier snapshot must
    still be listed verbatim in the latest one). The union view stays
    status-consistent: pending holds only 'pending' rows, the log only
    terminal ones, with no url_hash overlap."""
    manifest = crawl.store._read_manifest()
    snaps = manifest["snapshots"]
    latest = snaps[-1]["tables"]
    assert len(latest["pending"]) == 1  # replaced, not accumulated
    assert 1 <= len(latest["frontier_log"]) <= len(snaps) - 1
    for snap in snaps:
        prior = snap["tables"].get("frontier_log", [])
        assert latest["frontier_log"][: len(prior)] == prior  # append-only

    pending = crawl.store.read(spark, "pending")
    log = crawl.store.read(spark, "frontier_log")
    assert pending.filter("status != 'pending'").count() == 0
    assert log.filter("status = 'pending'").count() == 0
    assert (
        pending.select("url_hash").intersect(log.select("url_hash")).count() == 0
    )
