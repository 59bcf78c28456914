"""Span-extraction operator tests (SURVEY.md §2.2): each store archetype's
documents → products projection, checked against the synthetic catalog's
ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from price_crawler_spark.operators import predicates as P
from price_crawler_spark.operators.extraction import (
    card_products,
    coolpc_products,
    extract_products,
    sapphire_pixel_products,
    sinya_products,
    sunfar_products,
)
from price_crawler_spark.schemas import DOCUMENTS_SCHEMA
from price_crawler_spark.sources import synthetic as syn


def _docs_df(spark, store: str, url: str, seq_key: str = "00000000"):
    page = syn.synthesize_page(store, url)
    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for k, t, m, o in page["spans"]
    ]
    return spark.createDataFrame(
        [(url, spans, store, 0, 0)], DOCUMENTS_SCHEMA
    ).withColumn("seq_key", F.lit(seq_key))


def test_coolpc_extraction(spark):
    df = _docs_df(spark, "coolpc", "https://www.coolpc.com.tw/evaluate.php")
    rows = coolpc_products(df).orderBy("seq").collect()
    assert len(rows) == len(syn.CATALOG)
    for r, (name, base, _specs) in zip(rows, syn.CATALOG):
        assert r["price"] == float(int(syn.store_price("coolpc", name, base)))
        assert r["in_stock"] is True
        assert r["currency"] == "TWD"
    # Reference-faithful quirk: the mojibake fix map replaces literal 'AM'
    # with '專案' (coolpc.py:195), so 'AMD Ryzen ...' names get 專案-tagged
    # and the bundle detector (D7) then fires on them — parity preserved.
    for r, (name, _b, _s) in zip(rows, syn.CATALOG):
        assert r["is_bundle"] == ("AM" in name), (r["product_name"], name)


def test_card_extraction_pchome(spark):
    url = "https://24h.pchome.com.tw/search/?q=RTX%204090"
    df = _docs_df(spark, "pchome", url)
    rows = card_products(df).orderBy("seq").collect()
    expected = syn.catalog_matches("pchome", "RTX 4090")
    assert len(rows) == len(expected)
    for r, (name, price, _specs, in_stock) in zip(rows, expected):
        assert r["product_name"] == name
        assert r["price"] == float(int(price))  # NT$x,xxx text roundtrip
        assert r["in_stock"] == in_stock
        assert r["url"] == syn.detail_url("pchome", name)
        assert r["image_url"] == syn.image_url("pchome", name)


def test_sinya_json_extraction(spark):
    url = "https://www.sinya.com.tw/search/0?keyword=RX+9070"
    df = _docs_df(spark, "sinya", url)
    rows = sinya_products(df, with_state=True).orderBy("seq").collect()
    expected = syn.catalog_matches("sinya", "RX 9070")
    assert [r["product_name"] for r in rows] == [e[0] for e in expected]
    for r, (name, price, _s, in_stock) in zip(rows, expected):
        assert r["price"] == float(int(price))
        if syn.sinya_stock_known(name):
            assert r["in_stock"] == in_stock
            assert r["stock_state"] == ("有庫存" if in_stock else "缺貨")
        else:
            # search page alone can't decide — D4 default state, not in stock
            # until the detail-page escalation (S4) resolves it
            assert r["stock_state"] == "需確認庫存"
            assert r["in_stock"] is False


def test_sunfar_json_extraction_and_dedup(spark):
    url = "https://www.isunfar.com.tw/product/search.aspx?b=undefined&keyword=RTX%204090"
    df = _docs_df(spark, "sunfar", url)
    rows = sunfar_products(df).orderBy("seq").collect()
    expected = syn.catalog_matches("sunfar", "RTX 4090")
    assert len(rows) == len(expected)
    for r, (name, price, specs, in_stock) in zip(rows, expected):
        assert r["product_name"] == name
        assert r["specifications"] == specs
        assert "proddetail.aspx?id=" in r["url"]
        assert r["in_stock"] == in_stock
    # J2: duplicating the doc must not duplicate products (same ids)
    dup = df.unionByName(df.withColumn("doc_id", F.concat("doc_id", F.lit("#2"))))
    assert sunfar_products(dup).count() == len(expected)


def test_sapphire_pixel_mining(spark):
    url = "https://sapphiretech.cyberbiz.co/search?q=RTX+4090"
    df = _docs_df(spark, "sapphire", url)
    rows = sapphire_pixel_products(df).orderBy("seq").collect()
    expected = syn.catalog_matches("sapphire", "RTX 4090")
    assert len(rows) == len(expected)
    for r, (name, price, _s, in_stock) in zip(rows, expected):
        assert r["product_name"].startswith("藍寶石產品 #")
        assert r["price"] == pytest.approx(price)
        assert r["in_stock"] == in_stock


def test_unified_products_view(spark):
    dfs = [
        _docs_df(spark, "coolpc", "https://www.coolpc.com.tw/evaluate.php", "00"),
        _docs_df(spark, "pchome", "https://24h.pchome.com.tw/search/?q=RTX%204090", "01"),
        _docs_df(spark, "sinya", "https://www.sinya.com.tw/search/0?keyword=RTX+4090", "02"),
        _docs_df(spark, "sunfar", "https://www.isunfar.com.tw/product/search.aspx?keyword=RTX%204090", "03"),
    ]
    docs = dfs[0]
    for d in dfs[1:]:
        docs = docs.unionByName(d)
    products = extract_products(docs)
    by_store = {
        r["store"]: r["n"]
        for r in products.groupBy("store").agg(F.count("*").alias("n")).collect()
    }
    assert by_store["coolpc"] == len(syn.CATALOG)
    n_match = len(syn.catalog_matches("pchome", "RTX 4090"))
    assert by_store["pchome"] == n_match
    assert by_store["sinya"] == n_match
    assert by_store["sunfar"] == n_match


# ---- predicates ---------------------------------------------------------------

def _flags(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[0] for r in df.select(fn(F.col("s")).alias("v")).collect()]


def test_stock_heuristics(spark):
    assert _flags(
        spark,
        P.is_in_stock,
        ["現貨供應", "已售完", "sold out", "", "24h到貨", "暫無庫存"],
    ) == [True, False, False, False, True, False]
    assert _flags(
        spark,
        P.dtsource_in_stock,
        ["RTX 4090 現貨", "RTX 4090 (已售完 請勿下單)", "GPU（缺貨中）"],
    ) == [True, False, False]


def test_bundle_detectors(spark):
    assert _flags(
        spark,
        P.coolpc_is_bundle,
        ["RTX 5080 [需搭配B760]", "RTX 5080 16GB", "i7 CPU合購"],
    ) == [True, False, True]
    assert _flags(
        spark,
        P.pchome_is_bundle,
        ["RTX 4090 + i9 套裝", "RTX 4090 24GB", "電競機 RTX 4080", "買就送滑鼠"],
    ) == [True, False, True, True]
    assert _flags(
        spark,
        P.autobuy_is_bundle,
        ["SAPPHIRE NITRO+ RX 9070 XT", "A + B + C 組合", "RX 9070 單卡"],
    ) == [False, True, False]


def test_standalone_heuristic(spark):
    assert _flags(
        spark,
        P.is_standalone,
        [
            # NB: 'GDDR6X' names are non-standalone in the reference too —
            # 'ddr' is in the combo keyword list and matched by substring
            # (product_matcher.py:152-196).
            "MSI RTX 4090 GAMING TRIO 顯示卡",
            "RTX 4090 24GB GDDR6X",
            "電競電腦 RTX 4090 + 32G RAM",
            "ASUS ROG strix scar 筆電",
        ],
    ) == [True, False, False, False]


def test_sapphire_name_enrichment(spark):
    """P12: i-th pixel product takes the i-th title span's name; extras keep
    the placeholder."""
    from price_crawler_spark.operators.extraction import sapphire_enriched_products
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    pixel_text = (
        'content_ids:[...], {"id":11,"price":100.0,"quantity":3}, '
        '{"id":22,"price":200.0,"quantity":0}'
    )
    rows = [
        (
            "d1",
            [
                ("title", "SAPPHIRE NITRO RX 9070", None, 0),
                ("pixel", pixel_text, None, 1),
            ],
            "sapphire",
            0,
            0,
        )
    ]
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA).withColumn(
        "seq_key", F.lit("00000000")
    )
    out = sapphire_enriched_products(docs).orderBy("seq").collect()
    assert [r.product_name for r in out] == [
        "SAPPHIRE NITRO RX 9070",  # enriched from title span
        "藍寶石產品 #22",  # no second title → placeholder kept
    ]
    assert [r.in_stock for r in out] == [True, False]


def test_sapphire_unpriced_rank(spark):
    from price_crawler_spark.operators.extraction import sapphire_rank_unpriced
    from price_crawler_spark.schemas import PRODUCT_SCHEMA

    def row(name, price, seq):
        return ("sapphire", name, price, None, True, "TWD", None, None, False, seq)

    import pyspark.sql.types as T

    schema = T.StructType(
        PRODUCT_SCHEMA.fields + [T.StructField("seq", T.LongType())]
    )
    df = spark.createDataFrame(
        [
            row("RX 9070 XT priced", 100.0, 1),
            row("NITRO RX9070 unpriced", None, 2),
            row("radeon", None, 3),          # generic series → dropped
            row("no model here", None, 4),   # no concrete token → dropped
            row("PULSE RX 7800 second", 0.0, 5),
        ],
        schema,
    )
    out = sapphire_rank_unpriced(df).collect()
    assert [r.product_name for r in out] == [
        "RX 9070 XT priced",
        "NITRO RX9070 unpriced",
        "PULSE RX 7800 second",
    ]


def test_sinya_three_state_stock(spark):
    """D4 truth table (sinya.py:219-242 + 389-391): stock field wins; then
    display_price_status / name keywords; default 需確認庫存; only 有庫存
    maps to in_stock=True."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.predicates import (
        sinya_in_stock,
        sinya_stock_state,
    )

    rows = [
        # (stock, status, name, expected_state)
        (0, None, "X", "缺貨"),
        (3, "缺貨", "X", "有庫存"),        # stock field wins over status
        (None, "目前缺貨", "X", "缺貨"),
        (None, "補貨中", "X", "缺貨"),
        (None, None, "RTX 4090 售完", "缺貨"),
        (None, None, "RTX 4090", "需確認庫存"),
    ]
    df = spark.createDataFrame(
        [(s, st, n, e) for s, st, n, e in rows],
        "stock int, status string, name string, expected string",
    )
    out = df.select(
        "expected",
        sinya_stock_state(F.col("stock"), F.col("status"), F.col("name")).alias("state"),
        sinya_in_stock(F.col("stock"), F.col("status"), F.col("name")).alias("in_stock"),
    ).collect()
    for r in out:
        assert r.state == r.expected, (r.state, r.expected)
        assert r.in_stock == (r.expected == "有庫存")


def test_detail_pages_enrich_not_duplicate(spark):
    """S4/P19: a second-hop detail page (no price span) must never become a
    standalone product; its spec span enriches the parent row by url."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import extract_products
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    detail_url = "https://www.mypc.com.tw/prod?id=abc"
    search_spans = [
        ("title", "ASUS RTX 4090", None, 0),
        ("price", "NT$44,180", None, 1),
        ("link", None, detail_url, 2),
        ("stock", "現貨供應", None, 3),
    ]
    detail_spans = [
        ("title", "ASUS RTX 4090", None, 0),
        ("spec", "24GB GDDR6X, 2520MHz", None, 1),
        ("stock", "現貨供應", None, 2),
    ]
    docs = spark.createDataFrame(
        [
            ("https://search", search_spans, "dtsource", 0, 0),
            (detail_url, detail_spans, "dtsource", 1, 1),
        ],
        DOCUMENTS_SCHEMA,
    ).withColumn("seq_key", F.lit("00000000"))
    out = extract_products(docs).collect()
    assert len(out) == 1
    assert out[0].price == 44180.0
    assert out[0].specifications == "24GB GDDR6X, 2520MHz"


def test_dtsource_bundle_only_drop(spark):
    """D8 (dtsource.py:75-123, 150-153): a detail page carrying a bundle-only
    marker removes the parent product entirely; a clean detail page keeps it."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import extract_products
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    def card(name, link, off0):
        return [
            ("title", name, None, off0),
            ("price", "NT$10,000", None, off0 + 1),
            ("link", None, link, off0 + 2),
            ("stock", "現貨供應", None, off0 + 3),
        ]

    d1 = "https://www.mypc.com.tw/prod?id=keep"
    d2 = "https://www.mypc.com.tw/prod?id=drop"
    search_spans = card("RTX 4090 單卡", d1, 0) + card("RTX 4080 好物", d2, 4)
    detail_keep = [("title", "RTX 4090 單卡", None, 0), ("spec", "24GB", None, 1)]
    detail_drop = [
        ("title", "RTX 4080 好物", None, 0),
        ("spec", "16GB", None, 1),
        ("note", "組裝價 限搭組裝機出貨 不單獨販售", None, 2),
    ]
    docs = spark.createDataFrame(
        [
            ("https://search", search_spans, "dtsource", 0, 0),
            (d1, detail_keep, "dtsource", 1, 1),
            (d2, detail_drop, "dtsource", 1, 1),
        ],
        DOCUMENTS_SCHEMA,
    ).withColumn("seq_key", F.lit("00000000"))
    out = extract_products(docs).collect()
    assert [r.product_name for r in out] == ["RTX 4090 單卡"]
    assert out[0].specifications == "24GB"
    # name-level marker alone also drops (reference checks both)
    search2 = card("RTX 4070 組裝價 限搭組裝機", "https://x/prod?id=z", 0)
    docs2 = spark.createDataFrame(
        [("https://search2", search2, "dtsource", 0, 0)], DOCUMENTS_SCHEMA
    ).withColumn("seq_key", F.lit("00000000"))
    assert extract_products(docs2).count() == 0


def test_detail_stock_escalation_flips_sinya(spark):
    """S4/D4: a sinya row in 需確認庫存 takes the detail page's verdict;
    without a fetched detail page it defaults to 缺貨 (sinya.py:294-301)."""
    import json

    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import extract_products
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    d_in = "https://www.sinya.com.tw/prod?id=a"
    d_missing = "https://www.sinya.com.tw/prod?id=b"
    payload = json.dumps(
        [
            {"prod_title": "RTX 4090 未知A", "new_price": "1000", "href": d_in},
            {"prod_title": "RTX 4090 未知B", "new_price": "2000", "href": d_missing},
        ],
        ensure_ascii=False,
    )
    search_spans = [("json", f"const results = {payload};", None, 0)]
    detail_spans = [
        ("title", "RTX 4090 未知A", None, 0),
        ("spec", "24GB", None, 1),
        ("stock", "現貨供應", None, 2),
    ]
    docs = spark.createDataFrame(
        [
            ("https://search", search_spans, "sinya", 0, 0),
            (d_in, detail_spans, "sinya", 1, 1),
        ],
        DOCUMENTS_SCHEMA,
    ).withColumn("seq_key", F.lit("00000000"))
    rows = {r.product_name: r for r in extract_products(docs).collect()}
    assert rows["RTX 4090 未知A"].in_stock is True  # detail page flipped it
    assert rows["RTX 4090 未知B"].in_stock is False  # conservative default


def test_sinya_detail_stock_check(spark):
    """D4b truth table (sinya.py:244-301): OOS indicators > in-stock
    indicators > cart button > conservative 缺貨 default — and the wired
    path: a sinya detail page with only a cart button flips its 需確認庫存
    parent to in-stock."""
    import json

    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import extract_products
    from price_crawler_spark.operators.predicates import sinya_detail_stock_state
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    rows = [
        ("等待到貨 立即購買", True, "缺貨"),   # OOS wins over in-stock + cart
        ("加入購物車", False, "有庫存"),
        ("nothing decisive", True, "有庫存"),  # cart fallback
        ("nothing decisive", False, "缺貨"),   # conservative default
        ("貨到通知我", False, "缺貨"),
    ]
    df = spark.createDataFrame(rows, "t string, cart boolean, expected string")
    for r in df.select(
        "expected", sinya_detail_stock_state(F.col("t"), F.col("cart")).alias("got")
    ).collect():
        assert r.got == r.expected, (r.got, r.expected)

    # wired: detail page with no stock span, just a cart button span
    d = "https://www.sinya.com.tw/prod?id=cartonly"
    payload = json.dumps(
        [{"prod_title": "RTX 4090 購物車案例", "new_price": "99", "href": d}],
        ensure_ascii=False,
    )
    docs = spark.createDataFrame(
        [
            ("https://search", [("json", f"const results = {payload};", None, 0)],
             "sinya", 0, 0),
            (d, [("title", "RTX 4090 購物車案例", None, 0),
                 ("spec", "24GB", None, 1),
                 ("button", "加入購物車", None, 2)], "sinya", 1, 1),
        ],
        DOCUMENTS_SCHEMA,
    ).withColumn("seq_key", F.lit("00000000"))
    out = extract_products(docs).collect()
    assert len(out) == 1 and out[0].in_stock is True


def test_buy_button_stock(spark):
    """D3 (pchome.py:166-189): a restock/disabled buy button overrides an
    otherwise in-stock card; a healthy button leaves it alone."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import card_products
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    def card(name, button, off0):
        return [
            ("title", name, None, off0),
            ("price", "NT$9,999", None, off0 + 1),
            ("stock", "現貨供應", None, off0 + 2),
            ("button", button, None, off0 + 3),
        ]

    spans = (
        card("A 正常", "加入購物車", 0)
        + card("B 補貨", "補貨中", 4)
        + card("C 禁用", "加入購物車 disabled", 8)
    )
    docs = spark.createDataFrame(
        [("https://search", spans, "pchome", 0, 0)], DOCUMENTS_SCHEMA
    ).withColumn("seq_key", F.lit("00000000"))
    got = {r.product_name: r.in_stock for r in card_products(docs).collect()}
    assert got == {"A 正常": True, "B 補貨": False, "C 禁用": False}


def test_sapphire_stock_state(spark):
    """D6 truth table (sapphire.py:529-563 + 584-596)."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.predicates import (
        sapphire_parse_stock_status,
        sapphire_stock_state,
    )

    rows = [
        # (element_text, price_text, expected_state)
        ("SAPPHIRE NITRO 補貨中", "NT$100", "無庫存"),   # OOS wins over price
        ("SAPPHIRE 加入購物車", None, "有庫存"),
        ("nothing decisive", "NT$23,000", "有庫存"),      # price fallback
        ("nothing decisive", "來電詢問", "需確認庫存"),   # no digit in price
        ("Coming Soon", None, "無庫存"),
    ]
    df = spark.createDataFrame(rows, "t string, p string, expected string")
    for r in df.select(
        "expected", sapphire_stock_state(F.col("t"), F.col("p")).alias("got")
    ).collect():
        assert r.got == r.expected, (r.got, r.expected)

    df2 = spark.createDataFrame(
        [("Sold Out", "無庫存"), ("In Stock!", "有庫存"), ("", "需確認庫存"),
         ("現貨", "有庫存"), ("詳洽門市", "需確認庫存")],
        "t string, expected string",
    )
    for r in df2.select(
        "expected", sapphire_parse_stock_status(F.col("t")).alias("got")
    ).collect():
        assert r.got == r.expected, (r.got, r.expected)


def test_sinya_bundle_detector(spark):
    """D11 truth table (sinya.py:332-385): sinya's own indicator list, combo
    regexes gated on a plus sign, chipset×plus heuristic."""
    assert _flags(
        spark,
        P.sinya_is_bundle,
        [
            "【救贖】RTX 4090 電競組",      # explicit indicator
            "RTX 4090 + 850W 電源",        # combo pattern: product+電源
            "RX 9070 XT + 華擎 B650M",     # chipset + plus
            "SAPPHIRE NITRO+ RX 9070 XT",  # plus but no combo/chipset → not bundle
            "RTX 4090 24GB 單卡",          # nothing
            "豪華組 i9 主機",               # two indicators
        ],
    ) == [True, True, True, False, False, True]


def test_unescape_entities(spark):
    """F13 (sapphire.py:211): JS \\u2122 + stray backslashes + HTML entities."""
    from pyspark.sql import functions as F

    from price_crawler_spark.functions.names import unescape_entities

    df = spark.createDataFrame(
        [
            ("SAPPHIRE NITRO+\\u2122 RX", "SAPPHIRE NITRO+™ RX"),
            ("AMD Radeon&trade; RX 9070", "AMD Radeon™ RX 9070"),
            ("A &amp; B &lt;OC&gt;", "A & B <OC>"),
            ("plain name", "plain name"),
        ],
        "raw string, expected string",
    )
    for r in df.select(
        "expected", unescape_entities(F.col("raw")).alias("got")
    ).collect():
        assert r.got == r.expected, (r.got, r.expected)


def test_sapphire_alignment_is_per_document(spark):
    """P12 regression: two sapphire pages whose title counts differ must not
    shift names across documents — alignment is within one page only."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import sapphire_enriched_products
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    # page 1: TWO pixel triples but only ONE title
    p1 = (
        'x, {"id":1,"price":10.0,"quantity":1}, '
        '{"id":2,"price":20.0,"quantity":1}'
    )
    # page 2: one triple, one title
    p2 = 'x, {"id":3,"price":30.0,"quantity":1}'
    docs = spark.createDataFrame(
        [
            ("d1", [("title", "P1 Title", None, 0), ("pixel", p1, None, 1)],
             "sapphire", 0, 0),
            ("d2", [("title", "P2 Title", None, 0), ("pixel", p2, None, 1)],
             "sapphire", 0, 0),
        ],
        DOCUMENTS_SCHEMA,
    ).withColumn("seq_key", F.col("doc_id"))
    out = sapphire_enriched_products(docs).orderBy("seq").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.product_name)
    assert by_doc["d1"] == ["P1 Title", "藍寶石產品 #2"]  # no leak from d2
    assert by_doc["d2"] == ["P2 Title"]


def test_crawl_detail_enrichment_end_to_end(spark, tmp_path):
    """Wave-level check (VERDICT r1 item 2): after a full crawl, every sinya
    product's stock equals the catalog truth (the 需確認庫存 third was
    flipped by its fetched detail page), and dtsource bundle-only products
    are gone from the products view."""
    from price_crawler_spark.frontier.wave import CrawlRun
    from price_crawler_spark.operators.extraction import extract_products

    run = CrawlRun(spark, str(tmp_path), ["RTX"], wave_seconds=60.0)
    run.run(max_waves=6)
    products = extract_products(run.documents())

    sinya = {
        r.product_name: r.in_stock
        for r in products.filter("store = 'sinya'").collect()
    }
    expected = syn.catalog_matches("sinya", "RTX")
    assert sinya == {name: in_stock for name, _p, _s, in_stock in expected}
    # at least one row was actually escalated (unknown on the search page)
    assert any(not syn.sinya_stock_known(n) for n in sinya)

    dt_names = {
        r.product_name
        for r in products.filter("store = 'dtsource'").collect()
    }
    dt_expected = syn.catalog_matches("dtsource", "RTX")
    kept = {n for n, _p, _s, _i in dt_expected if not syn.dtsource_bundle_only_product(n)}
    dropped = {n for n, _p, _s, _i in dt_expected if syn.dtsource_bundle_only_product(n)}
    assert dropped, "fixture should contain at least one bundle-only product"
    assert dt_names == kept


def test_sinya_html_fallback(spark):
    """P7 (sinya.py:138-200): the HTML card parse fires ONLY for sinya pages
    without a usable JSON span; integer price extraction, relative-href
    absolutization, 有庫存 default, name+price>0 gate."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import (
        extract_products,
        sinya_html_fallback_products,
    )
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    html_spans = [
        ("title", "RTX 4090 白色特別版", None, 0),
        ("price", "$45,900", None, 1),
        ("link", None, "/product/123", 2),
        ("title", "無價格產品", None, 3),  # no price → dropped
        ("title", "另一卡", None, 4),
        ("price", "NT＄12,000元", None, 5),
        ("link", None, "https://abs.example.com/p9", 6),
    ]
    json_spans = [
        (
            "json",
            'const results = [{"prod_title": "JSON卡", "new_price": "5", "stock": 1}];',
            None,
            0,
        )
    ]
    # present-but-EMPTY JSON + html cards: the reference parses zero
    # products from the JSON and falls back to HTML (sinya.py:29-136) —
    # r2 gated on span absence and missed this page (ADVICE r2)
    empty_json_spans = [
        ("json", "const results = [];", None, 0),
        ("title", "空JSON備援卡", None, 1),
        ("price", "$1,500", None, 2),
        ("link", None, "/product/777", 3),
    ]
    docs = spark.createDataFrame(
        [
            ("https://html-page", html_spans, "sinya", 0, 0),
            ("https://json-page", json_spans, "sinya", 0, 1),
            ("https://empty-json-page", empty_json_spans, "sinya", 0, 2),
        ],
        DOCUMENTS_SCHEMA,
    ).withColumn("seq_key", F.col("doc_id"))
    out = sinya_html_fallback_products(docs).orderBy("seq").collect()
    assert [(r.product_name, r.price, r.url) for r in out] == [
        ("空JSON備援卡", 1500.0, "https://www.sinya.com.tw/product/777"),
        ("RTX 4090 白色特別版", 45900.0, "https://www.sinya.com.tw/product/123"),
        ("另一卡", 12000.0, "https://abs.example.com/p9"),
    ]
    assert all(r.in_stock for r in out)
    # unified view: JSON page parses via P5, HTML/empty-JSON pages via P7 —
    # no overlap, no double-parse
    prods = extract_products(docs, enrich_details=False)
    by_name = {r.product_name for r in prods.filter("store='sinya'").collect()}
    assert by_name == {"RTX 4090 白色特別版", "另一卡", "JSON卡", "空JSON備援卡"}


def test_ua_rotation_deterministic_and_spread(spark):
    """S2: UA pick is a pure function of the URL (stable across retries and
    partitionings) and spreads across the whole pool."""
    from pyspark.sql import functions as F

    from price_crawler_spark.frontier.fetch import USER_AGENTS, ua_for_url

    urls = spark.range(0, 400).select(
        F.concat(F.lit("https://s.example.com/p/"), F.col("id")).alias("url")
    )
    from price_crawler_spark.frontier.fetch import ua_for_url_py

    picks = urls.select("url", ua_for_url("url").alias("ua"))
    again = urls.repartition(13).select("url", ua_for_url("url").alias("ua"))
    assert {tuple(r) for r in picks.collect()} == {tuple(r) for r in again.collect()}
    # the in-batch Python mirror (used by the fetch UDF) picks identically
    for r in picks.collect():
        assert ua_for_url_py(r.url) == r.ua
    dist = {r.ua: r.n for r in picks.groupBy("ua").agg(F.count("*").alias("n")).collect()}
    assert set(dist) == set(USER_AGENTS)  # every UA used
    assert min(dist.values()) > 50  # roughly uniform over 400 urls


def test_spec_kv_operators(spark):
    """P19/P20: spec join, colon-split entries (half+full width), 500-char
    description truncation."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import (
        spec_kv_join,
        spec_lines_to_entries,
        truncate_description,
    )

    df = spark.createDataFrame([(1,)], ["id"]).select(
        spec_kv_join(
            F.array(
                F.struct(F.lit("CPU").alias("k"), F.lit("i9").alias("v")),
                F.struct(F.lit("RAM").alias("k"), F.lit("32GB").alias("v")),
            )
        ).alias("joined"),
        spec_lines_to_entries(
            F.array(F.lit("a: 1"), F.lit("b：2"), F.lit("junk"), F.lit("c: x: y"))
        ).alias("entries"),
        truncate_description(F.lit("z" * 900)).alias("desc"),
    )
    row = df.collect()[0]
    assert row.joined == "CPU: i9; RAM: 32GB"
    assert [(e.k, e.v) for e in row.entries] == [("a", "1"), ("b", "2"), ("c", "x: y")]
    assert len(row.desc) == 500


def test_generic_json_walk(spark):
    """P13: products/items/results/data candidate arrays; multi-key field
    coalesce; relative URL absolutization; nameless items dropped."""
    from pyspark.sql import functions as F

    from price_crawler_spark.operators.extraction import generic_json_products
    from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

    payload = (
        '{"items": ['
        '{"title": "RX 9070 NITRO", "current_price": "NT$23,000", "link": "/p/1"},'
        '{"product_name": "RX 9060", "amount": "15000", "product_url": "https://x.com/p2"},'
        '{"price": "999"}'
        "]}"
    )
    docs = spark.createDataFrame(
        [("d1", [("json", payload, None, 0)], "sapphire", 0, 0)],
        DOCUMENTS_SCHEMA,
    ).withColumn("seq_key", F.lit("00000000"))
    out = generic_json_products(docs).orderBy("seq").collect()
    assert [(r.product_name, r.price, r.url) for r in out] == [
        ("RX 9070 NITRO", 23000.0, "https://sapphiretech.cyberbiz.co/p/1"),
        ("RX 9060", 15000.0, "https://x.com/p2"),
    ]  # third item has no name → dropped


def test_autobuy_bundle_fuzz_parity_with_reference(spark):
    """D10 hard evidence: predicates.autobuy_is_bundle equals the ACTUAL
    reference `_is_bundle_product` (ast-extracted from the hash-pinned
    autobuy.py — the module itself imports aiohttp/bs4 which this sandbox
    lacks) on 400+ adversarial generated names covering every branch:
    indicators, plus-count, model-suffix escalation (and its negative),
    all 12 combo patterns, and quantity patterns."""
    import random

    from .refsource import extract_function

    ref_is_bundle = extract_function(
        "app/scrapers/autobuy.py", "_is_bundle_product", cls="AutobuyScraper"
    )

    rng = random.Random(1031)
    brands = ["SAPPHIRE", "ASUS", "msi", "技嘉", "撼訊", ""]
    models = [
        "RX 7800 XT", "RTX 4070 Ti", "RTX 5080 SUPER", "RX 9070 GRE",
        "B650 Steel Legend", "X870 Taichi", "Z790 Prime", "i9-14900K",
        "Ryzen 7 9800X3D", "PULSE RX 7800", "NITRO", "GAMING OC",
    ]
    suffixes = ["+", "＋", "+ ", " +", "", " NITRO+", " XT+", " Ti +"]
    tails = [
        "金士頓 DDR5 16G", "主機板", "記憶體", "硬碟 1TB SSD", "電源 850W",
        "螢幕 27吋", "鍵盤", "滑鼠", "處理器", "散熱器", "機殼", "華擎 B850",
        "Intel i7", "ryzen 5", "storage box", "power cable", "", "豪華配件",
    ]
    indicators = [
        "套裝", "組合", "搭機", "限搭", "mpk", "水冷獸", "平台", "含", "附",
        "筆電", "laptop", "旗艦組", "",
    ]
    quantities = ["2件", "3組", "10套", "第2件", "兩件", "雙螢幕組合", "三卡組合", ""]

    names = []
    for _ in range(400):
        parts = [
            rng.choice(brands), rng.choice(models), rng.choice(suffixes),
            rng.choice(tails), rng.choice(indicators), rng.choice(quantities),
        ]
        rng.shuffle(parts)
        names.append(" ".join(p for p in parts if p).strip())
    # hand-picked branch pins (incl. the r2 VERDICT's concrete example)
    names += [
        "SAPPHIRE PULSE RX 7800 XT + 金士頓 DDR5 16G",
        "SAPPHIRE NITRO+ RX 9070 XT",
        "NITRO+ 記憶體超頻包",
        "RTX 4090 + PSU + 機殼",
        "B650M 主機板 + i5",
        "螢幕支架+",
        "ASRock X870 Taichi+",
        "第3件五折",
        "雙 27吋 組合",
        "",
        "單卡 RX 9070",
    ]

    expected = [bool(ref_is_bundle(n)) for n in names]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = [
        r[0]
        for r in df.select(P.autobuy_is_bundle(F.col("name")).alias("b"))
        .collect()
    ]
    mismatches = [
        (n, g, e) for n, g, e in zip(names, got, expected) if g != e
    ]
    assert not mismatches, mismatches[:10]


def test_pchome_stock_reference_truth_table(spark):
    """D3 full parity (pchome.py:166-189): any card text node matching the
    OOS regex → False; no stock text at all → True (the reference returns
    True when find_all is empty); buy-button text/disabled still ANDs in."""
    cases = [
        # (name, stock_text, button_text, expected)
        ("RTX 4090", "現貨供應", "加入購物車", True),
        ("RTX 4090", "補貨中", "加入購物車", False),      # r2 bug: was True
        ("RTX 4090", None, "加入購物車", True),            # r2 bug: was False
        ("RTX 4090", None, None, True),
        ("RTX 4090 預購", None, "加入購物車", False),      # name node matches
        ("RTX 4090", "暫不供貨", None, False),
        ("RTX 4090", "停產", None, False),
        ("RTX 4090", "Sold Out", None, False),
        ("RTX 4090", "item out of stock", None, False),
        ("RTX 4090", "現貨供應", "buy DISABLED", False),   # disabled button
        ("RTX 4090", "現貨供應", "補貨通知", False),       # button 補貨
    ]
    df = spark.createDataFrame(cases, "name string, st string, btn string, exp boolean")
    got = df.select(
        P.pchome_in_stock(
            F.array(F.col("name"), F.col("st"), F.col("btn")), F.col("btn")
        ).alias("got"),
        "exp", "name", "st", "btn",
    ).collect()
    bad = [(r.name, r.st, r.btn, r.got, r.exp) for r in got if r.got != r.exp]
    assert not bad, bad


def test_coolpc_js_arrays_fuzz_parity_with_reference(spark):
    """P4: extraction.coolpc_js_arrays vs the ACTUAL reference
    CoolPCScraper._parse_js_arrays (coolpc.py:42-61, hash-pinned) over
    adversarial pages: duplicate names (last wins), '0'/'' elements, the
    Header len==2 string quirk, nested brackets, floats in g arrays."""
    import random

    from price_crawler_spark.operators.extraction import coolpc_js_arrays

    from .refsource import extract_function

    ref_parse = extract_function(
        "app/scrapers/coolpc.py", "_parse_js_arrays", cls="CoolPCScraper"
    )
    rng = random.Random(41)
    frags = [
        "c1=[100,200,0]", "c1=[7,5]", "c2=[0]", "c12=[55,0,3]",
        "g1=[1.5,2]", "g1=[0.5,,7]".replace(",,", ","),  # valid floats only
        "g3=[10,0]", "g12=[9.25]",
        "Header=[12]", "Header=[1,]", "Header=[1,2,3]",
        "Header=[[1,2],[3]]", "Header=[9]", "Header=[,]",
        "<td>noise $123</td>", "var x=foo;", "c=[1,2]", "g=[3]",
        "abc7=[44,2]",  # unanchored: matches the c-pattern inside 'abc7'
    ]
    pages = []
    for i in range(160):
        k = 1 + rng.randrange(6)
        pages.append(" ".join(rng.choice(frags) for _ in range(k)))
    df = spark.createDataFrame([(p,) for p in pages], "html string")
    got_rows = df.select(
        "html", coolpc_js_arrays("html").alias("arrays")
    ).collect()
    for r in got_rows:
        got = {e["array_name"]: e["values"] for e in r["arrays"]}
        want = {k: [float(x) for x in v] for k, v in ref_parse(r["html"]).items()}
        assert got == want, (r["html"], got, want)
