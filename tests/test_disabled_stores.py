"""P16-P18: disabled-store parsers (momo / sanjing / gh3c).

The stores are disabled in the reference registry (their constructors crash
— /root/reference/app/main.py:49-52), so active-registry parity keeps them
out of the products union; extraction.disabled_store_products carries the
full parse for re-enablement. These tests gate its semantics, including a
fuzz-parity check of the momo name cleaner against the ACTUAL reference
method (hash-pinned, ast-extracted — see refsource.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from price_crawler_spark.operators.extraction import (
    DISABLED_CARD_STORES,
    disabled_store_products,
    extract_products,
)
from price_crawler_spark.schemas import DOCUMENTS_SCHEMA

from tests.refsource import extract_function


def _docs(spark, store: str, spans: list[tuple], doc_id: str = "d0"):
    rows = [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for k, t, m, o in spans
    ]
    return spark.createDataFrame(
        [(doc_id, rows, store, 0, 0)], DOCUMENTS_SCHEMA
    ).withColumn("seq_key", F.lit("00000000"))


# ---------------------------------------------------------------------------
# momo (P16)
# ---------------------------------------------------------------------------

def test_momo_clean_name_fuzz_parity_with_reference(spark):
    """names.momo_clean_name vs the actual momo.MomoScraper._clean_product_name
    over adversarial names: paired vs lone delimiters, nesting, tails."""
    ref_clean = extract_function("app/scrapers/momo.py", "_clean_product_name",
                                 cls="MomoScraper")
    frags = [
        "", " ", "【限量】", "【a【b】c】", "[組合價]", "[x", "★熱賣★", "★",
        "☆新☆", "☆", "  多  空  白  ", "RTX 4090", "限時特價中", "限時特價",
        "限時特價 $999 再送滑鼠", "【】", "[]", "★★", "名稱", "A + B",
    ]
    names_in = []
    for i in range(220):
        a, b, c = frags[i % len(frags)], frags[(i * 7 + 3) % len(frags)], \
            frags[(i * 13 + 5) % len(frags)]
        names_in.append(f"{a}item{i} {b} {c}")
    from price_crawler_spark.functions.names import momo_clean_name

    df = spark.createDataFrame([(n,) for n in names_in], "raw string")
    got = [r["c"] for r in
           df.select(momo_clean_name("raw").alias("c")).collect()]
    want = [ref_clean(n) for n in names_in]
    assert got == want


def test_momo_card_parse(spark):
    spans = [
        # item 0: paired-delimiter name, $1,299 price, in stock
        ("title", "【限定】GIGABYTE RTX 4070【白】 ★促銷★", None, 0),
        ("price", "$1,299", None, 1),
        ("link", None, "https://www.momoshop.com.tw/goods/1", 2),
        ("image", None, "https://img.momoshop.com.tw/1.jpg", 3),
        ("button", "加入購物車", None, 4),
        # item 1: OOS via stock text (補貨中 is in momo's OOS set)
        ("title", "MSI B650 主機板", None, 10),
        ("price", "NT$3,999", None, 11),
        ("stock", "補貨中", None, 12),
        # item 2: OOS via momo's button variant 無法購買
        ("title", "Kingston DDR5 32GB", None, 20),
        ("price", "2,888元", None, 21),
        ("button", "無法購買", None, 22),
        # item 3: RAW name non-empty but cleans to '' — the reference drops
        # only empty RAW names (momo.py:151-153), so this row SURVIVES with
        # an empty cleaned name
        ("title", "【活動贈品】", None, 30),
        ("price", "$99", None, 31),
        # item 4: raw title empty → dropped
        ("title", "  ", None, 40),
        ("price", "$77", None, 41),
        # item 5: OOS via 暫不供貨 — in the reference momo OOS regex
        # (momo.py:230) between sold.*out and 現貨不足; regression case for
        # the ADVICE r3 drift finding
        ("title", "AMD Ryzen 9 7950X", None, 50),
        ("price", "$18,500", None, 51),
        ("stock", "暫不供貨", None, 52),
    ]
    rows = disabled_store_products(_docs(spark, "momo", spans)) \
        .orderBy("seq").collect()
    assert len(rows) == 5
    assert rows[4]["in_stock"] is False  # 暫不供貨
    assert rows[4]["price"] == 18500.0
    # 【限定】/【白】 removed with content, paired ★促銷★ removed, trimmed
    assert rows[0]["product_name"] == "GIGABYTE RTX 4070"
    assert rows[0]["price"] == 1299.0
    assert rows[0]["in_stock"] is True
    assert rows[0]["url"] == "https://www.momoshop.com.tw/goods/1"
    assert rows[0]["image_url"] == "https://img.momoshop.com.tw/1.jpg"
    assert rows[1]["product_name"] == "MSI B650 主機板"
    assert rows[1]["price"] == 3999.0
    assert rows[1]["in_stock"] is False
    assert rows[2]["in_stock"] is False
    assert rows[2]["price"] == 2888.0
    assert rows[3]["product_name"] == ""  # cleans to '' but survives
    assert rows[3]["price"] == 99.0


# ---------------------------------------------------------------------------
# sanjing (P17)
# ---------------------------------------------------------------------------

def test_sanjing_card_parse(spark):
    spans = [
        # item 0: specs present (first 3 of 4 joined)
        ("title", "ASUS TUF RTX 4080", None, 0),
        ("price", "NT$32,900 元", None, 1),
        ("link", None, "https://www.sanjing3c.com.tw/p/1", 2),
        ("spec", "16GB GDDR6X", None, 3),
        ("spec", "三風扇", None, 4),
        ("spec", "5年保固", None, 5),
        ("spec", "RGB", None, 6),
        # item 1: no specs → full-name fallback; no title text → 未知產品
        ("title", None, None, 10),
        ("price", "$990", None, 11),
        ("link", None, "https://www.sanjing3c.com.tw/p/2", 12),
        ("fullname", "Intel Core i5-14400F 中央處理器", None, 13),
        # item 2: NO parent link → dropped (sanjing.py:155-159)
        ("title", "SteelSeries 滑鼠", None, 20),
        ("price", "$1,490", None, 21),
        # item 3: whitespace-only spec line must NOT displace a real spec —
        # the reference drops empties BEFORE the [:3] slice
        # (sanjing.py:199-200); ADVICE r3 regression case
        ("title", "MSI MAG 274QRF", None, 30),
        ("price", "$8,888", None, 31),
        ("link", None, "https://www.sanjing3c.com.tw/p/3", 32),
        ("spec", "27吋", None, 33),
        ("spec", "   ", None, 34),
        ("spec", "2K 180Hz", None, 35),
        ("spec", "HDR400", None, 36),
    ]
    rows = disabled_store_products(_docs(spark, "sanjing", spans)) \
        .orderBy("seq").collect()
    assert len(rows) == 3
    assert rows[2]["specifications"] == "27吋 | 2K 180Hz | HDR400"
    assert rows[0]["specifications"] == "16GB GDDR6X | 三風扇 | 5年保固"
    assert rows[0]["price"] == 32900.0
    assert rows[0]["in_stock"] is True
    assert rows[1]["product_name"] == "未知產品"
    assert rows[1]["specifications"] == "Intel Core i5-14400F 中央處理器"
    assert rows[1]["price"] == 990.0
    assert rows[1]["in_stock"] is True  # sanjing is ALWAYS in stock


# ---------------------------------------------------------------------------
# gh3c (P18)
# ---------------------------------------------------------------------------

def test_gh3c_card_parse(spark):
    spans = [
        # item 0: normal card
        ("title", "Logitech G Pro X 電競鍵盤", None, 0),
        ("price", "NT$ 3,290", None, 1),
        ("link", None, "https://www.gh3c.com.tw/product/1", 2),
        ("button", "加入購物車", None, 3),
        # item 1: no price span → fallback digit-run scan over card text,
        # band [100, 1e6] — '8GB' (8) is too small, '2,990' qualifies
        ("title", "良興特選 記憶體套裝 2,990 元", None, 10),
        ("link", None, "https://www.gh3c.com.tw/product/2", 11),
        # item 2: inquiry pricing → out of stock (詢價)
        ("title", "Server 主機 詢價", None, 20),
        ("price", "$45,000", None, 21),
        # item 3: raw name shorter than 3 chars → dropped (gh3c.py:110-112)
        ("title", "AB", None, 30),
        ("price", "$500", None, 31),
        # item 4: price 0 (no digits anywhere) → dropped (gh3c.py:158-160)
        ("title", "良興電子禮券", None, 40),
        # item 5: 暫時缺貨 (gh3c-only OOS keyword)
        ("title", "ROG Azoth 鍵盤", None, 50),
        ("price", "$8,990", None, 51),
        ("stock", "暫時缺貨", None, 52),
    ]
    rows = disabled_store_products(_docs(spark, "gh3c", spans)) \
        .orderBy("seq").collect()
    assert len(rows) == 4
    assert rows[0]["price"] == 3290.0
    assert rows[0]["in_stock"] is True
    assert rows[1]["price"] == 2990.0
    assert rows[2]["in_stock"] is False  # 詢價
    assert rows[3]["in_stock"] is False  # 暫時缺貨
    assert rows[3]["price"] == 8990.0


# ---------------------------------------------------------------------------
# registry parity: the active products view still excludes all three
# ---------------------------------------------------------------------------

def test_disabled_stores_excluded_from_active_products(spark):
    spans = [
        ("title", "GIGABYTE RTX 4070", None, 0),
        ("price", "$1,299", None, 1),
    ]
    for store in DISABLED_CARD_STORES:
        out = extract_products(_docs(spark, store, spans, doc_id=f"d-{store}"))
        assert out.count() == 0, store
