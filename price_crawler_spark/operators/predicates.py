"""Stock / bundle / standalone predicates (SURVEY.md §2.4 D1-D12).

Each detector is one native boolean Column built from a broadcast-literal
keyword array (``exists`` over the array — evaluated vectorized in codegen,
vs. the reference's per-row Python keyword loops) plus an ``rlike`` union
for the regex patterns. Keyword lists are data parity with the reference
(file:line cited per detector).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _contains_any(c: Column, keywords: list[str], lowercase: bool = True) -> Column:
    target = F.lower(c) if lowercase else c
    kws = F.array(*[F.lit(k.lower() if lowercase else k) for k in keywords])
    return F.exists(kws, lambda k: target.contains(k))


# D1 — base stock heuristic (base_scraper.py:105-116): empty/None → False;
# otherwise in stock unless an out-of-stock keyword appears.
OUT_OF_STOCK_KEYWORDS = [
    "無庫存", "缺貨", "售完", "暫無", "預購",
    "out of stock", "sold out", "unavailable",
]


def is_in_stock(stock_text: Column | str) -> Column:
    c = _col(stock_text)
    return F.when(
        c.isNull() | (c == ""), F.lit(False)
    ).otherwise(~_contains_any(c, OUT_OF_STOCK_KEYWORDS))


# D2 — DTSource stock check over the NAME (dtsource.py:26-73).
DTSOURCE_OOS_KEYWORDS = [
    "已售完", "請勿下單", "僅提供報價", "已售完 請勿下單 僅提供報價",
    "缺貨", "停產", "暫停供應", "暫無庫存", "預購", "到貨通知",
    "客定產品", "停售",
]
DTSOURCE_OOS_BRACKET_RE = (
    r"\(.*已售完.*\)|\(.*請勿下單.*\)|\(.*僅提供報價.*\)|\(.*缺貨.*\)"
    r"|\(.*停產.*\)|\(.*暫停.*\)"
    r"|（.*已售完.*）|（.*請勿下單.*）|（.*僅提供報價.*）|（.*缺貨.*）"
)


def dtsource_in_stock(name: Column | str) -> Column:
    c = _col(name)
    return F.when(c.isNull() | (c == ""), F.lit(False)).otherwise(
        ~_contains_any(c, DTSOURCE_OOS_KEYWORDS, lowercase=False)
        & ~c.rlike(DTSOURCE_OOS_BRACKET_RE)
    )


# D8 — DTSource bundle-only (合購限定) detection (dtsource.py:75-123): the
# reference fetches each product's DETAIL page and drops the product entirely
# (dtsource.py:150-153) when the page or the name carries a bundle-only
# marker. Keyword list + regex patterns are data parity.
DTSOURCE_BUNDLE_ONLY_KEYWORDS = [
    "合購價", "限搭組裝機出貨", "需限定規格", "限搭組裝機", "不單獨販售",
    "組裝機專用", "搭機價", "組合價", "組裝價", "限組整機", "限組裝機",
    "整機專用",
]
DTSOURCE_BUNDLE_ONLY_RE = (
    r"(?i)合購價.*?限搭組裝機|限搭.*?出貨|需.*?限定規格|不.*?單獨.*?販售"
    r"|組裝價.*?限組整機|限組.*?整機|組裝價.*?\(.*?限.*?\)|限.*?組裝機.*?出貨"
)


def dtsource_bundle_only(text: Column | str) -> Column:
    """True when detail-page text (or the product name — the reference checks
    both, dtsource.py:100-103) marks the product as bundle-only."""
    c = _col(text)
    return F.when(c.isNull(), F.lit(False)).otherwise(
        _contains_any(c, DTSOURCE_BUNDLE_ONLY_KEYWORDS, lowercase=False)
        | c.rlike(DTSOURCE_BUNDLE_ONLY_RE)
    )


# D3 — buy-button stock check (pchome.py:166-189; momo.py:225-254 adds
# 無法購買): a buy/cart button whose text signals restock, or that is
# disabled, overrides the text heuristic to out-of-stock. No button found
# (null) → no evidence → leave the text verdict standing.
PCHOME_BUTTON_OOS_RE = r"缺貨|補貨|售完|暫停"
# momo's variant (extra 無法購買). momo is a DISABLED store in the reference
# registry (main.py:49-52), so nothing wires this in — it is data parity for
# the day the store is re-enabled, exercised by tests only.
MOMO_BUTTON_OOS_RE = r"缺貨|補貨|售完|暫停|無法購買"


def buy_button_in_stock(button_text: Column | str, oos_re: str = PCHOME_BUTTON_OOS_RE) -> Column:
    c = _col(button_text)
    return F.when(c.isNull(), F.lit(True)).otherwise(
        ~c.rlike(oos_re) & ~F.lower(c).contains("disabled")
    )


# D3 (pchome, full) — pchome._check_stock_status (pchome.py:166-189): the
# OOS regex is scanned over EVERY text node of the card container (any hit
# → out of stock), then the buy-button text/disabled check; a card with no
# stock text at all defaults to IN stock (the reference returns True when
# find_all comes back empty).
PCHOME_OOS_TEXT_RE = (
    r"(?i)缺貨|售完|補貨中|暫停供應|停產|預購|無庫存|out.*stock|sold.*out|暫不供貨"
)


def pchome_in_stock(card_texts: Column, button_text: Column | str) -> Column:
    """``card_texts``: array<string> of the card's text nodes (title, price,
    stock, button, …). The reference matches the regex per text node
    (``container.find_all(text=...)``), so this ``exists`` over the array
    rather than concatenating — a concat could fabricate cross-node
    ``out.*stock`` matches the reference can't see."""
    oos = F.exists(
        card_texts, lambda t: t.isNotNull() & t.rlike(PCHOME_OOS_TEXT_RE)
    )
    return ~oos & buy_button_in_stock(button_text)


# D6 — Sapphire element-level stock (sapphire.py:529-563): OOS indicators
# first, then in-stock indicators, then price-presence fallback, default
# 需確認庫存; only 有庫存 maps to in_stock=True.
SAPPHIRE_OOS_INDICATORS = [
    "缺貨", "售完", "暫停供應", "停產", "預購", "補貨中",
    "out of stock", "sold out", "unavailable", "coming soon",
]
SAPPHIRE_IN_STOCK_INDICATORS = [
    "現貨", "有庫存", "立即購買", "加入購物車", "購買",
    "in stock", "available", "add to cart", "buy now",
]


def sapphire_stock_state(element_text: Column | str, price_text: Column | str) -> Column:
    c = _col(element_text)
    p = _col(price_text)
    return (
        F.when(
            c.isNotNull() & _contains_any(c, SAPPHIRE_OOS_INDICATORS), F.lit("無庫存")
        )
        .when(
            c.isNotNull() & _contains_any(c, SAPPHIRE_IN_STOCK_INDICATORS),
            F.lit("有庫存"),
        )
        .when(p.isNotNull() & p.rlike("[0-9]"), F.lit("有庫存"))
        .otherwise(F.lit("需確認庫存"))
    )


def sapphire_in_stock(element_text: Column | str, price_text: Column | str) -> Column:
    return sapphire_stock_state(element_text, price_text) == "有庫存"


# D6b — Sapphire standalone status-text parse (sapphire.py:584-596). The
# reference calls this only from get_product_details, a path the active
# search flow never triggers for stock — kept as a tested parity surface,
# not wired into extract_products (wiring it would invent behavior the
# reference doesn't have).
def sapphire_parse_stock_status(status_text: Column | str) -> Column:
    c = _col(status_text)
    return (
        F.when(c.isNull() | (c == ""), F.lit("需確認庫存"))
        .when(
            _contains_any(c, ["out", "sold", "unavailable", "缺貨", "售完"]),
            F.lit("無庫存"),
        )
        .when(
            _contains_any(c, ["in stock", "available", "有庫存", "現貨"]),
            F.lit("有庫存"),
        )
        .otherwise(F.lit("需確認庫存"))
    )


# D4b — Sinya DETAIL-page stock check (sinya.py:244-301,
# `_check_product_stock_detail`): the escalation target for 需確認庫存
# search rows. Priority: explicit OOS indicators anywhere in the page text
# → 缺貨; explicit in-stock indicators → 有庫存; a cart button → 有庫存;
# otherwise the conservative default 缺貨 (sinya.py:294-296).
SINYA_DETAIL_OOS_INDICATORS = [
    "補貨中", "缺貨", "無庫存", "貨到通知", "預購", "到貨通知",
    "暫無庫存", "售完", "停售", "未上市", "貨到通知我",
    "暫停供應", "暫時缺貨", "等待到貨",
]
SINYA_DETAIL_IN_STOCK_INDICATORS = [
    "加入購物車", "立即結帳", "立即購買", "現貨", "庫存充足",
    "可購買", "有庫存",
]


def sinya_detail_stock_state(page_text: Column, has_cart_button: Column) -> Column:
    return (
        F.when(
            page_text.isNotNull()
            & _contains_any(page_text, SINYA_DETAIL_OOS_INDICATORS, lowercase=False),
            F.lit("缺貨"),
        )
        .when(
            page_text.isNotNull()
            & _contains_any(
                page_text, SINYA_DETAIL_IN_STOCK_INDICATORS, lowercase=False
            ),
            F.lit("有庫存"),
        )
        .when(F.coalesce(has_cart_button, F.lit(False)), F.lit("有庫存"))
        .otherwise(F.lit("缺貨"))
    )


def sinya_detail_in_stock(page_text: Column, has_cart_button: Column) -> Column:
    return sinya_detail_stock_state(page_text, has_cart_button) == "有庫存"


# D7 — CoolPC 專案/bundle detector (coolpc.py:158-171).
COOLPC_BUNDLE_KEYWORDS = [
    "專案", "需搭配", "cpu合購", "[需搭配", "[專案",
    "搭配主板", "搭配cpu", "限定搭配", "合購優惠",
    "f主板", "fcpu", "f搭配",
]


def coolpc_is_bundle(name: Column | str) -> Column:
    return _contains_any(_col(name), COOLPC_BUNDLE_KEYWORDS)


# D9 — PChome bundle detector (pchome.py:191-245).
PCHOME_BUNDLE_KEYWORDS = [
    "組合包", "套組", "套裝", "組合", "套餐", "大組包",
    "加購", "搭配", "含", "附", "贈",
    "組合價", "套餐價", "加贈", "贈送",
    "限量組合", "特惠組合", "超值組合", "精選組合",
    "combo", "bundle", "set", "package",
    "買送", "購送", "送", "加1元多1件",
    "第二件", "2件", "兩件", "三件", "四件", "五件",
    "整組", "全套", "完整組合", "優惠組", "超值組",
    "電競機", "電腦主機", "整機", "桌機", "桌上型電腦",
    "主機板平台", "平台", "水冷獨顯", "獨顯水冷",
    "筆電", "筆記型電腦", "laptop", "notebook",
    "工作站", "workstation", "迷你電腦", "mini pc",
    "升級版", "豪華版", "旗艦版", "限定版",
    "合購", "搭機", "搭購", "限搭", "組裝價",
    "雙螢幕", "雙顯示器", "三螢幕", "多螢幕",
    "經濟組", "標準組", "進階組", "旗艦組",
    "入門組", "基本組", "完整組", "全配組",
    "豪華組", "精選組", "專業組", "商務組",
]
PCHOME_MULTI_PRODUCT_RE = (
    r"\+\s*\w+|＋\s*\w+|含\s*\w+|送\s*\w+|\d+件|\d+組|第\d+件"
    r"|加購.*\d+元|限時.*組合|特價.*組合"
)


def pchome_is_bundle(name: Column | str) -> Column:
    c = _col(name)
    return _contains_any(c, PCHOME_BUNDLE_KEYWORDS) | c.rlike(
        "(?U)" + PCHOME_MULTI_PRODUCT_RE
    )


# D10 — AUTOBUY bundle detector, full data parity with
# autobuy.py:204-278 (`_is_bundle_product`). Decision procedure, in the
# reference's exact order:
#   0. empty/None name → False
#   1. any of the 50 indicators in lower(name) → True
#   2. if the name contains '+' or '＋':
#        a. ≥2 plus signs → True
#        b. model-suffix plus ("NITRO+ ", "XT + …", autobuy.py:241-245):
#           bundle only if the escalation regex (plus followed by a hardware
#           component) also matches — combo patterns are NOT consulted on
#           this branch (they live in the reference's `else`)
#        c. otherwise: any of the 12 combo patterns → True
#   3. any quantity pattern (\d+件/\d+組/… autobuy.py:268-276) → True
AUTOBUY_BUNDLE_INDICATORS = [
    # autobuy.py:212-227 — verbatim, checked against lower(name)
    "套裝", "組合", "搭配", "搭機", "搭購",
    "限搭", "組裝價", "合購", "優惠組", "超值組",
    "整機", "套餐", "方案", "組合包", "大組包",
    "電競機", "電腦主機", "桌機", "筆電",
    "筆記型電腦", "laptop", "notebook",
    "組合價", "特惠組", "精選組", "豪華組",
    "買送", "贈送", "加購", "含", "附",
    "平台", "主機板平台", "處理器平台",
    "水冷獸", "水冷獨顯", "獨顯水冷",
    "mpk",  # AMD Multi-Pack Kit
    "經濟組", "標準組", "進階組", "旗艦組",
    "入門組", "基本組", "完整組", "全配組",
    "限量組", "限定組", "專業組", "商務組",
]
_AUTOBUY_MODEL_TOKENS = r"(nitro|gaming|oc|ti|super|xt|gre|steel|legend|taichi|prime)"
# (?U) makes Java's \s Unicode (matching Python re's \s); the DuckDB mirror
# uses plain \s (RE2 has no (?U)) — safe because oracle inputs only carry
# ASCII whitespace.
AUTOBUY_MODEL_SUFFIX_RE = rf"(?U)(?i){_AUTOBUY_MODEL_TOKENS}\s*\+\s*?(?:\s|$)"
AUTOBUY_MODEL_ESCALATION_RE = (
    rf"(?U)(?i){_AUTOBUY_MODEL_TOKENS}\s*\+.*(?:主機板|記憶體|硬碟|電源|螢幕|cpu|處理器)"
)
_AUTOBUY_COMBO_PARTS = [
    # autobuy.py:248-261 — verbatim
    r"\+.*(?:主機板|mb|motherboard|b760|b850|z790|x670|x870)",
    r"\+.*(?:記憶體|ram|memory|ddr4|ddr5)",
    r"\+.*(?:硬碟|ssd|hdd|storage)",
    r"\+.*(?:電源|psu|power)",
    r"\+.*(?:螢幕|monitor|顯示器)",
    r"\+.*(?:鍵盤|keyboard)",
    r"\+.*(?:滑鼠|mouse)",
    r"\+.*(?:cpu|處理器|intel|amd|i5|i7|i9|ryzen)",
    r"\+.*(?:散熱器|cooler|風扇)",
    r"\+.*(?:機殼|case)",
    r"\+.*(?:華擎|asus|msi|技嘉|微星|gigabyte|asrock)",
    r"(?:主機板|記憶體|硬碟|電源|螢幕|鍵盤|滑鼠|cpu|散熱器|機殼|intel|amd|i5|i7|i9|ryzen).*\+",
]
AUTOBUY_COMBO_RE = "(?i)" + "|".join(f"(?:{p})" for p in _AUTOBUY_COMBO_PARTS)
_AUTOBUY_QTY_PARTS = [
    # autobuy.py:268-276 — verbatim
    r"\d+件", r"\d+組", r"\d+套",
    r"第\d+件", r"兩件", r"三件", r"四件",
    r"雙.*組合", r"三.*組合", r"四.*組合",
]
AUTOBUY_QTY_RE = "(?i)" + "|".join(f"(?:{p})" for p in _AUTOBUY_QTY_PARTS)


def autobuy_is_bundle(name: Column | str) -> Column:
    c = _col(name)
    indicator = _contains_any(c, AUTOBUY_BUNDLE_INDICATORS)
    has_plus = c.contains("+") | c.contains("＋")
    plus_count = F.size(F.split(c, r"[+＋]", -1)) - 1
    plus_branch = has_plus & (
        (plus_count >= 2)
        | F.when(
            c.rlike(AUTOBUY_MODEL_SUFFIX_RE), c.rlike(AUTOBUY_MODEL_ESCALATION_RE)
        ).otherwise(c.rlike(AUTOBUY_COMBO_RE))
    )
    return F.when(c.isNull() | (c == ""), F.lit(False)).otherwise(
        indicator | plus_branch | c.rlike(AUTOBUY_QTY_RE)
    )


# D11 — Sinya's own bundle detector (sinya.py:332-385): 30+ explicit
# indicators, then (only when a plus sign is present) 14 combo regexes and a
# motherboard-chipset×plus heuristic. Lists/patterns are data parity; note
# the combo regexes use HALF-width '+' only (as in the reference) while the
# presence gate accepts either width, and the chipset keywords are matched
# case-SENSITIVELY (`if keyword in product_name`, sinya.py:381-384).
SINYA_BUNDLE_INDICATORS = [
    "【救贖】", "【套裝】", "【組合】", "【搭配】", "【配套】", "【組裝價】",
    "套裝", "組合", "搭配", "配套", "組裝價", "超值組", "大組包",
    "救贖", "組裝機", "整機", "主機", "套餐",
    "經濟組", "標準組", "進階組", "旗艦組",
    "入門組", "基本組", "完整組", "全配組",
    "豪華組", "精選組", "專業組", "商務組",
]
_SINYA_COMBO_PARTS = [
    r"[^+]*\+.*(?:電源|PSU|Power)",
    r"[^+]*\+.*(?:主機板|MB|Motherboard|主板)",
    r"[^+]*\+.*(?:CPU|處理器)",
    r"[^+]*\+.*(?:記憶體|RAM|Memory)",
    r"[^+]*\+.*(?:硬碟|SSD|HDD)",
    r"[^+]*\+.*(?:螢幕|Monitor|顯示器)",
    r"(?:電源|PSU|Power).*\+",
    r"(?:主機板|MB|Motherboard|主板).*\+",
    r"(?:CPU|處理器).*\+",
    r"(?:記憶體|RAM|Memory).*\+",
    r"(?:硬碟|SSD|HDD).*\+",
    r"(?:螢幕|Monitor|顯示器).*\+",
    r"\+.*(?:華擎|ASUS|技嘉|微星|MSI|ASRock|GIGABYTE).*(?:X870|B650|Z790|B760|X670|B550|X570|Z690)",
    r"(?:華擎|ASUS|技嘉|微星|MSI|ASRock|GIGABYTE).*(?:X870|B650|Z790|B760|X670|B550|X570|Z690).*\+",
]
SINYA_COMBO_RE = "(?i)" + "|".join(f"(?:{p})" for p in _SINYA_COMBO_PARTS)
SINYA_MB_CHIPSETS = [
    "X870E", "X870", "B650", "Z790", "B760", "X670", "B550", "X570",
    "Z690", "X399", "TRX40",
]


def sinya_is_bundle(name: Column | str) -> Column:
    c = _col(name)
    has_plus = c.contains("+") | c.contains("＋")
    return (
        _contains_any(c, SINYA_BUNDLE_INDICATORS)
        | (has_plus & c.rlike(SINYA_COMBO_RE))
        | (has_plus & _contains_any(c, SINYA_MB_CHIPSETS, lowercase=False))
    )


# D12 — standalone heuristic fallback (product_matcher.py:152-196); used
# only when is_bundle is absent (main.py:211-216).
STANDALONE_COMBO_KEYWORDS = [
    "電腦", "主機", "桌機", "pc", "desktop", "nuc", "迷你電腦",
    "筆電", "筆記型電腦", "laptop", "notebook",
    "工作站", "workstation",
    "套裝", "組合", "套組", "救贖", "升級版", "雙碟版",
    "rog strix scar", "rog strix g", "tuf gaming a", "tuf gaming f",
    "predator", "legion", "alienware", "pavilion",
    "stealth", "creator", "crosshair", "katana", "vector",
    "aorus master", "aorus elite", "infinite x", "aegis",
    "rog nuc", "intel nuc", "mini pc",
    "ryzen", "intel", "i5", "i7", "i9", "ddr", "ssd", "hdd",
    "記憶體", "硬碟", "散熱器", "電源", "機殼", "ultra 9", "ultra",
    "w11", "windows", "win10", "win11",
    "32g", "64g", "1tb", "2tb", "16g/", "32g/", "64g/",
]
HARDWARE_COMPONENTS = [
    "cpu", "gpu", "ram", "ssd", "hdd", "psu", "mb", "motherboard",
    "處理器", "顯示卡", "記憶體", "硬碟", "電源", "主機板",
]


def is_standalone(name: Column | str) -> Column:
    c = F.lower(_col(name))
    combo = _contains_any(c, STANDALONE_COMBO_KEYWORDS)
    comps = F.array(*[F.lit(k) for k in HARDWARE_COMPONENTS])
    n_comps = F.aggregate(
        comps, F.lit(0), lambda acc, k: acc + F.when(c.contains(k), 1).otherwise(0)
    )
    return ~combo & (n_comps < 2)


# D4 — Sinya 3-state stock (sinya.py:219-242): stock field wins; then
# display_price_status / name OOS keywords; default 需確認庫存. Only
# 有庫存 maps to in_stock=True (sinya.py:389-391).
def sinya_stock_state(stock: Column, status: Column, name: Column) -> Column:
    status_oos = (
        status.isNotNull()
        & _contains_any(status.cast("string"), ["缺貨", "無庫存", "補貨中"], lowercase=False)
    )
    name_oos = name.isNotNull() & _contains_any(
        name, ["補貨中", "缺貨", "售完"], lowercase=False
    )
    return (
        F.when(
            stock.isNotNull(),
            F.when(stock.cast("string") == "0", F.lit("缺貨")).otherwise(
                F.lit("有庫存")
            ),
        )
        .when(status_oos, F.lit("缺貨"))
        .when(name_oos, F.lit("缺貨"))
        .otherwise(F.lit("需確認庫存"))
    )


def sinya_in_stock(stock: Column, status: Column, name: Column) -> Column:
    return sinya_stock_state(stock, status, name) == "有庫存"


# D5 — Sunfar field-priority stock (sunfar.py:184-225): pos_qty>0 → buy flag
# → prodseqstate_no=='1' → any price>0 → default True.
def sunfar_in_stock(pos_qty: Column, buy: Column, state_no: Column, price: Column) -> Column:
    return (
        F.when(pos_qty.isNotNull(), pos_qty > 0)
        .when(buy.isNotNull(), F.lower(buy.cast("string")).isin("1", "true", "y", "yes"))
        .when(state_no.isNotNull(), state_no == "1")
        .when(price.isNotNull(), price > 0)
        .otherwise(F.lit(True))
    )


# ---------------------------------------------------------------------------
# Disabled-store stock predicates (P16/P18). momo, sanjing, and gh3c are
# DISABLED in the reference registry (their constructors crash —
# main.py:49-52), so nothing wires these into the active products view;
# they are full data parity for the day the stores are re-enabled, used by
# extraction.disabled_store_products and its oracle queries.
# ---------------------------------------------------------------------------

# momo._check_stock_status (momo.py:225-253): OOS regex over every text node
# (IGNORECASE), then the buy-button text/disabled check (MOMO_BUTTON_OOS_RE
# above), default True. The reference's CSS-class signals (soldOut/outStock/
# noStock, disabled attr) are folded into the card's ``stock`` span text by
# the span emitter, same convention as every other card store here.
MOMO_OOS_TEXT_RE = (
    r"(?i)缺貨|售完|補貨中|暫停供應|停產|預購|無庫存|out.*stock|sold.*out"
    r"|暫不供貨|現貨不足"
)


def momo_in_stock(card_texts: Column, button_text: Column | str) -> Column:
    """``card_texts``: array<string> of the card's text nodes. Per-node
    regex match (``find_all(text=...)`` semantics), never a concat."""
    oos = F.exists(card_texts, lambda t: t.isNotNull() & t.rlike(MOMO_OOS_TEXT_RE))
    return ~oos & buy_button_in_stock(button_text, MOMO_BUTTON_OOS_RE)


# gh3c._check_stock_status (gh3c.py:175-210): momo's OOS set plus 暫時缺貨,
# a wider button OOS set (聯絡我們), and an inquiry-pricing check (詢價/電洽/
# 來電詢問 anywhere in the card text → not purchasable → False).
GH3C_OOS_TEXT_RE = (
    r"(?i)缺貨|售完|補貨中|暫停供應|停產|預購|無庫存|out.*stock|sold.*out"
    r"|現貨不足|暫時缺貨"
)
GH3C_BUTTON_OOS_RE = r"缺貨|補貨|售完|暫停|無法購買|聯絡我們"
GH3C_INQUIRY_RE = r"詢價|電洽|來電詢問"


def gh3c_in_stock(card_texts: Column, button_text: Column | str) -> Column:
    oos = F.exists(card_texts, lambda t: t.isNotNull() & t.rlike(GH3C_OOS_TEXT_RE))
    inquiry = F.exists(
        card_texts, lambda t: t.isNotNull() & t.rlike(GH3C_INQUIRY_RE)
    )
    return ~oos & ~inquiry & buy_button_in_stock(button_text, GH3C_BUTTON_OOS_RE)
