"""Span extraction — the documents table → canonical products view
(SURVEY.md §2.2 P2-P18). All pure DataFrame ops: explode + window +
conditional aggregation ("pivot by span kind") + from_json for the embedded
JSON archetypes. No Python UDFs anywhere in this module.

Store archetypes:
  * coolpc  — ``option`` spans, regex price/name split (coolpc.py:220-270).
  * sinya   — embedded JSON array in a ``json`` span (sinya.py:29-136).
  * sunfar  — ``var Search_data`` JSON, ptlist items, coalesce price fields,
              field-priority stock (sunfar.py:79-225), id-based dedup
              (sunfar.py:49-71).
  * cards   — dtsource/autobuy/sapphire/pchome: title/price/link/image/
              stock/button span groups per item (pchome.py:65-164 et al.).
  * sapphire pixel fallback — FB-pixel triples (sapphire.py:146-192), used
              by the reference only when the HTML card parse yields nothing.

Ordering: every product carries ``seq`` = parent doc seq_key || hex(offset)
— the deterministic total order that downstream sorts/top-k tie-break on
(SURVEY §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from price_crawler_spark.functions.names import (
    collapse_spaces,
    coolpc_clean_name,
    unescape_entities,
)
from price_crawler_spark.functions.prices import extract_price
from price_crawler_spark.operators import predicates as P

CARD_STORES = ["dtsource", "autobuy", "sapphire", "pchome"]

PRODUCT_COLS = [
    "store",
    "product_name",
    "price",
    "url",
    "in_stock",
    "currency",
    "image_url",
    "specifications",
    "is_bundle",
    "doc_id",
    "seq",
]


def _seq(seq_key, offset) -> F.Column:
    return F.concat(seq_key, F.lpad(F.conv(offset.cast("string"), 10, 16), 8, "0"))


def _spans(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "store", "seq_key", F.explode("spans").alias("span")
    ).select("doc_id", "store", "seq_key", "span.*")


def _title_grouped(s: DataFrame) -> DataFrame:
    """Card-item delimiting shared by every HTML-card parse: items start at
    their ``title`` span, so item_idx = running title count per doc (window
    over offset — partitions are single documents, so the window is
    narrow); spans before the first title belong to no item and drop."""
    w = Window.partitionBy("doc_id").orderBy("offset")
    return s.withColumn(
        "item_idx",
        F.sum(F.when(F.col("kind") == "title", 1).otherwise(0)).over(w) - 1,
    ).filter(F.col("item_idx") >= 0)


def _of(kind: str, col: str) -> F.Column:
    """Conditional-max aggregator: the value of span ``kind``'s ``col``
    within a (doc, item) group."""
    return F.max(F.when(F.col("kind") == kind, F.col(col)))


def coolpc_products(docs: DataFrame) -> DataFrame:
    """P2/P3: OPTION spans → products; keep rows with '$' and len>10
    (coolpc.py:69-81), price = $(\\d+), name = text minus price suffix."""
    s = _spans(docs.filter(F.col("store") == "coolpc")).filter(
        (F.col("kind") == "option")
        & F.col("text").contains("$")
        & (F.length("text") > 10)
    )
    name_raw = F.trim(F.regexp_replace(F.col("text"), r",?\s*\$\d+.*$", ""))
    out = (
        s.withColumn("price", F.regexp_extract("text", r"\$(\d+)", 1).cast("double"))
        .withColumn("product_name", coolpc_clean_name(name_raw))
        .filter((F.col("price") > 0) & (F.col("product_name") != ""))
        .withColumn("url", F.lit("https://www.coolpc.com.tw/evaluate.php"))
        .withColumn("in_stock", F.lit(True))
        .withColumn("currency", F.lit("TWD"))
        .withColumn("image_url", F.lit(None).cast("string"))
        .withColumn("specifications", F.lit(None).cast("string"))
        .withColumn("is_bundle", P.coolpc_is_bundle("product_name"))
        .withColumn("seq", _seq(F.col("seq_key"), F.col("offset")))
    )
    return out.select(*PRODUCT_COLS)


def coolpc_js_arrays(html) -> F.Column:
    """P4: CoolPC JS price-array scan (coolpc.py:42-61,
    ``_parse_js_arrays``). DEAD CODE in the reference — never called from
    ``search_products`` — implemented for coverage with the reference's
    exact quirks, fuzz-parity-gated against the pinned reference method:

      * three regexes over the raw page: ``c<k>=[ints]``, ``g<k>=[floats]``,
        ``Header=[digits/brackets/commas]``, scanned in that order;
      * the reference's ``len(match) == 2`` guard is a no-op for c/g
        (findall yields 2-tuples) but for Header it tests the captured
        data STRING — only exactly-2-char payloads survive, and
        ``match[1]`` (the payload's SECOND character) is what gets split;
      * elements ``''`` and ``'0'`` become 0, everything else ``float``;
      * duplicate array names: last occurrence wins (dict overwrite).
        DELIBERATE order divergence (ADVICE r4): the kept entry surfaces at
        its LAST occurrence's position, whereas the reference's dict keeps
        first-insertion order with the updated value. Unobservable today —
        the parity test compares dicts and all consumers explode
        order-insensitively — documented so the drift is a decision, not an
        accident. If entry order ever becomes significant, re-sort kept
        entries by each name's FIRST occurrence position.

    Returns ``array<struct<array_name:string, values:array<double>>>`` —
    pure expression chain (regexp_extract_all + higher-order functions),
    no Python in the loop.
    """
    h = F.col(html) if isinstance(html, str) else html

    def ent(name, data):
        return F.struct(name.alias("array_name"), data.alias("data"))

    c = F.transform(
        F.regexp_extract_all(h, F.lit(r"c(\d+)=\[([\d,]+)\]"), F.lit(0)),
        lambda m: ent(
            F.concat(F.lit("c"), F.regexp_extract(m, r"^c(\d+)=", 1)),
            F.regexp_extract(m, r"\[([\d,]+)\]", 1),
        ),
    )
    g = F.transform(
        F.regexp_extract_all(h, F.lit(r"g(\d+)=\[([\d\.,]+)\]"), F.lit(0)),
        lambda m: ent(
            F.concat(F.lit("g"), F.regexp_extract(m, r"^g(\d+)=", 1)),
            F.regexp_extract(m, r"\[([\d\.,]+)\]", 1),
        ),
    )
    hdr = F.transform(
        F.filter(
            F.regexp_extract_all(h, F.lit(r"Header=\[([\d\[\],]+)\]"), F.lit(1)),
            lambda d: F.length(d) == 2,
        ),
        lambda d: ent(F.lit("Header"), F.substring(d, 2, 1)),
    )
    tagged = F.transform(
        F.concat(c, g, hdr),
        lambda e, i: F.struct(
            e["array_name"].alias("array_name"), e["data"].alias("data"),
            i.alias("pos"),
        ),
    )
    # dict-overwrite semantics: keep an entry only if no LATER entry shares
    # its name (handful of arrays per page — the quadratic is per-row tiny)
    last = F.filter(
        tagged,
        lambda e: ~F.exists(
            tagged,
            lambda o: (o["array_name"] == e["array_name"]) & (o["pos"] > e["pos"]),
        ),
    )
    return F.transform(
        last,
        lambda e: F.struct(
            e["array_name"].alias("array_name"),
            F.transform(
                F.split(e["data"], ","),
                lambda x: F.when((x == "") | (x == "0"), F.lit(0.0))
                .otherwise(x.cast("double")),
            ).alias("values"),
        ),
    )


def card_products(docs: DataFrame) -> DataFrame:
    """P10/P15: card spans → one row per item. Items are delimited by their
    ``title`` span: item_idx = running count of titles per doc (window over
    offset — partitions are single documents, so the window is narrow)."""
    # only search-result pages: detail pages (second hop, S4) carry no price
    # span and must ENRICH the parent row, never become products themselves
    # (the reference's detail fetch refines stock/specs — dtsource.py:140-153,
    # sunfar.py:239-282)
    is_search_page = F.exists("spans", lambda s: s.getField("kind") == F.lit("price"))
    s = _spans(
        docs.filter(F.col("store").isin(CARD_STORES)).filter(is_search_page)
    ).filter(
        F.col("kind").isin("title", "price", "link", "image", "stock", "button")
    )
    s = _title_grouped(s)

    grp = s.groupBy("doc_id", "store", "seq_key", "item_idx").agg(
        _of("title", "text").alias("name_raw"),
        _of("price", "text").alias("price_text"),
        _of("link", "media_ref").alias("url"),
        _of("image", "media_ref").alias("image_url"),
        _of("stock", "text").alias("stock_text"),
        _of("button", "text").alias("button_text"),
        F.min(F.when(F.col("kind") == "title", F.col("offset"))).alias("item_offset"),
    )

    name = collapse_spaces(F.col("name_raw"))
    base_stock = P.is_in_stock(F.col("stock_text"))
    # D6: sapphire judges the whole card element's text (name + stock +
    # button) with its own in/out lists and a price-presence fallback
    # (sapphire.py:529-563) — not the generic D1 list.
    sapphire_element = F.concat_ws(
        " ", F.col("name_raw"), F.col("stock_text"), F.col("button_text")
    )
    # D3 (pchome.py:166-189): the reference scans the OOS regex over every
    # text node of the card — name, price, stock AND button — and defaults
    # to in-stock when no text matches (so a null stock span is True, and
    # 補貨中/停產/暫不供貨 cards are False; ADVICE r2 medium).
    pchome_card_texts = F.array(
        F.col("name_raw"), F.col("price_text"), F.col("stock_text"),
        F.col("button_text"),
    )
    in_stock = (
        F.when(F.col("store") == "dtsource", base_stock & P.dtsource_in_stock(name))
        .when(
            F.col("store") == "pchome",
            P.pchome_in_stock(pchome_card_texts, F.col("button_text")),
        )
        .when(
            F.col("store") == "sapphire",
            P.sapphire_in_stock(sapphire_element, F.col("price_text")),
        )
        .otherwise(base_stock)
    )
    is_bundle = (
        F.when(F.col("store") == "pchome", P.pchome_is_bundle(name))
        .when(F.col("store") == "autobuy", P.autobuy_is_bundle(name))
        .otherwise(F.lit(False))
    )
    out = (
        grp.withColumn("product_name", name)
        .withColumn("price", extract_price(F.col("price_text")))
        .withColumn("in_stock", in_stock)
        .withColumn("currency", F.lit("TWD"))
        .withColumn("specifications", F.lit(None).cast("string"))
        .withColumn("is_bundle", is_bundle)
        .withColumn("seq", _seq(F.col("seq_key"), F.col("item_offset")))
        .filter(F.col("product_name").isNotNull() & (F.col("product_name") != ""))
    )
    return out.select(*PRODUCT_COLS)


SINYA_ITEM_SCHEMA = (
    "array<struct<prod_title:string,new_price:string,old_price:string,"
    "href:string,image:string,prod_subtitle:string,stock:int,"
    "display_price_status:string>>"
)


def sinya_products(docs: DataFrame, with_state: bool = False) -> DataFrame:
    """P5 + D4 + D11: ``const results = [...]`` JSON; stock 3-state collapsed
    to in_stock only for the '有庫存' state (sinya.py:219-242, 389-391);
    sinya's OWN bundle detector (sinya.py:332-385).

    ``with_state=True`` (used by :func:`extract_products`) keeps the raw
    ``stock_state`` column so the detail-page escalation (sinya.py:244-301:
    需確認庫存 rows re-checked on their detail page, conservative default
    缺貨) can be applied after the detail join."""
    s = _spans(docs.filter(F.col("store") == "sinya")).filter(
        (F.col("kind") == "json") & F.col("text").contains("const results")
    )
    payload = F.regexp_extract(F.col("text"), r"const results = (\[.*\]);", 1)
    items = s.select(
        "doc_id",
        "store",
        "seq_key",
        F.posexplode(F.from_json(payload, SINYA_ITEM_SCHEMA)).alias("pos", "p"),
    )
    state = P.sinya_stock_state(
        F.col("p.stock"),
        F.col("p.display_price_status"),
        F.col("p.prod_title"),
    )
    out = (
        items.withColumn("product_name", collapse_spaces(F.col("p.prod_title")))
        .withColumn("price", F.col("p.new_price").cast("double"))
        .withColumn("url", F.col("p.href"))
        .withColumn("image_url", F.col("p.image"))
        .withColumn("stock_state", state)
        .withColumn("in_stock", F.col("stock_state") == "有庫存")
        .withColumn("currency", F.lit("TWD"))
        .withColumn("specifications", F.col("p.prod_subtitle"))
        .withColumn("is_bundle", P.sinya_is_bundle("product_name"))
        .withColumn("seq", _seq(F.col("seq_key"), F.col("pos")))
    )
    cols = PRODUCT_COLS + (["stock_state"] if with_state else [])
    return out.select(*cols)


def sinya_extract_price_int(price_text: F.Column) -> F.Column:
    """P7 price rule (sinya.py:203-216): strip everything but digits and
    commas, drop commas, integer — 0 (not null) when nothing remains."""
    digits = F.regexp_replace(
        F.regexp_replace(price_text, r"[^\d,]", ""), ",", ""
    )
    return F.coalesce(
        F.when(digits != "", digits.cast("long")), F.lit(0)
    )


def sinya_html_fallback_products(
    docs: DataFrame, json_products: DataFrame | None = None
) -> DataFrame:
    """P7 (sinya.py:138-200): backup HTML card parse, used ONLY for sinya
    pages whose embedded-JSON parse (P5) yielded ZERO products — the
    reference falls back whenever the parsed list comes back empty
    (sinya.py:29-136), which covers a missing ``const results`` span, a
    present-but-empty ``const results = [];``, and malformed JSON alike
    (ADVICE r2). Gate = left-anti join on the doc_ids that DID produce
    JSON rows (both sides keyed by doc_id; Catalyst/AQE picks the join
    strategy). Name from the title-ish element, price via sinya's integer
    extraction, url absolutized against the sinya base, availability
    defaults 有庫存, and rows survive only with a name AND price > 0
    (sinya.py:181-190).

    ``json_products`` lets :func:`extract_products` reuse its already-built
    P5 DataFrame instead of re-deriving it."""
    sinya_docs = docs.filter(F.col("store") == "sinya")
    if json_products is None:
        json_products = sinya_products(docs)
    parsed_ids = json_products.select("doc_id").distinct()
    s = _spans(
        sinya_docs.join(parsed_ids, "doc_id", "left_anti")
    ).filter(F.col("kind").isin("title", "price", "link"))
    s = _title_grouped(s)

    grp = s.groupBy("doc_id", "store", "seq_key", "item_idx").agg(
        _of("title", "text").alias("name_raw"),
        _of("price", "text").alias("price_text"),
        _of("link", "media_ref").alias("href"),
        F.min(F.when(F.col("kind") == "title", F.col("offset"))).alias("item_offset"),
    )
    base = F.lit("https://www.sinya.com.tw")
    name = collapse_spaces(F.col("name_raw"))
    price = sinya_extract_price_int(F.col("price_text"))
    out = (
        grp.withColumn("product_name", name)
        .withColumn("price", price.cast("double"))
        .withColumn(
            "url",
            F.when(F.col("href").isNull(), F.lit(""))
            .when(F.col("href").rlike("^https?://"), F.col("href"))
            .otherwise(F.concat(base, F.col("href"))),
        )
        .withColumn("in_stock", F.lit(True))  # availability default 有庫存
        .withColumn("currency", F.lit("TWD"))
        .withColumn("image_url", F.lit(None).cast("string"))
        .withColumn("specifications", F.lit(None).cast("string"))
        .withColumn("is_bundle", P.sinya_is_bundle("product_name"))
        .withColumn("seq", _seq(F.col("seq_key"), F.col("item_offset")))
        .filter(
            F.col("product_name").isNotNull()
            & (F.col("product_name") != "")
            & (F.col("price") > 0)
        )
    )
    return out.select(*PRODUCT_COLS)


SUNFAR_SCHEMA = (
    "struct<ptlist:array<struct<pname:string,prod_price:string,"
    "mem_price1:string,search_price2_da:string,id:string,ps:string,"
    "bd:string,pos_qty:int,buy:string,prodseqstate_no:string>>>"
)


def sunfar_products(docs: DataFrame) -> DataFrame:
    """P8/P9 + D5 + J2: Search_data JSON → ptlist items; price coalesce over
    3 fields (sunfar.py:127-182); first-wins dedup by product id
    (sunfar.py:49-71)."""
    s = _spans(docs.filter(F.col("store") == "sunfar")).filter(
        (F.col("kind") == "json") & F.col("text").contains("Search_data")
    )
    payload = F.regexp_extract(F.col("text"), r"var Search_data = (\{.*\});", 1)
    items = s.select(
        "doc_id",
        "store",
        "seq_key",
        F.posexplode(F.from_json(payload, SUNFAR_SCHEMA).getField("ptlist")).alias(
            "pos", "p"
        ),
    )
    price = F.coalesce(
        F.col("p.prod_price").cast("double"),
        F.col("p.mem_price1").cast("double"),
        F.col("p.search_price2_da").cast("double"),
    )
    out = (
        items.withColumn("product_name", collapse_spaces(F.col("p.pname")))
        .withColumn("price", price)
        .withColumn(
            "url",
            F.format_string(
                "https://www.isunfar.com.tw/product/proddetail.aspx?id=%s",
                F.col("p.id"),
            ),
        )
        .withColumn("image_url", F.col("p.ps"))
        .withColumn(
            "in_stock",
            P.sunfar_in_stock(
                F.col("p.pos_qty"), F.col("p.buy"), F.col("p.prodseqstate_no"), price
            ),
        )
        .withColumn("currency", F.lit("TWD"))
        .withColumn("specifications", F.col("p.bd"))
        .withColumn("is_bundle", F.lit(False))
        .withColumn("seq", _seq(F.col("seq_key"), F.col("pos")))
        .withColumn(
            "pid",
            F.coalesce(
                F.nullif(F.col("p.id"), F.lit("")),
                F.concat_ws("_", "product_name", F.col("price").cast("string")),
            ),
        )
    )
    # J2 first-wins by insertion order (seq)
    w = Window.partitionBy("pid").orderBy("seq")
    out = out.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
    return out.select(*PRODUCT_COLS)


def sapphire_pixel_products(docs: DataFrame) -> DataFrame:
    """P11: FB-pixel mining — {"id":N,"price":F,"quantity":Q} triples →
    placeholder-named products (sapphire.py:146-192). The reference uses
    this only when the HTML card parse finds nothing; exposed as its own
    operator and unit-tested."""
    s = _spans(docs.filter(F.col("store") == "sapphire")).filter(
        F.col("kind") == "pixel"
    )
    triple = s.select(
        "doc_id",
        "store",
        "seq_key",
        F.posexplode(
            F.regexp_extract_all(
                F.col("text"),
                F.lit(r'\{"id":(\d+),"price":([0-9.]+),"quantity":(\d+)\}'),
                0,
            )
        ).alias("pos", "t"),
    )
    parsed = triple.select(
        "doc_id",
        "store",
        "seq_key",
        "pos",
        F.regexp_extract("t", r'"id":(\d+)', 1).alias("pid"),
        F.regexp_extract("t", r'"price":([0-9.]+)', 1).cast("double").alias("price"),
        F.regexp_extract("t", r'"quantity":(\d+)', 1).cast("int").alias("qty"),
    )
    out = (
        parsed.withColumn(
            "product_name", F.concat(F.lit("藍寶石產品 #"), F.col("pid"))
        )
        .withColumn("url", F.concat(F.lit("https://sapphiretech.cyberbiz.co/search?q="), F.col("pid")))
        .withColumn("in_stock", F.col("qty") > 0)
        .withColumn("currency", F.lit("TWD"))
        .withColumn("image_url", F.lit(None).cast("string"))
        .withColumn("specifications", F.lit(None).cast("string"))
        .withColumn("is_bundle", F.lit(False))
        .withColumn("seq", _seq(F.col("seq_key"), F.col("pos")))
    )
    return out.select(*PRODUCT_COLS)


def sapphire_enriched_products(docs: DataFrame) -> DataFrame:
    """P12 (sapphire.py:194-239): pixel products get real names from the
    page's title spans by POSITION — i-th pixel triple ↔ i-th title WITHIN
    the same page — via row_number windows partitioned by doc_id (alignment
    must never leak across documents: the reference matches inside one page)
    and a (doc_id, position) equi-join; missing names keep the placeholder.
    Mined names pass the F13 entity unescape (sapphire.py:211)."""
    pixel = sapphire_pixel_products(docs)
    w_p = Window.partitionBy("doc_id").orderBy("seq")
    pixel = pixel.withColumn("_pos", F.row_number().over(w_p))

    titles = _spans(docs.filter(F.col("store") == "sapphire")).filter(
        F.col("kind") == "title"
    )
    w_t = Window.partitionBy("doc_id").orderBy("offset")
    names = titles.select(
        "doc_id",
        unescape_entities(collapse_spaces(F.col("text"))).alias("real_name"),
        F.row_number().over(w_t).alias("_pos"),
    )
    return (
        pixel.join(names, ["doc_id", "_pos"], "left")
        .withColumn(
            "product_name", F.coalesce("real_name", "product_name")
        )
        .drop("_pos", "real_name")
        .select(*PRODUCT_COLS)
    )


def sapphire_rank_unpriced(products: DataFrame, cap: int = 10) -> DataFrame:
    """P14 (sapphire.py:270-295): priced products first (page order); then
    at most ``cap`` unpriced ones, and only those whose name carries a
    concrete model token (letters+digits) and is not a bare generic series.
    """
    priced = products.filter(F.col("price").isNotNull() & (F.col("price") > 0))
    concrete = F.col("product_name").rlike(r"[A-Za-z]+\s?\d{3,}")
    generic = F.col("product_name").rlike(r"(?i)^(radeon|rx|nitro|pulse)\s*(系列)?$")
    unpriced = (
        products.filter(F.col("price").isNull() | (F.col("price") <= 0))
        .filter(concrete & ~generic)
        # top-cap via orderBy().limit() — plans as TakeOrderedAndProject
        # (per-partition top-N + driver merge), never a single-partition
        # global window sort.
        .orderBy("seq")
        .limit(cap)
    )
    return priced.unionByName(unpriced).orderBy(
        F.desc(F.col("price").isNotNull() & (F.col("price") > 0)), F.asc("seq")
    )


_GENERIC_ITEM = (
    "name:string,title:string,product_name:string,product_title:string,"
    "price:string,current_price:string,selling_price:string,amount:string,"
    "id:string,product_id:string,sku:string,handle:string,"
    "url:string,link:string,href:string,product_url:string,"
    "image:string,image_url:string,thumbnail:string,photo:string"
)
GENERIC_JSON_SCHEMA = (
    f"struct<products:array<struct<{_GENERIC_ITEM}>>,"
    f"items:array<struct<{_GENERIC_ITEM}>>,"
    f"results:array<struct<{_GENERIC_ITEM}>>,"
    f"data:array<struct<{_GENERIC_ITEM}>>>"
)


def generic_json_products(docs: DataFrame) -> DataFrame:
    """P13 (sapphire.py:241-268, 302-380): permissive JSON product walk —
    the item array is whichever of products/items/results/data is present;
    every field is a coalesce over the reference's candidate-key lists
    (_get_json_value, sapphire.py:382-387). Emits the canonical product
    row; rows without any name candidate are dropped (parity with
    _parse_json_product returning None)."""
    s = _spans(docs).filter(
        (F.col("kind") == "json")
        & F.col("text").rlike(r'"(products|items|results|data)"\s*:')
    )
    parsed = F.from_json(F.col("text"), GENERIC_JSON_SCHEMA)
    items = F.coalesce(
        parsed.getField("products"),
        parsed.getField("items"),
        parsed.getField("results"),
        parsed.getField("data"),
    )
    ex = s.select(
        "doc_id", "store", "seq_key", F.posexplode(items).alias("pos", "p")
    )

    def _first(*keys: str) -> F.Column:
        cands = [
            F.when(
                F.col(f"p.{k}").isNotNull() & (F.col(f"p.{k}") != ""),
                F.col(f"p.{k}"),
            )
            for k in keys
        ]
        return F.coalesce(*cands)

    name = _first("name", "title", "product_name", "product_title")
    price = extract_price(
        _first("price", "current_price", "selling_price", "amount")
    )
    url = _first("url", "link", "href", "product_url")
    img = _first("image", "image_url", "thumbnail", "photo")
    base = F.lit("https://sapphiretech.cyberbiz.co/")
    out = (
        ex.filter(name.isNotNull())
        .withColumn("product_name", collapse_spaces(name))
        .withColumn("price", F.coalesce(price, F.lit(0.0)))
        .withColumn(
            "url",
            F.when(url.isNull(), F.lit(""))
            .when(url.rlike("^https?://"), url)
            .otherwise(F.concat(base, F.regexp_replace(url, "^/", ""))),
        )
        .withColumn("in_stock", F.lit(True))
        .withColumn("currency", F.lit("TWD"))
        .withColumn(
            "image_url",
            F.when(img.isNull() | img.rlike("^https?://"), img).otherwise(
                F.concat(base, F.regexp_replace(img, "^/", ""))
            ),
        )
        .withColumn("specifications", F.lit(None).cast("string"))
        .withColumn("is_bundle", F.lit(False))
        .withColumn("seq", _seq(F.col("seq_key"), F.col("pos")))
    )
    return out.select(*PRODUCT_COLS)


def spec_kv_join(pairs: F.Column) -> F.Column:
    """P19 (sunfar.py:239-282): array<struct<k,v>> spec rows → 'k: v; k: v'."""
    return F.array_join(
        F.transform(
            pairs,
            lambda x: F.concat(x.getField("k"), F.lit(": "), x.getField("v")),
        ),
        "; ",
    )


SPEC_LINE_RE = r"^([^:：]+)[:：]\s*(.*)$"


def spec_lines_to_entries(lines: F.Column) -> F.Column:
    """P20 (momo.py:270-310): 'key: value' / 'key：value' lines → array of
    (k, v) structs (map_from_entries-ready; half/full-width colons)."""
    return F.transform(
        F.filter(lines, lambda l: l.rlike(SPEC_LINE_RE)),
        lambda l: F.struct(
            F.trim(F.regexp_extract(l, SPEC_LINE_RE, 1)).alias("k"),
            F.trim(F.regexp_extract(l, SPEC_LINE_RE, 2)).alias("v"),
        ),
    )


def truncate_description(col: F.Column, n: int = 500) -> F.Column:
    """P20: description capped at 500 chars (momo.py:305-308)."""
    return F.substring(col, 1, n)


def detail_enrichment(docs: DataFrame) -> DataFrame:
    """P19/P20 + S4 + D8: detail pages (second-hop fetches, no price span)
    keyed by their URL → (url, detail_specs, detail_in_stock,
    detail_bundle_only) for a left join onto the products view.

    ``detail_bundle_only`` scans EVERY span's text with the dtsource
    bundle-only markers (the reference checks the whole detail HTML,
    dtsource.py:75-123)."""
    is_detail = ~F.exists(
        "spans", lambda s: s.getField("kind") == F.lit("price")
    ) & F.exists("spans", lambda s: s.getField("kind") == F.lit("spec"))
    s = _spans(docs.filter(is_detail))
    # full page text (offset order) for the store-specific whole-page checks
    page_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("text").isNotNull(),
                        F.struct("offset", "text"),
                    )
                )
            ),
            lambda x: x.getField("text"),
        ),
        " ",
    )
    has_cart = F.coalesce(
        F.bool_or(
            (F.col("kind") == "button") & F.col("text").contains("購物車")
        ),
        F.lit(False),
    )
    grp = s.groupBy(F.col("doc_id").alias("url")).agg(
        F.first("store").alias("_store"),
        F.max(F.when(F.col("kind") == "spec", F.col("text"))).alias(
            "detail_specs"
        ),
        F.max(
            F.when(F.col("kind") == "stock", P.is_in_stock(F.col("text")))
        ).alias("_stock_span_verdict"),
        page_text.alias("_page_text"),
        has_cart.alias("_has_cart"),
        F.coalesce(
            F.bool_or(P.dtsource_bundle_only(F.col("text"))), F.lit(False)
        ).alias("detail_bundle_only"),
    )
    # D4b: sinya details are judged by sinya's own whole-page indicator
    # lists + cart-button fallback + conservative default (sinya.py:244-301);
    # other stores keep the stock-span D1 verdict.
    return grp.select(
        "url",
        "detail_specs",
        F.when(
            F.col("_store") == "sinya",
            P.sinya_detail_in_stock(F.col("_page_text"), F.col("_has_cart")),
        )
        .otherwise(F.col("_stock_span_verdict"))
        .alias("detail_in_stock"),
        "detail_bundle_only",
    )


def resolve_stock(
    stock_state: F.Column, in_stock: F.Column, detail_in_stock: F.Column
) -> F.Column:
    """Detail-page stock escalation (sinya.py:244-301): only 需確認庫存 rows
    consult the detail verdict, with the reference's conservative default —
    no detail page (or an unreadable one) means 缺貨 (sinya.py:294-301).
    Every other row keeps its search-page verdict (the reference never
    overrides an explicit search-page state from the detail page)."""
    return F.when(
        stock_state == "需確認庫存", F.coalesce(detail_in_stock, F.lit(False))
    ).otherwise(in_stock)


def extract_products(docs: DataFrame, enrich_details: bool = True) -> DataFrame:
    """Unified products view over all store archetypes (J0: stores are data,
    not code paths — one DataFrame with a ``store`` column). Detail-page
    documents enrich the parent row via a url equi-join (broadcast-sized in
    practice: one row per detail page fetched this run):

      * specifications — coalesce with the detail spec span (sunfar.py:239-282)
      * in_stock       — sinya 需確認庫存 escalation (:func:`resolve_stock`)
      * D8 drop        — dtsource rows whose detail page (or name) carries a
                         bundle-only marker are removed entirely
                         (dtsource.py:150-153)
    """
    sinya_json = sinya_products(docs, with_state=True)
    base = (
        coolpc_products(docs)
        .unionByName(card_products(docs))
        .unionByName(sinya_json, allowMissingColumns=True)
        .unionByName(
            sinya_html_fallback_products(docs, json_products=sinya_json),
            allowMissingColumns=True,
        )
        .unionByName(sunfar_products(docs), allowMissingColumns=True)
    )
    if not enrich_details:
        return base.select(*PRODUCT_COLS)
    det = detail_enrichment(docs)
    out = (
        base.join(det, "url", "left")
        .withColumn(
            "specifications", F.coalesce("specifications", "detail_specs")
        )
        .withColumn(
            "in_stock",
            resolve_stock(
                F.col("stock_state"), F.col("in_stock"), F.col("detail_in_stock")
            ),
        )
        .filter(
            ~(
                (F.col("store") == "dtsource")
                & (
                    F.coalesce(F.col("detail_bundle_only"), F.lit(False))
                    | P.dtsource_bundle_only(F.col("product_name"))
                )
            )
        )
    )
    return out.select(*PRODUCT_COLS)


# ---------------------------------------------------------------------------
# P16-P18 — disabled stores (momo / sanjing / gh3c)
# ---------------------------------------------------------------------------

DISABLED_CARD_STORES = ["momo", "sanjing", "gh3c"]


def disabled_store_products(docs: DataFrame) -> DataFrame:
    """P16-P18: the three stores whose constructors crash in the reference
    registry (main.py:49-52) — momo (momo.py:78-268), sanjing
    (sanjing.py:30-224), gh3c (gh3c.py:63-204). The reference's parse code
    exists and works; only registration is broken, so active-registry parity
    keeps them OUT of :func:`products` (zero rows), while this operator
    provides the full parse for re-enablement, per-store faithful:

      * momo    — name required then momo_clean_name; price = first digit
                  run, $,-stripped, default 0 (momo.py:166-187); stock =
                  per-text-node OOS regex + button check, default in stock
                  (momo.py:225-253); only cards whose RAW name is empty
                  drop (momo.py:151-153) — a name that cleans to '' keeps
                  its row.
      * sanjing — parent-link URL required (sanjing.py:155-159: no link →
                  row dropped); name defaults to 未知產品; price = digit run
                  as float; ALWAYS in stock (sanjing.py:216-221);
                  description = first 3 spec lines joined ' | ', else the
                  full-name div (sanjing.py:194-206) → specifications.
      * gh3c    — raw name < 3 chars drops (gh3c.py:110-112); price from
                  the price element via the base extract_price, else the
                  whole-card digit-run fallback in [100, 1e6]
                  (gh3c.py:124-143); rows with price<=0 or empty cleaned
                  name drop (gh3c.py:158-160); stock adds the inquiry-
                  pricing check (gh3c.py:175-210).

    Same shuffle shape as :func:`card_products`: one narrow per-doc window
    to delimit items + one (doc, item) aggregation.
    """
    from price_crawler_spark.functions.names import clean_product_name, momo_clean_name
    from price_crawler_spark.functions.prices import digit_run_price, gh3c_fallback_price

    s = _spans(docs.filter(F.col("store").isin(DISABLED_CARD_STORES))).filter(
        F.col("kind").isin(
            "title", "price", "link", "image", "stock", "button", "spec", "fullname"
        )
    )
    s = _title_grouped(s)

    grp = s.groupBy("doc_id", "store", "seq_key", "item_idx").agg(
        _of("title", "text").alias("name_raw"),
        _of("price", "text").alias("price_text"),
        _of("link", "media_ref").alias("url"),
        _of("image", "media_ref").alias("image_url"),
        _of("stock", "text").alias("stock_text"),
        _of("button", "text").alias("button_text"),
        _of("fullname", "text").alias("fullname_text"),
        # spec lines in document order (sanjing takes the FIRST 3)
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("kind") == "spec", F.struct("offset", "text")
                )
            )
        ).alias("spec_lines"),
        F.min(F.when(F.col("kind") == "title", F.col("offset"))).alias("item_offset"),
    )

    card_texts = F.array(
        F.col("name_raw"), F.col("price_text"), F.col("stock_text"),
        F.col("button_text"),
    )
    # whole-container text for gh3c's no-price-element fallback scan
    # (gh3c.py:131-136 does container.get_text() — document order)
    full_text = F.concat_ws(
        " ",
        F.col("name_raw"), F.col("price_text"), F.col("stock_text"),
        F.col("button_text"),
    )

    momo_name = momo_clean_name(F.col("name_raw"))
    gh3c_name = clean_product_name(F.col("name_raw"))
    # sanjing.py:199-200: li.get_text(strip=True), empties dropped BEFORE
    # the [:3] slice — an empty spec line must not displace a real one.
    sanjing_spec_texts = F.filter(
        F.transform(F.col("spec_lines"), lambda s: F.trim(s["text"])),
        lambda t: t.isNotNull() & (t != ""),
    )
    sanjing_desc = F.coalesce(
        F.nullif(
            F.array_join(F.slice(sanjing_spec_texts, 1, 3), " | "),
            F.lit(""),
        ),
        F.col("fullname_text"),
    )

    name = (
        F.when(F.col("store") == "momo", momo_name)
        .when(F.col("store") == "sanjing",
              F.coalesce(collapse_spaces(F.col("name_raw")), F.lit("未知產品")))
        .otherwise(gh3c_name)
    )
    price = (
        F.when(F.col("store") == "gh3c",
               F.coalesce(
                   F.when(F.col("price_text").isNotNull(),
                          F.coalesce(extract_price(F.col("price_text")), F.lit(0.0))),
                   gh3c_fallback_price(full_text),
               ))
        .otherwise(digit_run_price(F.coalesce(F.col("price_text"), F.lit(""))))
    )
    in_stock = (
        F.when(F.col("store") == "momo",
               P.momo_in_stock(card_texts, F.col("button_text")))
        .when(F.col("store") == "sanjing", F.lit(True))
        .otherwise(P.gh3c_in_stock(card_texts, F.col("button_text")))
    )
    # momo drops only when the RAW name is empty (momo.py:151-153); a name
    # that CLEANS to '' still becomes a product. gh3c checks the cleaned
    # name (gh3c.py:158-160).
    keep = (
        F.when(F.col("store") == "momo",
               F.col("name_raw").isNotNull()
               & (F.trim(F.col("name_raw")) != ""))
        .when(F.col("store") == "sanjing", F.col("url").isNotNull())
        .otherwise(
            F.col("name_raw").isNotNull()
            & (F.length(F.trim(F.col("name_raw"))) >= 3)
            & (gh3c_name != "")
        )
    )
    out = (
        grp.filter(keep)
        .withColumn("product_name", name)
        .withColumn("price", price)
        .withColumn("in_stock", in_stock)
        .withColumn("currency", F.lit("TWD"))
        .withColumn(
            "specifications",
            F.when(F.col("store") == "sanjing", sanjing_desc).cast("string"),
        )
        .withColumn("is_bundle", F.lit(False))
        .withColumn("seq", _seq(F.col("seq_key"), F.col("item_offset")))
    )
    out = out.filter(
        F.when(F.col("store") == "gh3c", F.col("price") > 0).otherwise(F.lit(True))
    )
    return out.select(*PRODUCT_COLS)
