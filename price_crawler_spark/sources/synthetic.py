"""Deterministic synthetic web — the sandbox stand-in for live HTTP.

Every page is a pure function of ``(store, url)`` — no wall clock, no RNG
state — so the same URL always yields the same spans and links, across
processes, partitions, and cluster sizes. This is what makes the Spark crawl
bit-comparable to the pure-Python reference oracle in tests
(golden/crawl_order.json) and lets bench.py scale the frontier arbitrarily.

Page archetypes mirror the reference stores (SURVEY.md §2.2):
  * coolpc  — ONE giant query-independent page of ``option`` spans
              (coolpc.py:63-81); all queries hit the same canonical URL, so
              URL-seen dedup collapses them (the mega-host skew case C6).
  * sinya / sunfar — a single ``json`` span with an embedded JSON payload
              (sinya.py:29-136, sunfar.py:79-125).
  * sapphire — HTML-card spans plus a ``pixel`` span (sapphire.py:146-192).
  * dtsource / autobuy / pchome — card spans: title, price, link, image,
              stock, button per item (pchome.py:65-164 et al.).

Hashing uses md5 (stable across processes; Python's hash() is salted).
"""

from __future__ import annotations

import bisect
import hashlib
import json
from urllib.parse import parse_qs, unquote_plus, urlparse

from price_crawler_spark.frontier.seeds import MAX_RESULTS, STORE_HOST

# Product catalog — fixture data from the reference's deterministic mock
# (/root/reference/app/scrapers/mock_scraper.py:14-143, via FIXTURES.md §5).
CATALOG = [
    ("ASUS ROG RTX 4090 24GB GDDR6X", 45000, "24GB GDDR6X, 2520MHz"),
    ("MSI RTX 4080 SUPER 16GB Gaming X", 35000, "16GB GDDR6X, 2550MHz"),
    ("GIGABYTE RTX 4070 12GB WINDFORCE", 22000, "12GB GDDR6X, 2475MHz"),
    ("ASUS TUF RTX 4060 Ti 16GB", 18000, "16GB GDDR6, 2540MHz"),
    ("MSI RTX 4060 8GB VENTUS 2X", 12000, "8GB GDDR6, 2460MHz"),
    ("ASUS ROG RTX 3080 10GB STRIX", 28000, "10GB GDDR6X, 1935MHz"),
    ("MSI RTX 3070 8GB Gaming X Trio", 20000, "8GB GDDR6, 1815MHz"),
    ("GIGABYTE RTX 3060 Ti 8GB EAGLE", 15000, "8GB GDDR6, 1695MHz"),
    ("ASUS ROG RTX 5090 32GB STRIX", 85000, "32GB GDDR7, 2610MHz"),
    ("MSI RTX 5080 16GB Gaming X Trio", 55000, "16GB GDDR7, 2295MHz"),
    ("GIGABYTE RTX 5070 Ti 16GB WINDFORCE", 38000, "16GB GDDR7, 2390MHz"),
    ("ASUS TUF RTX 5070 12GB", 28000, "12GB GDDR7, 2160MHz"),
    ("GIGABYTE RX 9070 WINDFORCE OC 16GB", 23000, "16GB GDDR6, 2565MHz"),
    ("MSI RX 9070 20GB Gaming Trio X (概念產品)", 24000, "20GB GDDR6, 2450MHz"),
    ("ASUS RX 9070 XT 16GB STRIX Gaming (未來款)", 26000, "16GB GDDR6, 2680MHz"),
    ("Intel Core i9-14900K 處理器", 15500, "24核心, 5.6GHz"),
    ("AMD Ryzen 9 7950X3D 處理器", 18000, "16核心, 5.7GHz"),
]

OUT_OF_STOCK_TEXT = "已售完 請勿下單 僅提供報價"
IN_STOCK_TEXT = "現貨供應"

# Parametric catalog expansion for engine-scale benchmarks (bench.py
# --engine): SPARK_GRAFT_CATALOG_N extra deterministic products. 0 (the
# default) keeps the reference's 17-product mock exactly — all golden tests
# run with the env unset. Read at import time so Spark workers (which
# inherit the driver env) build the identical universe.
import os as _os

_CATALOG_N = int(_os.environ.get("SPARK_GRAFT_CATALOG_N", "0"))
if _CATALOG_N:
    CATALOG = CATALOG + [
        (
            f"Xpanded GPU{i:06d} {8 + i % 25}GB Model",
            5000 + i % 40000,
            f"{8 + i % 25}GB, {1800 + i % 900}MHz",
        )
        for i in range(_CATALOG_N)
    ]

# precomputed indexes so page synthesis stays fast at large catalog sizes
_NORM_CATALOG: list | None = None
_PID_INDEX: dict | None = None
_SCAN_BLOB: str | None = None
_SCAN_OFFSETS: list | None = None


def _norm_catalog() -> list:
    global _NORM_CATALOG
    if _NORM_CATALOG is None:
        _NORM_CATALOG = [
            (name, _norm(name), base, specs) for name, base, specs in CATALOG
        ]
    return _NORM_CATALOG


def _scan_index() -> tuple[str, list]:
    """All normalized names joined by NUL into ONE string, plus each name's
    start offset. Substring search then runs as C-speed ``str.find`` over
    the blob instead of a Python-level loop of ``in`` checks per name — at
    CATALOG_N=400k that's the difference between ~1 ms and ~100 ms per
    synthesized search page, which dominated the 1.2M-URL engine bench.
    NUL never appears in a normalized name or query, so a match can't span
    two names; find() positions ascend, preserving catalog order exactly."""
    global _SCAN_BLOB, _SCAN_OFFSETS
    if _SCAN_BLOB is None:
        offs, pos, parts = [], 0, []
        for _, norm_name, _, _ in _norm_catalog():
            offs.append(pos)
            parts.append(norm_name)
            pos += len(norm_name) + 1
        _SCAN_BLOB = "\x00".join(parts)
        _SCAN_OFFSETS = offs
    return _SCAN_BLOB, _SCAN_OFFSETS


def _pid_index(store: str) -> dict:
    global _PID_INDEX
    if _PID_INDEX is None:
        _PID_INDEX = {}
    if store not in _PID_INDEX:
        _PID_INDEX[store] = {
            _pid(store, name): (name, base, specs)
            for name, base, specs in CATALOG
        }
    return _PID_INDEX[store]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def _norm(s: str) -> str:
    return s.lower().replace(" ", "").replace("-", "")


def store_price(store: str, name: str, base: int) -> float:
    return float(base + _h(f"{store}|{name}|price") % 2001 - 1000)


def store_in_stock(store: str, name: str) -> bool:
    return _h(f"{store}|{name}|stock") % 5 != 0


def _query_of(url: str) -> str | None:
    p = urlparse(url)
    qs = parse_qs(p.query)
    for key in ("keywords", "keyword", "q"):
        if key in qs:
            return unquote_plus(qs[key][0])
    return None


def catalog_matches(store: str, query: str) -> list[tuple[str, float, str, bool]]:
    """Reference mock matching: normalized substring (mock_scraper.py:156-172).

    Semantics are unchanged from the per-name linear scan (same order, same
    per-store cap); the blob index only changes HOW the scan runs (one
    ``str.find`` walk — see :func:`_scan_index`)."""
    nq = _norm(query)
    cap = MAX_RESULTS.get(store, 50)
    norm_cat = _norm_catalog()
    out = []
    if not nq:
        hit_idxs = range(min(cap, len(norm_cat)))
    else:
        blob, offs = _scan_index()
        hit_idxs = []
        p = blob.find(nq)
        while p != -1 and len(hit_idxs) < cap:
            i = bisect.bisect_right(offs, p) - 1
            hit_idxs.append(i)
            # jump past this name: later matches inside it are the same hit
            p = blob.find(nq, offs[i] + len(norm_cat[i][1]) + 1)
    for i in hit_idxs:
        name, _, base, specs = norm_cat[i]
        out.append(
            (name, store_price(store, name, base), specs, store_in_stock(store, name))
        )
    return out


def _pid(store: str, name: str) -> str:
    return hashlib.md5(f"{store}|{name}".encode()).hexdigest()[:10]


def detail_url(store: str, name: str) -> str:
    return f"https://{STORE_HOST[store]}/prod?id={_pid(store, name)}"


def image_url(store: str, name: str) -> str:
    return f"https://img.{STORE_HOST[store]}/i/{_pid(store, name)}.jpg"


def sinya_stock_known(name: str) -> bool:
    """~1/3 of sinya search results omit the ``stock`` field → the D4 state
    machine yields 需確認庫存 and the engine must escalate to the detail
    page (sinya.py:244-301), defaulting to 缺貨 when it can't."""
    return _h(f"sinya|{name}|stockknown") % 3 != 0


def dtsource_bundle_only_product(name: str) -> bool:
    """~1/7 of dtsource products are 合購限定 (bundle-only): their detail
    page carries the marker and the reference drops them entirely
    (dtsource.py:75-123, 150-153)."""
    return _h(f"dtsource|{name}|bundle_only") % 7 == 0


def fetch_fails(url: str, attempts: int) -> bool:
    """Deterministic transient failure: ~1/11 URLs time out on their first
    attempt and succeed on retry (reference retry loop base_scraper.py:60-95,
    MAX_RETRIES=2 at config.py:17)."""
    return attempts == 0 and _h(url + "|fail") % 11 == 0


def synthesize_page(store: str, url: str) -> dict:
    """(store, url) -> {'spans': [(kind,text,media_ref,offset)], 'links': [url]}.

    ``links`` are the second-hop detail pages (SURVEY §2.1 S4), in span
    order; span offsets are 0-based page order (FIXTURES.md §1).
    """
    path = urlparse(url).path
    if path == "/prod":
        return _detail_page(store, url)
    if store == "coolpc":
        return _coolpc_page()
    query = _query_of(url)
    items = catalog_matches(store, query) if query else []
    if store in ("sinya", "sunfar"):
        return _json_page(store, items)
    return _card_page(store, items)


def _coolpc_page() -> dict:
    spans = []
    for i, (name, base, _specs) in enumerate(CATALOG):
        price = int(store_price("coolpc", name, base))
        spans.append(("option", f"{name}, ${price} ★熱賣", None, i))
    return {"spans": spans, "links": []}


def _json_page(store: str, items) -> dict:
    if store == "sinya":
        payload = [
            {
                "prod_title": name,
                "new_price": str(int(price)),
                "href": detail_url(store, name),
                "image": image_url(store, name),
                # stock field present only when the search page knows it
                **({"stock": 1 if in_stock else 0} if sinya_stock_known(name) else {}),
            }
            for name, price, _s, in_stock in items
        ]
        text = f"const results = {json.dumps(payload, ensure_ascii=False)};"
    else:  # sunfar
        payload = {
            "ptlist": [
                {
                    "pname": name,
                    "prod_price": str(int(price)),
                    "id": _pid(store, name),
                    "ps": image_url(store, name),
                    "bd": specs,
                    "pos_qty": 3 if in_stock else 0,
                }
                for name, price, specs, in_stock in items
            ]
        }
        text = f"var Search_data = {json.dumps(payload, ensure_ascii=False)};"
    links = [detail_url(store, name) for name, *_ in items]
    return {"spans": [("json", text, None, 0)], "links": links}


def _card_page(store: str, items) -> dict:
    spans = []
    links = []
    off = 0
    for name, price, _specs, in_stock in items:
        link = detail_url(store, name)
        spans.append(("title", name, None, off)); off += 1
        spans.append(("price", f"NT${int(price):,}", None, off)); off += 1
        spans.append(("link", None, link, off)); off += 1
        spans.append(("image", None, image_url(store, name), off)); off += 1
        spans.append(("stock", IN_STOCK_TEXT if in_stock else OUT_OF_STOCK_TEXT, None, off)); off += 1
        spans.append(("button", "加入購物車" if in_stock else "補貨中", None, off)); off += 1
        links.append(link)
    if store == "sapphire" and items:
        triples = ", ".join(
            '{"id":%s,"price":%.1f,"quantity":%d}'
            % (_h(n) % 100000, p, 3 if s else 0)
            for n, p, _sp, s in items
        )
        spans.append(("pixel", f"content_ids:[...], {triples}", None, off))
        off += 1
    return {"spans": spans, "links": links}


def _detail_page(store: str, url: str) -> dict:
    pid = parse_qs(urlparse(url).query).get("id", ["?"])[0]
    match = _pid_index(store).get(pid)
    if match is None:
        return {"spans": [("title", f"unknown {pid}", None, 0)], "links": []}
    name, base, specs = match
    spans = [
        ("title", name, None, 0),
        ("spec", specs, None, 1),
        ("image", None, image_url(store, name), 2),
        ("stock", IN_STOCK_TEXT if store_in_stock(store, name) else OUT_OF_STOCK_TEXT, None, 3),
    ]
    if store == "dtsource" and dtsource_bundle_only_product(name):
        spans.append(("note", "組裝價 限搭組裝機出貨 不單獨販售", None, 4))
    return {"spans": spans, "links": []}


# Robots fixture (FIXTURES.md §4): isunfar asks crawl_delay=2 and denies
# /private; coolpc is the mega-host for skew tests; everyone else 1 s.
def robots_rows() -> list[dict]:
    rows = []
    for store, host in STORE_HOST.items():
        rows.append(
            {
                "host": host,
                "allow": ["/"],
                "deny": ["/private"] if store == "sunfar" else [],
                "crawl_delay": 2.0 if store == "sunfar" else 1.0,
            }
        )
    return rows
