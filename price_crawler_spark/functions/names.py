"""Product-name scalar functions (SURVEY.md §2.3 F5-F9).

All native Column expressions; the literal replacement maps are folded into
one codegen'd expression chain (the reference re-runs ``str.replace`` loops
per row — Catalyst compiles the chain once per task).

Reference semantics:
  * clean_product_name      — base cleaner /root/reference/app/scrapers/base_scraper.py:118-136
                              (collapse whitespace; strip ``[...]``, ``(...)``, ``【...】``).
  * normalize_product_name  — /root/reference/app/utils/price_formatter.py:40-60
                              (collapse whitespace; GeForce→GTX, Intel Core→Intel,
                              AMD Ryzen→AMD).
  * coolpc_clean_name       — /root/reference/app/scrapers/coolpc.py:173-218
                              (strip non-word/CJK; literal Big5-mojibake fix map,
                              copied verbatim per SURVEY §7.3 risk 4; dedupe 專案 tags).
  * normalize_search_term   — /root/reference/app/utils/product_matcher.py:33-44
                              (lowercase, non-``\\w\\s\\-`` → space, collapse spaces).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def collapse_spaces(col: Column | str) -> Column:
    return F.trim(F.regexp_replace(_col(col), r"\s+", " "))


def clean_product_name(col: Column | str) -> Column:
    """base_scraper.py:118-136 — whitespace collapse then bracket stripping."""
    c = collapse_spaces(_col(col))
    for pattern in (r"\[.*?\]", r"\(.*?\)", r"【.*?】"):
        c = F.regexp_replace(c, pattern, "")
    return F.trim(c)


_NORMALIZE_REPLACEMENTS = [
    ("GeForce", "GTX"),
    ("Intel Core", "Intel"),
    ("AMD Ryzen", "AMD"),
    # Kingston→Kingston / Corsair→Corsair are no-ops in the reference; kept
    # out of the chain (identical semantics, fewer expressions).
]


def normalize_product_name(col: Column | str) -> Column:
    """price_formatter.py:40-60 — literal (non-regex) replacements."""
    c = collapse_spaces(_col(col))
    for old, new in _NORMALIZE_REPLACEMENTS:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


# coolpc.py:184-209 — verbatim mojibake repair map (opaque Big5-damage
# literals; do not "fix", SURVEY §7.3 risk 4). Order preserved: Python dicts
# iterate in insertion order and replacements are applied sequentially.
COOLPC_MOJIBAKE_FIXES = [
    ("_", "藍寶石"),
    ("fB760", "[需搭配B760]"),
    ("fB850", "[需搭配B850]"),
    ("fB860", "[需搭配B860]"),
    ("fZ790", "[需搭配Z790]"),
    ("fZ890", "[需搭配Z890]"),
    ("fX370", "[需搭配X370]"),
    ("fX3D", "[需搭配X3D]"),
    ("CDO", "主板"),
    ("dM", "專案"),
    ("AM", "專案"),
    ("GRE", "GRE"),
    ("XT", "XT"),
    ("ݷf", "[需搭配]"),
    ("ݥf", "[需搭配]"),
    ("Xʡ", "CPU合購"),
    ("ݭI", "金屬背板"),
    ("U O", "三年保固"),
    ("T O", "三年保固"),
    ("T OT", "三年保固"),
    ("ʤ", "限購一片"),
    ("MITxWs", "MIT台灣製"),
    ("a ", "極地 "),
    ("t ", "暗黑 "),
]


def coolpc_clean_name(col: Column | str) -> Column:
    """coolpc.py:173-218 — keep word chars/CJK/common symbols, collapse
    spaces, apply the mojibake fix chain, dedupe 專案 markers."""
    # (?U): Python's \w is unicode-aware, Java's is ASCII-only by default —
    # without the flag the Big5-mojibake bytes would be stripped before the
    # fix map could see them.
    c = F.regexp_replace(_col(col), r"(?U)[^\w\s\-\(\)\[\]/\+\.一-鿿]+", " ")
    c = collapse_spaces(c)
    for old, new in COOLPC_MOJIBAKE_FIXES:
        c = F.replace(c, F.lit(old), F.lit(new))
    c = F.regexp_replace(c, r"\[\s*專案\s*\]", "[專案]")
    c = F.regexp_replace(c, r"\[\s*A\s*-專案\s*\]", "[專案]")
    return F.trim(c)


def normalize_search_term(col: Column | str) -> Column:
    """product_matcher.py:33-44 — lowercase, strip non ``\\w\\s\\-``, collapse.

    Note: Python's ``\\w`` is unicode-aware (CJK chars are word chars); Java
    regex needs the UNICODE_CHARACTER_CLASS flag ``(?U)`` for parity.
    """
    c = F.lower(_col(col))
    c = F.regexp_replace(c, r"(?U)[^\w\s\-]", " ")
    return collapse_spaces(c)


# F13 — sapphire name unescape (sapphire.py:211): script-mined names carry
# JS escapes (``™`` → ™, then stray backslashes dropped) and the common
# HTML entities (``&trade;`` → ™ et al.). Literal replace chain — one
# codegen'd expression, no per-row Python.
_ENTITY_REPLACEMENTS = [
    ("\\u2122", "™"),
    ("\\", ""),
    ("&trade;", "™"),
    ("&reg;", "®"),
    ("&copy;", "©"),
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # last, so '&amp;trade;' doesn't double-decode
]


def unescape_entities(col: Column | str) -> Column:
    c = _col(col)
    for old, new in _ENTITY_REPLACEMENTS:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


# momo cleaner (momo.py:255-268). Order matters and is the reference's:
# collapse whitespace FIRST, then remove each paired delimiter WITH its
# enclosed content (non-greedy pairs — a lone ★ survives), then the trailing
# 限時特價… tail, then strip. Removing a paired segment can leave an interior
# double space; the reference does NOT re-collapse it, so neither do we.
def momo_clean_name(col: Column | str) -> Column:
    c = F.regexp_replace(F.trim(_col(col)), r"\s+", " ")
    c = F.regexp_replace(c, r"【.*?】", "")
    c = F.regexp_replace(c, r"\[.*?\]", "")
    c = F.regexp_replace(c, r"★.*?★", "")
    c = F.regexp_replace(c, r"☆.*?☆", "")
    c = F.regexp_replace(c, r"限時特價.*$", "")
    return F.trim(c)
