"""Price scalar functions (SURVEY.md §2.3 F1-F4).

Reference semantics reproduced as native Column expressions (JVM-side,
whole-stage codegen — no Python in the hot path):

  * extract_price   — /root/reference/app/utils/price_formatter.py:7-25
                      strip ``NT$￥元,，`` + whitespace, then first
                      ``\\d+(\\.\\d+)?`` as DOUBLE.
  * format_price    — price_formatter.py:27-33 (``NT$ {:,.0f}`` for TWD).
  * is_valid_price  — price_formatter.py:35-38 (not-null and > 0).
  * extract_price_strict — the autobuy variant's ``> 100`` sanity guard
                      (/root/reference/app/scrapers/autobuy.py:115-141).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters the reference strips before matching the number.
_STRIP_PATTERN = r"[NT$￥元,，\s]"
_NUMBER_PATTERN = r"(\d+(?:\.\d+)?)"


def extract_price(col: Column | str) -> Column:
    """price_text -> DOUBLE (null when no digits survive)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, _STRIP_PATTERN, "")
    matched = F.regexp_extract(cleaned, _NUMBER_PATTERN, 1)
    return F.when(matched == "", None).otherwise(matched.cast("double"))


def extract_price_strict(col: Column | str, floor: float = 100.0) -> Column:
    """autobuy.py:115-141 keeps a candidate price only when > floor."""
    p = extract_price(col)
    return F.when(p > F.lit(floor), p)


def is_valid_price(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (c > F.lit(0.0))


def format_price(col: Column | str, currency: str = "TWD") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if currency == "TWD":
        return F.concat(F.lit("NT$ "), F.format_number(c, 0))
    return F.concat(F.format_number(c, 2), F.lit(" " + currency))


def digit_run_price(col: Column | str) -> Column:
    """momo.py:166-187 / sanjing.py:169-182 price parse: strip ``$`` and
    ``,``, then the FIRST digit run; no digits → 0 (the reference's default,
    not null). Distinct from :func:`extract_price` (F1): whitespace/NT/元
    are NOT stripped first, so ``'第2件 $999'`` parses 2 — a reference quirk
    kept verbatim."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.regexp_extract(F.regexp_replace(c, r"[$,]", ""), r"\d+", 0)
    return F.when(m == "", F.lit(0.0)).otherwise(m.cast("double"))


def gh3c_fallback_price(col: Column | str) -> Column:
    """gh3c.py:131-143: when a card has no price element, scan the WHOLE
    card text for its first digit run (commas stripped) and keep it only in
    the plausible [100, 1_000_000] band; otherwise 0."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.regexp_extract(F.regexp_replace(c, ",", ""), r"\d+", 0)
    p = F.when(m == "", F.lit(0.0)).otherwise(m.cast("double"))
    return F.when((p >= 100.0) & (p <= 1000000.0), p).otherwise(F.lit(0.0))
