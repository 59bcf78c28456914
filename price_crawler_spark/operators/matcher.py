"""Query↔product similarity (SURVEY.md §2.5 J1, §2.11).

Reproduces the reference scorer (/root/reference/app/utils/
product_matcher.py:82-145) bit-for-bit: direct-substring score, difflib
``SequenceMatcher.ratio`` (Ratcliff-Obershelp — NO Catalyst builtin, and
``levenshtein`` is NOT equivalent, SURVEY §7.3 risk 2), feature match with
double-weighted model numbers, digit overlap, spec overlap, blended
0.3/0.2/0.5 and capped at 1.0.

Execution: a vectorized pandas UDF (Arrow batches). The query side is
constant per search, so its features are computed once per batch via an
lru_cache — the per-row work is one difflib ratio + a few regex findalls on
the product name. This is the engine's ONLY Python hot-path crossing
(§2.11's deliberate 4-UDF budget).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# Brand synonym dimension (product_matcher.py:10-22) — data parity.
BRAND_SYNONYMS = {
    "nvidia": ["nvidia", "geforce", "gtx", "rtx"],
    "amd": ["amd", "radeon", "ryzen"],
    "intel": ["intel", "core"],
    "asus": ["asus", "華碩"],
    "msi": ["msi", "微星"],
    "gigabyte": ["gigabyte", "技嘉"],
    "asrock": ["asrock", "華擎"],
    "corsair": ["corsair", "海盜船"],
    "kingston": ["kingston", "金士頓"],
    "western digital": ["wd", "western digital", "威騰"],
    "seagate": ["seagate", "希捷"],
}

# Spec regexes (product_matcher.py:25-31). NOTE: the storage pattern yields
# TUPLES from re.findall (two groups) — the reference mixes str and tuple in
# the specs list and set-intersects them; parity requires keeping that.
SPEC_PATTERNS = {
    "memory": r"(\d+)GB",
    "storage": r"(\d+)(GB|TB)",
    "frequency": r"(\d+)MHz",
    "cores": r"(\d+)核心?",
    "model_number": r"[A-Z]+\d+[A-Z]*",
}

MODEL_RE = re.compile(r"(rtx|gtx|rx|i\d|ryzen)\s*\d+[a-z]*", re.IGNORECASE)
DIGITS_RE = re.compile(r"\d+")


def normalize_term(term: str) -> str:
    """product_matcher.py:33-44."""
    if not term:
        return ""
    return re.sub(r"\s+", " ", re.sub(r"[^\w\s\-]", " ", term.lower())).strip()


@lru_cache(maxsize=4096)
def extract_features(name: str):
    """product_matcher.py:46-80 → (brand, model, specs_frozenset)."""
    normalized = normalize_term(name)
    brand = next(
        (
            b
            for b, syns in BRAND_SYNONYMS.items()
            if any(s in normalized for s in syns)
        ),
        None,
    )
    specs: list = []
    for spec_type, pattern in SPEC_PATTERNS.items():
        matches = re.findall(pattern, normalized, re.IGNORECASE)
        specs.extend(matches)
    m = MODEL_RE.search(normalized)
    model = m.group(0).upper().replace(" ", "") if m else None
    return brand, model, frozenset(specs)


def similarity(search_term: str, product_name: str) -> float:
    """product_matcher.py:82-145 — the exact blend."""
    sn = normalize_term(search_term)
    pn = normalize_term(product_name)

    # reference quirk: `"" in pn` is True, so an empty/whitespace query
    # scores direct=0.3 against any non-empty name (product_matcher.py:88-92).
    # The reference raises ZeroDivisionError when BOTH sides normalize to ""
    # (len(pn)==0); a UDF can't usefully crash per-row, so that degenerate
    # cell scores 0.0 here — extraction never emits empty names.
    direct = 0.0
    if sn in pn and pn:
        direct = 0.3 + (len(sn) / len(pn)) * 0.4

    basic = SequenceMatcher(None, sn, pn).ratio()

    s_brand, s_model, s_specs = extract_features(search_term)
    p_brand, p_model, p_specs = extract_features(product_name)

    score = 0.0
    total = 0
    if s_brand and p_brand:
        total += 1
        if s_brand == p_brand:
            score += 1
    if s_model and p_model:
        total += 2
        if s_model == p_model:
            score += 2
        elif s_model[:3] == p_model[:3]:
            score += 0.5
    s_nums = DIGITS_RE.findall(sn)
    p_nums = DIGITS_RE.findall(pn)
    if s_nums and p_nums:
        total += 1
        hits = sum(1 for n in s_nums if n in p_nums)
        if hits > 0:
            score += hits / len(s_nums)
    if s_specs and p_specs:
        total += 1
        common = s_specs & p_specs
        if common:
            score += len(common) / max(len(s_specs), len(p_specs))

    if total > 0:
        final = direct * 0.3 + basic * 0.2 + (score / total) * 0.5
    else:
        final = max(direct, basic)
    return min(final, 1.0)


@pandas_udf(DoubleType())
def similarity_udf(search: pd.Series, name: pd.Series) -> pd.Series:
    return pd.Series(
        [similarity(s, n) for s, n in zip(search, name)], dtype="float64"
    )


def similarity_col(query: str, name_col: Column | str) -> Column:
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    return similarity_udf(F.lit(query), c)
