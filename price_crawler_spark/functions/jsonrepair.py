"""P6 — JS-object-literal → JSON repair (SURVEY.md §2.2 P6, §7.3 risk 3).

Reference: /root/reference/app/scrapers/sinya.py:303-330. The ORDER of the
five rewrites is semantics-bearing (keys are quoted before quote conversion;
trailing commas are stripped BEFORE empty-value repair, so an empty value
directly before ``}`` stays broken and the row is dropped — reproduced
as-is, including the quirk that rewrite 1 also fires inside string values).

Used on ``json``-kind spans before ``from_json`` when a store embeds JS
literals instead of strict JSON.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (java_pattern, replacement) — applied in order; all-global like re.sub.
REPAIR_STEPS = [
    (r"\b([a-zA-Z_][a-zA-Z0-9_]*)\s*:", '"$1":'),   # 1. quote bare keys
    (r"'([^']*)'", '"$1"'),                           # 2. single → double quotes
    (r",\s*\}", "}"),                                  # 3a. trailing comma in obj
    (r",\s*\]", "]"),                                  # 3b. trailing comma in arr
    (r"\bundefined\b", "null"),                        # 4. undefined → null
    (r":\s*,", ": null,"),                             # 5. empty value → null
]


def js_literal_repair(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for pattern, repl in REPAIR_STEPS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def python_reference_repair(s: str) -> str:
    """The reference chain verbatim-in-behavior (pure-Python oracle for
    property tests — sinya.py:310-326 semantics, not copied code)."""
    import re

    s = re.sub(r"\b([a-zA-Z_][a-zA-Z0-9_]*)\s*:", r'"\1":', s)
    s = re.sub(r"'([^']*)'", r'"\1"', s)
    s = re.sub(r",\s*}", "}", s)
    s = re.sub(r",\s*]", "]", s)
    s = re.sub(r"\bundefined\b", "null", s)
    s = re.sub(r":\s*,", ": null,", s)
    return s


def duckdb_js_literal_repair(expr: str) -> str:
    """DuckDB mirror (RE2 supports \\b; backrefs are \\1; needs explicit
    'g')."""
    steps = [
        (r"\b([a-zA-Z_][a-zA-Z0-9_]*)\s*:", r'"\1":'),
        (r"'([^']*)'", r'"\1"'),
        (r",\s*\}", "}"),
        (r",\s*\]", "]"),
        (r"\bundefined\b", "null"),
        (r":\s*,", ": null,"),
    ]
    out = expr
    for pattern, repl in steps:
        p = pattern.replace("'", "''")
        r = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out
