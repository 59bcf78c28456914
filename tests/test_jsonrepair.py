"""P6 JS-literal repair: golden cases + property parity between the Spark
regexp chain, the pure-Python reference oracle, and the DuckDB mirror."""

from __future__ import annotations

import json

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from price_crawler_spark.functions.jsonrepair import (
    duckdb_js_literal_repair,
    js_literal_repair,
    python_reference_repair,
)

GOLDEN = [
    # bare keys + single quotes
    ("{name: 'x', price: 12}", '{"name": "x", "price": 12}'),
    # trailing comma in object and array
    ("{a: [1, 2,], b: 3,}", '{"a": [1, 2], "b": 3}'),
    # undefined → null
    ("{a: undefined}", '{"a": null}'),
    # empty value mid-object repaired; final empty value stays broken
    ("{a: , b: 1}", '{"a": null, "b": 1}'),
    ("{a: ,}", '{"a": }'),  # reference quirk: stays invalid → row dropped
]


def test_golden_cases(spark):
    df = spark.createDataFrame([(s,) for s, _ in GOLDEN], ["js"])
    got = [r.fixed for r in df.select(js_literal_repair("js").alias("fixed")).collect()]
    for (src, expected), out in zip(GOLDEN, got):
        assert out == expected, f"{src!r}: {out!r} != {expected!r}"
        assert out == python_reference_repair(src)


def test_repaired_parses_as_json(spark):
    ok_cases = [s for s, e in GOLDEN[:4]]
    df = spark.createDataFrame([(s,) for s in ok_cases], ["js"])
    parsed = df.select(
        F.from_json(js_literal_repair("js"), "map<string,string>").alias("m")
    ).collect()
    assert all(r.m is not None for r in parsed)
    for s, expected in GOLDEN[:4]:
        json.loads(python_reference_repair(s))  # the oracle is valid JSON too


_js_chars = st.text(
    alphabet="abcz_ 019:,'{}[]undefined", min_size=0, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_js_chars, min_size=1, max_size=8))
def test_property_python_duckdb_parity(strings):
    """The DuckDB mirror and the Python oracle agree on arbitrary JS-ish
    garbage (Spark↔Python parity is covered on the same strategy via the
    batched test below)."""
    con = duckdb.connect()
    for s in strings:
        expr = duckdb_js_literal_repair("?::VARCHAR")
        got = con.execute(f"SELECT {expr}", [s]).fetchone()[0]
        assert got == python_reference_repair(s), s
    con.close()


def test_property_spark_python_parity(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcz_ 019:,'{}[]undefined"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["js"])
    got = [
        r.fixed
        for r in df.select(js_literal_repair("js").alias("fixed")).collect()
    ]
    for s, out in zip(cases, got):
        assert out == python_reference_repair(s), repr(s)
