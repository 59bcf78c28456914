"""Plan-shape assertions (SURVEY.md §4: every Catalyst freebie the rebuild
relies on — predicate pushdown, column pruning, broadcast joins, whole-stage
codegen — is checked against the formatted physical plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside a PushedFilters: [...] clause of
    the scan node — i.e. the filter reached parquet, not a post-scan
    Filter."""
    plan = explain_str(df)
    pushed = "\n".join(
        line for line in plan.splitlines() if "PushedFilters" in line
    )
    for frag in fragments:
        assert frag in pushed, (
            f"filter {frag!r} not pushed to scan.\nPushedFilters lines:\n"
            f"{pushed}\nfull plan:\n{plan}"
        )


def assert_read_schema_only(df: DataFrame, *cols: str) -> None:
    """The parquet ReadSchema must contain exactly ``cols`` — column pruning
    reached the scan (a scan reading all columns for a 2-column projection
    is wrong)."""
    plan = explain_str(df)
    schema_lines = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert schema_lines, f"no ReadSchema in plan:\n{plan}"
    for line in schema_lines:
        body = line.split("struct<", 1)[-1]
        read_cols = {c.split(":")[0].strip() for c in body.rstrip(">").split(",") if c}
        assert read_cols == set(cols), (
            f"ReadSchema {sorted(read_cols)} != expected {sorted(cols)}\n{plan}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join in plan:\n{plan}"
    )


def assert_no_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "BroadcastHashJoin" not in plan, (
        f"expected NO broadcast hash join in plan:\n{plan}"
    )


def assert_wholestage_codegen(df: DataFrame) -> None:
    """At least one WholeStageCodegen span — the expression chain compiles
    to JVM bytecode instead of interpreted row evaluation. Executes the
    plan first when AQE hasn't finalized it (codegen spans only appear in
    the final adaptive plan)."""
    plan = explain_str(df)
    if "isFinalPlan=false" in plan:
        # AQE finalizes the plan only on execution of THIS Dataset's query
        # execution (a separate write would finalize a different one).
        # Test-sized inputs only.
        df.collect()
        plan = explain_str(df)
    # simple mode prints "WholeStageCodegen (n)" nodes; formatted mode
    # annotates members with "[codegen id : n]"
    assert "WholeStageCodegen" in plan or "codegen id" in plan, (
        f"no whole-stage codegen span in:\n{plan}"
    )
