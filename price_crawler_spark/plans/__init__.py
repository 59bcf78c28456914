"""Physical-plan inspection and partitioning strategy.

``explain_str`` / ``assert_*`` make plan shape a TESTABLE property: the
pushdown, broadcast, and codegen expectations that make this engine viable
at 100 TB are asserted in tests/test_plans.py, not just hoped for.
"""

from price_crawler_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_broadcast_join,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_wholestage_codegen,
    explain_str,
)

__all__ = [
    "explain_str",
    "assert_pushed_filters",
    "assert_read_schema_only",
    "assert_broadcast_join",
    "assert_no_broadcast_join",
    "assert_wholestage_codegen",
]
