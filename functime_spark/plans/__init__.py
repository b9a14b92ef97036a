"""Physical-plan inspection utilities (SURVEY §4.3's discipline,
executable): count shuffles, verify parquet pushdown, measure
whole-stage-codegen coverage. Used by tests to pin the plans we want
— one exchange per panel operator, filters reaching the scan."""

from functime_spark.plans.checks import (  # noqa: F401
    assert_max_exchanges,
    codegen_spans,
    count_exchanges,
    count_file_scans,
    explain_str,
    pushed_filters,
    python_eval_nodes,
    read_schema_columns,
)
