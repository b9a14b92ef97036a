"""Plan checks: the "is this the plan I'd want at 100 TB?" toolkit.

Every panel operator in this library is designed around ONE
hash-partition of the panel by entity (SURVEY §4.3). These helpers
turn that design claim into assertions a test can pin, so a regression
that sneaks in a second shuffle or breaks parquet pushdown fails CI
instead of surfacing as a 2x slowdown at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what .explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.

    Broadcast exchanges are excluded — a broadcast of an
    n_entities-row parameter table is the cheap, intended path for
    per-entity joins; hashpartitioning exchanges are the expensive
    axis this library minimizes.
    """
    plan = explain_str(df, "simple")
    return len(
        [
            m
            for m in re.finditer(r"Exchange (\w+)", plan)
            if "Broadcast" not in m.group(1)
        ]
    )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    actual = count_exchanges(df)
    if actual > n:
        raise AssertionError(
            f"plan has {actual} shuffle exchanges, expected <= {n}:\n"
            + explain_str(df, "simple")
        )


def pushed_filters(df: DataFrame) -> list:
    """PushedFilters entries on every parquet scan in the plan."""
    plan = explain_str(df, "formatted")
    out: list = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        # terms look like Op(args...) and args may contain commas
        out.append(re.findall(r"\w+\([^)]*\)", body) if body else [])
    return out


def read_schema_columns(df: DataFrame) -> list:
    """Columns actually read from each parquet scan (pruning check)."""
    plan = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees.

    AQE defers codegen until stage materialization, so the adaptive
    plan reports zero subtrees pre-execution; the probe re-plans a
    fresh Dataset with AQE off (conf restored afterwards).
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = explain_str(df.select("*"), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


_PY_EVAL_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def python_eval_nodes(df: DataFrame) -> list:
    """Python-evaluation operators in the plan — the slow path. Native
    -tier operators must return []."""
    plan = explain_str(df, "simple")
    return [n for n in _PY_EVAL_NODES if n in plan]


def count_file_scans(df: DataFrame) -> int:
    """FileScan operators in the physical plan. A tiny result frame
    whose plan re-scans the source parquet N times (un-materialized
    backtest lineage) is an N-fold read amplification at 100 TB."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"FileScan", plan))
