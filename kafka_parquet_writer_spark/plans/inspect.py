"""Inspect Catalyst physical plans — the engine's perf regression gates.

We don't build a custom optimizer (SURVEY.md §4.3: every operator is a
built-in composition, Catalyst does pushdown/pruning/join selection).
What we DO own is verifying the plans we ship are the plans we want:
filters reach the parquet scan, projections prune the read schema,
small dims broadcast. Tests assert these with the helpers below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain('formatted'))."""
    jdf = df._jdf  # noqa: SLF001
    jvm = df.sparkSession._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan node's PushedFilters mentions every fragment."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    blob = "\n".join(pushed)
    return all(frag in blob for frag in fragments)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the parquet scan's ReadSchema (first scan node)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)
            if len(inner) == 2:
                body = inner[1].rsplit(">", 1)[0]
                cols.extend(f.split(":")[0].strip() for f in body.split(",") if f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in (
        formatted_plan(df)
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the (pre-AQE) physical plan —
    the engine's shuffle budget per operator. Broadcast exchanges are
    not counted."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(")
        and " Exchange" in line
        and "BroadcastExchange" not in line
    )


def simple_plan(df: DataFrame) -> str:
    """The simple physical plan string (node args inline on each line) —
    for gates that need an operator's spec (e.g. a Window's partition
    columns) on the same line as the node name."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
