"""Plan inspection: the 100 TB checklist as code.

A plan that silently stops pushing filters into the parquet scan, drops a
broadcast to a shuffled join, or falls out of whole-stage codegen is a
regression that small-scale correctness tests can't see — these helpers
let tests pin the plan properties that matter at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan node reports PushedFilters containing every
    fragment (column names are enough to prove pushdown happened)."""
    plan = formatted_plan(df)
    if "PushedFilters: []" in plan and fragments:
        return False
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    return bool(pushed) and all(any(f in ln for ln in pushed) for f in fragments)


def has_broadcast_join(df: DataFrame, at_least: int = 1) -> bool:
    return formatted_plan(df).count("BroadcastHashJoin") >= at_least


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages in the FINAL plan. With AQE the
    un-executed plan carries no codegen annotation at all, so this executes
    the DataFrame (cheap at test scale) and reads the finalized executed
    plan, where codegen stages appear as ``*(n)`` markers."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    return final.count("*(")
