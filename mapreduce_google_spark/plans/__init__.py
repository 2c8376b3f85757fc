"""Physical-plan inspection helpers (pushdown / broadcast / top-k
assertions used by tests and the perf checklist)."""

from mapreduce_google_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filters,
    has_take_ordered,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_pushed_filters",
    "has_take_ordered",
    "wholestage_codegen_spans",
]
