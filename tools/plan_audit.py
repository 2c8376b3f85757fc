"""Emit a compact plan-property audit of the headline queries.

Usage: python tools/plan_audit.py [sf_dir] > PLANS_rNN.md

For each headline query: exchange count, broadcast count,
TakeOrderedAndProject presence, pushed-filter presence, and
global-sort count — the same properties the plan gates in
tests/test_plans*.py pin, but summarized per round as a reviewable
artifact. Parses `explain("formatted")` output; counts are from the
compile-time physical plan (AQE may coalesce exchanges / split skew at
runtime, always in the favorable direction).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.queries import REGISTRY  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


#: the r7 layout/sketch wave — audited as a second section so the
#: artifact shows the table-maintenance plans, not just the headliners
WAVE = tuple(f"t2{n}" for n in range(24, 41))


def _audit_rows(spark, names_specs):
    for name, spec in names_specs:
        df = spec.builder(spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # tree lines are "Exchange (N)" / "BroadcastExchange (N)";
        # negative lookbehind keeps the substring match apart
        n_ex = len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan))
        n_bc = len(re.findall(r"BroadcastExchange \(\d+\)", plan))
        topk = "yes" if "TakeOrderedAndProject" in plan else "-"
        pushed = (
            "yes"
            if re.search(r"PushedFilters: \[[^\]]", plan)
            else "-"
        )
        n_sort = len(re.findall(r"(?m)^\s*(?:[:+|\- ]*)Sort \(\d+\)", plan))
        print(
            f"| {name} | {n_ex} | {n_bc} | {topk} | {pushed} | {n_sort} |"
        )


HEADER = (
    "| query | exchanges | broadcasts | TakeOrderedAndProject | "
    "pushed filters | sorts |\n|---|---|---|---|---|---|"
)


def main() -> int:
    spark = get_spark(app_name="plan-audit", master="local[8]")
    print(f"# Plan audit — headline queries at {SF}\n")
    print(HEADER)
    _audit_rows(
        spark,
        [(n, s) for n, s in sorted(REGISTRY.items()) if s.headline],
    )
    print("\n## Layout & sketch wave (t224–t239)\n")
    print(HEADER)
    _audit_rows(
        spark,
        [
            (n, s)
            for n, s in sorted(REGISTRY.items())
            if n.split("_")[0] in WAVE
        ],
    )
    print(
        "\nNotes: 'exchanges' = shuffle exchanges (broadcast exchanges"
        " listed separately); plans are pre-AQE compile shapes — AQE"
        " coalesces/skew-splits at runtime. Structural regressions on"
        " these properties are test-gated (tests/test_plans*.py);"
        " this artifact is the per-round human-readable snapshot."
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
