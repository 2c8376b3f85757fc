"""Registry-wide plan-quality gate: EVERY registered query's physical
plan is free of the two anti-patterns that kill 100 TB jobs —
row-at-a-time Python evaluation (``BatchEvalPython*``: each row pickled
across the Python boundary; the Arrow-batched nodes ArrowEvalPython /
MapInPandas / FlatMap*InPandas / ArrowEvalPythonUDTF are the sanctioned
forms) and non-broadcast cartesian products (``CartesianProduct``: an
all-pairs shuffle join; single-row/dimension cross joins must resolve to
BroadcastNestedLoopJoin).

Unlike the targeted gates in test_plans.py, this sweep is a REGRESSION
NET: a new query (or a refactor of an old one) that slips a per-row UDF
or an unbroadcast cross join into any of the 130+ registered plans fails
here by name, without anyone having to remember to write its gate.
"""

from __future__ import annotations

import re

import pytest

from mapreduce_google_spark.plans import formatted_plan
from mapreduce_google_spark.queries import EAGER_BUILD, REGISTRY

#: nodes that pickle rows one at a time across the Python boundary
ROW_PYTHON = re.compile(r"\bBatchEvalPython\w*\b")
#: the non-broadcast all-pairs join
CARTESIAN = re.compile(r"\bCartesianProduct\b")


def _ran_nonlisting_jobs(spark, group: str) -> bool:
    """Did any Spark job in ``group`` do more than parquet file listing?
    Evicted job/stage info (spark.ui.retained* pressure) counts as NO —
    the check must not flake on status-store retention."""
    tracker = spark.sparkContext.statusTracker()
    for j in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None and not si.name.startswith("parquet at "):
                return True
    return False


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_has_no_scale_antipatterns(name, spark, sf_dir):
    sc = spark.sparkContext
    sc.setJobGroup(f"build-{name}", name)
    try:
        df = REGISTRY[name].builder(spark, sf_dir)
    finally:
        sc.setJobGroup(None, None)
    # construction-time eagerness contract (VERDICT r07 item 7): only
    # EAGER_BUILD members may run real Spark jobs before the DataFrame
    # executes — everything else must be lazy, so sweeps/tools that
    # build all 200+ DataFrames don't silently pay cluster time
    assert name in EAGER_BUILD or not _ran_nonlisting_jobs(
        spark, f"build-{name}"
    ), (
        f"{name}: builder ran Spark jobs during construction but is not "
        "in queries.EAGER_BUILD — make it lazy or add it to the ledger "
        "with a (profile)/(ensure)/(stream) reason"
    )
    plan = formatted_plan(df)
    row_py = ROW_PYTHON.findall(plan)
    assert not row_py, (
        f"{name}: row-at-a-time Python node(s) {sorted(set(row_py))} in plan "
        "— use pandas_udf / mapInPandas / useArrow=True instead"
    )
    assert not CARTESIAN.search(plan), (
        f"{name}: CartesianProduct in plan — broadcast the small side "
        "(single-row totals and dimension tables must build a "
        "BroadcastNestedLoopJoin)"
    )
