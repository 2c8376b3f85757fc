"""Incremental view maintenance (t238): the maintained aggregate view
must equal a full recomputation over the merged table, and its plan must
never read the merged/upserted table — maintenance is view ⊕ Δagg, one
narrow scan of the delta's day slice."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_google_spark.operators.scale import (
    _corrections_delta,
    _events_source,
    maintained_daily_revenue,
)
from mapreduce_google_spark.plans import formatted_plan


def test_maintained_view_equals_recomputation(spark, sf_dir):
    """view_v1 ⊕ Δagg == groupBy over the relationally-merged table —
    the abelian-group maintenance law, checked in-engine (the driver
    checks the same thing against DuckDB)."""
    maintained = {
        (str(r["day"]), r["n_events"], r["sum_value"])
        for r in maintained_daily_revenue(spark, sf_dir).collect()
    }
    ev = _events_source(spark, sf_dir)
    delta = _corrections_delta(ev)
    merged = (
        ev.join(delta.select("event_id"), ["event_id"], "left_anti")
        .unionByName(delta)
    )
    recomputed = {
        (str(r["day"]), r["n_events"], r["sum_value"])
        for r in merged.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .collect()
    }
    assert maintained == recomputed


def test_maintenance_never_reads_the_merged_table(spark, sf_dir):
    """The plan must scan the SOURCE events parquet only — no
    /tmp/mgs_events_daily_* (the materialized upserted table) and no
    join against a second corpus-sized relation; the delta contribution
    comes from one filtered day slice."""
    plan = formatted_plan(maintained_daily_revenue(spark, sf_dir))
    assert "mgs_events_daily" not in plan
    # every scan in the plan is the source events table (formatted mode
    # puts the path on the Location detail line, not the Scan node line)
    locs = [ln for ln in plan.splitlines() if "Location" in ln]
    assert locs and all("events.parquet" in ln for ln in locs), locs
    # the day slice must reach the scan as a pushed filter
    assert "PushedFilters" in plan
