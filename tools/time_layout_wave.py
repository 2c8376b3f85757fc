"""Scaling spot-check for the r7 layout+sketch wave (t224-t234): wall-clock at
sf0.1 vs the 10× corpus (/tmp/mgs_sf1, built by make_scaled_sf.py), with
the one-time layout/ensure cost separated from the steady-state query.

Usage: python tools/time_layout_wave.py [n_reps]
Prints one JSON line:
  {"queries": {name: {"sf0.1": {"ensure": s, "warm": s}, "sf1": ...}}}

"ensure" = first call on a cold /tmp (includes the z-order write /
partition build / upsert / manifest refresh — the amortized cost paid
once per corpus version). "warm" = median of n_reps calls after that
(the per-query cost every later run pays). t226's diff and t230's BM25
have no layout to amortize; their ensure≈warm gap is just plan reuse.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.queries import REGISTRY  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402

WAVE = [
    "t224_zordered_box_revenue",
    "t225_event_corrections_upsert",
    "t226_event_change_summary",
    "t227_manifest_pruned_box_revenue",
    "t228_snapshot_version_totals",
    "t230_bm25_retrieval",
    "t231_events_after_dv_delete",
    "t232_rolling_distinct_users_hll",
    "t233_weekly_retention_theta",
    "t234_order_price_quantiles_kll",
    "t235_variant_props_stats",
    "t236_org_subtree_rollup",
    "t237_indexed_point_lookup",
    "t238_maintained_daily_revenue",
    "t239_chain_maintained_daily_revenue",
]
N = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def clear_wave_tmp() -> None:
    """Remove the wave's per-corpus /tmp artifacts so 'ensure' really
    measures a cold build (matches the _tag naming in operators.scale)."""
    for pat in (
        "/tmp/mgs_zorder_lineitem_*",
        "/tmp/mgs_events_daily_*",
        "/tmp/mgs_events_snapshots_*",
        "/tmp/mgs_events_dv_*",
        "/tmp/mgs_hll_daily_*",
        "/tmp/mgs_events_lookup_*",
        "/tmp/mgs_ivm_chain_*",
    ):
        for d in glob.glob(pat):
            shutil.rmtree(d, ignore_errors=True)
    # reset the per-process memos so the cold paths re-run
    from mapreduce_google_spark.operators import scale

    scale._UPSERTED.clear()
    scale._DV_DELETED.clear()


def time_one(spark, name: str, sf_dir: str) -> dict:
    spec = REGISTRY[name]
    t0 = time.perf_counter()
    spec.builder(spark, sf_dir).toPandas()
    ensure = time.perf_counter() - t0
    warm = []
    for _ in range(N):
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).toPandas()
        warm.append(time.perf_counter() - t0)
    return {
        "ensure": round(ensure, 3),
        "warm": round(statistics.median(warm), 3),
        "warm_spread": [round(min(warm), 3), round(max(warm), 3)],
    }


def main() -> int:
    spark = get_spark(app_name="layout-wave-scaling")
    # untimed JVM/codegen warm-up: the process's first job otherwise
    # lands in the first measured 'ensure' (r7 first run: t224's sf0.1
    # ensure read 8.7s vs 2.8s warmed)
    spark.read.parquet("/root/testdata/sf0.1/events.parquet").count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict = {}
    for sf_dir, label in (
        ("/root/testdata/sf0.1", "sf0.1"),
        ("/tmp/mgs_sf1", "sf1"),
    ):
        if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
            print(f"skip {label}: {sf_dir} missing", file=sys.stderr)
            continue
        clear_wave_tmp()
        for name in WAVE:
            out.setdefault(name, {})[label] = time_one(spark, name, sf_dir)
    print(json.dumps({"n_reps": N, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
