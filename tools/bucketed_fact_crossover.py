#!/usr/bin/env python
"""Measure the bucketed-fact-table amortization for t12 (VERDICT r12
item 6): the one-time orderkey-bucketed write of lineitem+orders vs the
per-run saving of the exchange-free plan, at sf0.1 and (if present) the
sf1 copy under /tmp/mgs_sf1.

Writes BENCH_bucketed_fact_crossover.json:
  build_s        — cold store build (both tables) from clean /tmp paths
  direct_s       — median revenue_rollup(form="direct")
  bucketed_s     — median revenue_rollup(form="orderkey_stores"), warm
  (r16 note: the REGISTERED default moved on to the custkey pre-joined
  store — this instrument measures the r12 orderkey-store question and
  binds the forced reference forms, not the default)
  runs_to_amortize — build_s / (direct_s - bucketed_s)

Run on an idle host (concurrent jobs inflate the small-scale medians —
r12 gotcha)."""

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduce_google_spark.io import (  # noqa: E402
    bucketed_fact_table,
    cache_tag,
    shared_store_path,
)
from mapreduce_google_spark.operators.relational import revenue_rollup  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402


def _drop_stores(spark, sf_dir: str) -> None:
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tag = cache_tag(sf_dir, table)
        base = shared_store_path(f"mgs_fact_{table}_{key}_{tag}")
        for d in glob.glob(base + "_k*"):
            shutil.rmtree(d, ignore_errors=True)
    for t in spark.catalog.listTables():
        if t.name.startswith("mgs_fact_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def _median(f, n: int = 5) -> float:
    ts = []
    for _ in range(n):
        t0 = time.time()
        f().collect()
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


def measure(spark, sf_dir: str, n_reps: int) -> dict:
    _drop_stores(spark, sf_dir)
    t0 = time.time()
    bucketed_fact_table(spark, sf_dir, "lineitem", "l_orderkey")
    bucketed_fact_table(spark, sf_dir, "orders", "o_orderkey")
    build_s = time.time() - t0
    # warm both paths once (codegen, footers) before timing
    revenue_rollup(spark, sf_dir, form="orderkey_stores").collect()
    revenue_rollup(spark, sf_dir, form="direct").collect()
    bucketed_s = _median(
        lambda: revenue_rollup(spark, sf_dir, form="orderkey_stores"), n_reps
    )
    direct_s = _median(
        lambda: revenue_rollup(spark, sf_dir, form="direct"), n_reps
    )
    saving = direct_s - bucketed_s
    return {
        "build_s": round(build_s, 3),
        "direct_s": round(direct_s, 3),
        "bucketed_s": round(bucketed_s, 3),
        "saving_per_run_s": round(saving, 3),
        "runs_to_amortize": round(build_s / saving, 1) if saving > 0 else None,
        "n_reps": n_reps,
    }


def main() -> int:
    spark = get_spark(app_name="mgs-bucketed-fact-crossover")
    # warm the bucketed-write path once (codegen + committer init land
    # here, not on the first measured build)
    bucketed_fact_table(spark, "/root/testdata/sf0.001", "orders", "o_orderkey")
    _drop_stores(spark, "/root/testdata/sf0.001")
    out = {
        "what": (
            "one-time orderkey-bucketed fact write vs per-run t12 saving; "
            "the store amortizes after runs_to_amortize executions of THIS "
            "query alone (every other orderkey join shares it)"
        ),
        "by_sf": {},
    }
    out["by_sf"]["sf0.1"] = measure(spark, "/root/testdata/sf0.1", 5)
    sf1 = "/tmp/mgs_sf1"
    if os.path.isdir(sf1):
        out["by_sf"]["sf1"] = measure(spark, sf1, 3)
    path = os.path.join(REPO, "BENCH_bucketed_fact_crossover.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
