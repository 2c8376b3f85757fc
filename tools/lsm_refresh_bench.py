"""Measure the LSM point-index refresh contract at the 10x corpus:
appending ONE small source file to an indexed table must cost O(new
postings), not O(index) — the r9 verdict's 'done' criterion for the
segment-based refresh, as a number instead of an mtime assertion.

Usage: python tools/lsm_refresh_bench.py [sf_dir] [n_reps]
Writes one JSON line (paste/commit as BENCH_lsm_refresh.json):
full initial build wall, per-append refresh wall (n_reps appends, each
its own segment), and the compaction wall when the segment budget
trips. The table is a hash-scattered copy of events (the t237 layout).
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

from mapreduce_google_spark.operators.scale import (  # noqa: E402
    INDEX_COMPACT_SEGMENTS,
    point_lookup,
    refresh_point_index,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mgs_sf1"
N_REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
TBL = "/tmp/mgs_lsm_bench_tbl"


def main() -> int:
    spark = get_spark(app_name="lsm-refresh-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    shutil.rmtree(TBL, ignore_errors=True)
    (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", "event_type", "value")
        .repartition(32, "event_id")
        .write.mode("overwrite")
        .parquet(TBL)
    )
    n_rows = spark.read.parquet(TBL).count()

    t0 = time.perf_counter()
    idx_dir = refresh_point_index(spark, TBL, "event_id")
    build_s = time.perf_counter() - t0

    appends = []
    for i in range(N_REPS):
        stage = f"{TBL}_stage{i}"
        (
            spark.createDataFrame(
                [(10_000_000_000 + i, "probe", 1.0)],
                "event_id long, event_type string, value double",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = glob.glob(os.path.join(stage, "*.parquet"))[0]
        os.rename(part, os.path.join(TBL, f"part-extra-{i}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
        t0 = time.perf_counter()
        refresh_point_index(spark, TBL, "event_id")
        appends.append(round(time.perf_counter() - t0, 3))

    # probe correctness + wall across segments
    t0 = time.perf_counter()
    got = point_lookup(
        spark, TBL, "event_id", [10_000_000_000, 10_000_000_000 + N_REPS - 1]
    ).count()
    lookup_s = time.perf_counter() - t0
    assert got == 2, got

    # force the budget to trip: keep appending until a compaction runs
    compact_s = None
    sidecar = os.path.join(idx_dir, "_covered_files.json")
    for i in range(N_REPS, INDEX_COMPACT_SEGMENTS + 1):
        stage = f"{TBL}_stage{i}"
        (
            spark.createDataFrame(
                [(10_000_000_000 + i, "probe", 1.0)],
                "event_id long, event_type string, value double",
            )
            .coalesce(1).write.mode("overwrite").parquet(stage)
        )
        part = glob.glob(os.path.join(stage, "*.parquet"))[0]
        os.rename(part, os.path.join(TBL, f"part-extra-{i}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
        before = json.load(open(sidecar))["segments"]
        t0 = time.perf_counter()
        refresh_point_index(spark, TBL, "event_id")
        wall = round(time.perf_counter() - t0, 3)
        if json.load(open(sidecar))["segments"] < before:
            compact_s = wall
            break

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "table_rows": n_rows,
                "initial_build_s": round(build_s, 3),
                "append_refresh_s": appends,
                "append_refresh_median_s": round(statistics.median(appends), 3),
                "budget_compaction_s": compact_s,
                "cross_segment_lookup_s": round(lookup_s, 3),
                "note": (
                    "one-row appends to a hash-scattered indexed copy of "
                    "events; append refresh writes only its own delta "
                    "segment (O(new)), the budgeted compaction pays the "
                    "O(index) merge once per INDEX_COMPACT_SEGMENTS="
                    f"{INDEX_COMPACT_SEGMENTS} refreshes"
                ),
            }
        )
    )
    shutil.rmtree(TBL, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
