"""Measure the 100× scaling point and fold it into BENCH_sf1.json as
``sf10_point`` — the tier that answers "would this survive 100× the
data?" with a measurement instead of an argument (r17; the 10×/30×
points are BENCH_sf1.json / sf3_point).

Protocol matches bench_sf3_point.py (per-query MIN of two independent
bench processes' medians, n=2 and n=3), with one addition: an explicit
UNTIMED warm run (n=1) first, because at 100× the store cold builds
(prejoined line store over ~60 M lineitem rows, band + shingle stores
over 500 k docs, bucketed fact copies) take long enough that folding
them into the first timed run's median would misattribute build cost
to query cost — the r15 cold-adoption catch, now structural. The warm
run's wall time is recorded separately as the honest cold-build bill.

Usage: python tools/bench_sf10_point.py [sf10_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mgs_sf10"


def run_bench(sf_dir: str, n: int, timeout: int = 5400) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_N=str(n))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        check=True,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    if not os.path.exists(os.path.join(SF10_DIR, "embeddings.parquet")):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_scaled_sf.py"),
                "100",
                "/root/testdata/sf0.1",
                SF10_DIR,
            ],
            check=True,
            timeout=3600,
        )
    t0 = time.perf_counter()
    warm = run_bench(SF10_DIR, 1)
    warm_wall = round(time.perf_counter() - t0, 3)
    runs = [run_bench(SF10_DIR, 2), run_bench(SF10_DIR, 3)]
    queries = {
        q: round(min(r["queries"][q] for r in runs), 3)
        for q in runs[0]["queries"]
    }
    path = os.path.join(REPO, "BENCH_sf1.json")
    with open(path) as fh:
        base = json.load(fh)
    sf01 = base["sf01_reference_queries"]
    base["sf10_point"] = {
        "metric": (
            "same 16 headline queries at 100x sf0.1 (per-query MIN of two "
            "independent runs' medians, n=2 and n=3; explicit untimed warm "
            "run first so store cold builds never leak into query medians)"
        ),
        "value": round(sum(queries.values()), 3),
        "queries": queries,
        "run_totals": [r["value"] for r in runs],
        "n_reps": [2, 3],
        "data_factor": 100,
        "warm_run_wall_s": warm_wall,
        "warm_run_total": warm["value"],
        "scaling_vs_sf01": {
            q: round(queries[q] / sf01[q], 2) for q in queries if sf01.get(q)
        },
    }
    with open(path, "w") as fh:
        json.dump(base, fh, indent=1)
        fh.write("\n")
    print(json.dumps(base["sf10_point"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
