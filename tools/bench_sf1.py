"""Regenerate BENCH_sf1.json: run bench.py at sf0.1 and at the 10×
corpus (/tmp/mgs_sf1, built by make_scaled_sf.py if absent), with
n_reps≥3 at BOTH tiers so the scaling table has spreads, then write the
combined scaling curve.

Usage: python tools/bench_sf1.py [n_reps_sf1] [n_reps_sf01]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SF1 = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N_SF01 = int(sys.argv[2]) if len(sys.argv) > 2 else 5
SF1_DIR = "/tmp/mgs_sf1"


def run_bench(sf_dir: str, n: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_N=str(n))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        check=True,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    if not os.path.exists(os.path.join(SF1_DIR, "embeddings.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_scaled_sf.py")],
            check=True,
            timeout=600,
        )
    sf01 = run_bench("/root/testdata/sf0.1", N_SF01)
    sf1 = run_bench(SF1_DIR, N_SF1)
    scaling = {
        q: round(sf1["queries"][q] / sf01["queries"][q], 2)
        for q in sf1["queries"]
        if sf01["queries"].get(q)
    }
    result = {
        "metric": (
            f"total wall-clock of {len(sf1['queries'])} headline queries at "
            f"sf1 (median of {N_SF1} runs, Arrow materialization)"
        ),
        "value": sf1["value"],
        "unit": "sec",
        "sf": 1.0,
        "queries": sf1["queries"],
        "spread_min_max": sf1["spread_min_max"],
        "n_reps": N_SF1,
        "scaling_vs_sf01": scaling,
        "sf01_reference_total": sf01["value"],
        "sf01_reference_queries": sf01["queries"],
        "sf01_spread_min_max": sf01["spread_min_max"],
        "sf01_n_reps": N_SF01,
        "t25_ivf_recall_vs_exact_t18_sf1": sf1.get("t25_ivf_recall_vs_exact_t18"),
        "data_factor": 10,
        "provenance": "tools/bench_sf1.py (corpus from tools/make_scaled_sf.py)",
    }
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps({"total_sf1": sf1["value"], "total_sf01": sf01["value"],
                      "worst_scaling": max(scaling.values()),
                      "worst_query": max(scaling, key=scaling.get)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
