"""Measure the t18 (brute cosine) vs t25 (IVF) crossover as the probe
workload grows — the serving-scale data point VERDICT r07 item 8 asked
for next to the losing corpus-scan one.

The arithmetic in t25's docstring says: IVF's per-probe scan is
corpus * (n_probe_cells / n_cells) vs corpus for exact, but the
centroid-assignment pass is a fixed corpus-sized cost, so IVF only pays
past roughly assignment_cost / per-probe-saving probes — thousands, not
ten. This tool turns that claim into a measured table at sf1 (10x
corpus): wall + recall for probes x {brute, ivf}.

Usage: python tools/ann_crossover.py [sf_dir] [n_reps]
Writes one JSON line (paste/commit as BENCH_ann_crossover.json).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mgs_sf1"
N_REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
PROBE_COUNTS = [10, 100, 1000]
K = 5


def recall(exact: dict, approx: dict) -> float:
    """Mean per-probe |approx ∩ exact| / k over the probes both answered."""
    hits = total = 0
    for pid, ids in exact.items():
        total += len(ids)
        hits += len(ids & approx.get(pid, set()))
    return round(hits / total, 4) if total else 0.0


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["probe_id"], set()).add(r["vec_id"])
    return out


def main() -> int:
    spark = get_spark(app_name="ann-crossover")
    # untimed warm-up (JVM + codegen)
    cosine_topk(spark, SF_DIR, n_probes=2, k=K).collect()
    table = []
    for n in PROBE_COUNTS:
        row = {"probes": n}
        exact_sets = None
        # full replicates everywhere — the r8 artifact's 1000-probe row
        # was n=1 with a degenerate spread (VERDICT r8 item 5); minutes
        # per rep is the price of a non-degenerate conclusion
        reps = N_REPS
        for label, builder in (("brute", cosine_topk), ("ivf", ivf_topk)):
            walls = []
            sets = None
            for _ in range(reps):
                t0 = time.perf_counter()
                df = builder(spark, SF_DIR, n_probes=n, k=K)
                sets = topk_sets(df)
                walls.append(time.perf_counter() - t0)
            row[f"{label}_wall_s"] = round(statistics.median(walls), 3)
            row[f"{label}_spread"] = [round(min(walls), 3), round(max(walls), 3)]
            if label == "brute":
                exact_sets = sets
            else:
                row["ivf_recall"] = recall(exact_sets, sets)
        table.append(row)
        print(f"# probes={n}: {row}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "k": K,
                "n_reps": N_REPS,
                "note": (
                    "t18 brute vs t25 IVF (n_cells=8, n_probe_cells=3) as the "
                    "probe workload grows; IVF's corpus-sized centroid "
                    "assignment amortizes across probes while brute pays a "
                    "full scan per probe"
                ),
                "table": table,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
