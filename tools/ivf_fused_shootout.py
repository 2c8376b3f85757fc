"""Shoot out t25's r13/r14 form (JVM-HOF scoring + separate Arrow fold
crossing) against the FUSED score+fold kernel, registered as t25's
default since r15 — the decision evidence for VERDICT r14 "What's
wrong #2" (the fold's extra JVM→Python→JVM crossing was the one r14
ABBA regression, +2.6%).

Both forms read the same materialized cell-bucketed IVF index and
produce identical rows (pinned in tests/test_approx_ops.py); the only
difference is where candidate scoring runs and how many Arrow
crossings the score→fold region pays. The r15 run measured the fused
kernel ahead at both tiers (BENCH_ivf_fused_shootout.json) and the
default flipped; the tool stays for re-measurement.

Usage: python tools/ivf_fused_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
Prints one JSON line per sf dir with per-form medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.similarity import (  # noqa: E402
    ivf_topk_from_index,
    ivf_topk_from_index_fused,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

FORMS = {
    "registered_hof_plus_fold": ivf_topk_from_index,
    "fused_kernel": ivf_topk_from_index_fused,
}


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    sf_dirs = args or ["/root/testdata/sf0.1", "/tmp/mgs_sf1"]
    spark = get_spark(app_name="mgs-ivf-fused-shootout")
    for sf_dir in sf_dirs:
        # warm (index ensure, codegen, footers) + equality gate
        results = {n: fn(spark, sf_dir).toPandas() for n, fn in FORMS.items()}
        vals = {
            n: sorted(map(tuple, df.itertuples(index=False)))
            for n, df in results.items()
        }
        assert (
            vals["registered_hof_plus_fold"] == vals["fused_kernel"]
        ), "forms disagree"
        samples: dict[str, list[float]] = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                samples[name].append(time.perf_counter() - t0)
        out = {
            "sf_dir": sf_dir,
            "n_reps": reps,
            "rows": len(results["fused_kernel"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
