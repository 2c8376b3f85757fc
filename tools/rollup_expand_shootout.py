"""Measure t12's rollup-expand cost: registered form (Expand x3 over
the joined per-customer relation, partial agg on the expanded rows)
vs the two-level candidate (hash-agg at the finest (r_name, n_name)
grain first, rollup the ~|nations|-row result) — VERDICT r14 item 5:
t12 is the most expensive headline by 30% and its fact side is already
exchange-free, so the expand is the residual cost under test.

Equality is gated in-tool and pinned in tests/test_plans.py. Flip only
on a measured win at BOTH tiers; a t12 default change needs an r16
REPROVE slot (both r15 slots went to the t237/t240 consolidation).

Usage: python tools/rollup_expand_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
Prints one JSON line per sf dir with per-form medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.relational import (  # noqa: E402
    revenue_rollup,
    revenue_rollup_twolevel,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

FORMS = {
    "registered_expand_full": revenue_rollup,
    "twolevel_preagg": revenue_rollup_twolevel,
}


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    argv = sys.argv[1:]
    reps = 5
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dirs = args or ["/root/testdata/sf0.1", "/tmp/mgs_sf1"]
    spark = get_spark(app_name="mgs-rollup-shootout")
    for sf_dir in sf_dirs:
        # warm (store ensure, codegen, footers) + equality gate
        results = {n: fn(spark, sf_dir).toPandas() for n, fn in FORMS.items()}
        # rollup subtotal rows carry None keys — sort None-safely
        def _key(t):
            return tuple((v is None, v) for v in t)

        vals = {
            n: sorted(map(tuple, df.itertuples(index=False)), key=_key)
            for n, df in results.items()
        }
        assert (
            vals["registered_expand_full"] == vals["twolevel_preagg"]
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
            "rows": len(results["twolevel_preagg"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
