"""Measure t12's forms. History: r15 asked whether the rollup Expand
x3 was the residual cost — the two-level candidate (hash-agg at the
finest grain first, rollup the ~30-row result) was a WASH at every
measured tier (sf0.1/sf1/sf3), settling that the expand was never the
dominant cost; the join chain was. The r16 measurement answered the
real question (VERDICT r15 item 3): the custkey-bucketed PRE-JOINED
lineitem ⋈ orders store removes the per-order join AND the
per-customer exchange from query time — medians 0.875/1.418 sf0.1
(−38%), 1.055/3.032 sf1 (−65%), 2.087/7.636 sf3 (−73%), spreads fully
separated — so ``prejoined`` now IS the registered builder (bound
directly; the tool can never silently measure a drifted form) and the
two join-at-query-time forms are its forced references. The retired
twolevel candidate is gone from the package (its question is closed).

Equality is gated in-tool and pinned in tests/test_plans.py. A future
default change needs a fresh win that separates from the spread plus a
REPROVE slot.

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
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

FORMS = {
    "prejoined_store": revenue_rollup,  # registered default
    "orderkey_stores": lambda spark, sf_dir: revenue_rollup(
        spark, sf_dir, form="orderkey_stores"
    ),
    "direct": lambda spark, sf_dir: revenue_rollup(
        spark, sf_dir, form="direct"
    ),
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
        ref = vals["prejoined_store"]
        for n, v in vals.items():
            assert v == ref, f"form {n} disagrees with registered"
        samples: dict[str, list[float]] = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                samples[name].append(time.perf_counter() - t0)
        out = {
            "sf_dir": sf_dir,
            "n_reps": reps,
            "rows": len(results["prejoined_store"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
