"""Time alternative implementations of the same operator contract at a
given sf dir — the evidence for which form gets registered at which
scale (VERDICT r05 items 3 & 4).

Usage: python tools/impl_shootout.py [sf_dir] [n_reps]
Prints one JSON line with per-impl medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.events import (  # noqa: E402
    session_window_stats,
    session_window_stats_native,
)
from mapreduce_google_spark.operators.relational import (  # noqa: E402
    asof_latest_order,
    asof_latest_order_pandas,
    asof_latest_order_stores,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

IMPLS = {
    # force the union-merge form: the t33 dispatcher would otherwise
    # route large sf dirs to the cogroup path and the shootout would
    # time the dispatcher, not the candidate
    "t33_asof_union_merge": lambda spark, sf: asof_latest_order(
        spark, sf, form="union_merge"
    ),
    "t33_asof_bucketed_stores": asof_latest_order_stores,
    "t50_asof_cogrouped_pandas": asof_latest_order_pandas,
    "t16_session_islands": session_window_stats,
    "t16_session_native": session_window_stats_native,
}


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    spark = get_spark(app_name="mgs-shootout")
    # warm each impl once untimed (codegen, parquet footers)
    for fn in IMPLS.values():
        len(fn(spark, SF_DIR).toPandas())
    samples: dict[str, list[float]] = {n: [] for n in IMPLS}
    for _ in range(N_REPS):
        for name, fn in IMPLS.items():
            t0 = time.perf_counter()
            len(fn(spark, SF_DIR).toPandas())
            samples[name].append(time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_reps": N_REPS,
                "median_sec": {n: round(median(xs), 3) for n, xs in samples.items()},
                "spread_min_max": {
                    n: [round(min(xs), 3), round(max(xs), 3)]
                    for n, xs in samples.items()
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
