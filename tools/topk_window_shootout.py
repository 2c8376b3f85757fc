"""Re-measure t11's raw-scan-vs-bucketed-store question — the
instrument whose r15 evidence (BENCH_topk_window_shootout.json: sf0.1
wash, sf1 store 3.1x) RETIRED the ``TOPK_WINDOW_STORE_MIN_ROWS``
dispatcher in r16, the same verdict shape that retired t33's.

Since r16 the ``bucketed_store`` form IS the registered builder
(``relational.top_orders_per_customer`` — bound directly, so the tool
can never silently measure a form that drifted from the package;
VERDICT r15 wrong #3), and ``raw_scan`` is the HISTORICAL reference —
the retired branch body, kept hand-built here because it no longer
exists in the package. The in-tool equality gate keeps the comparison
honest on every re-measurement.

Usage: python tools/topk_window_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
Prints one JSON line per sf dir with per-form medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.relational import (  # noqa: E402
    top_orders_per_customer,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

K = 3


def _window_topk(orders):
    # the RETIRED raw branch body (historical reference — r16 deleted it
    # from the package; see module docstring)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= K)
        .orderBy("o_custkey", "rn")
    )


def raw_scan(spark, sf_dir):
    return _window_topk(load_table(spark, sf_dir, "orders"))


def bucketed_store(spark, sf_dir):
    return top_orders_per_customer(spark, sf_dir, k=K)


FORMS = {"raw_scan": raw_scan, "bucketed_store": bucketed_store}


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
    spark = get_spark(app_name="mgs-topk-shootout")
    for sf_dir in sf_dirs:
        # warm: store build (ensure, untimed), codegen, parquet footers —
        # and the equality gate between the two forms
        results = {n: fn(spark, sf_dir).toPandas() for n, fn in FORMS.items()}
        vals = {
            n: sorted(map(tuple, df.itertuples(index=False)))
            for n, df in results.items()
        }
        assert vals["raw_scan"] == vals["bucketed_store"], "forms disagree"
        samples: dict[str, list[float]] = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                samples[name].append(time.perf_counter() - t0)
        out = {
            "sf_dir": sf_dir,
            "n_reps": reps,
            "rows": len(results["raw_scan"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
