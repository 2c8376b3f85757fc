"""Re-measure t11's raw-scan-vs-bucketed-store crossover — VERDICT r14
next-round item 3 (the instrument that retired t33's dispatcher).

t11's window (row_number over o_custkey) dispatches on
``TOPK_WINDOW_STORE_MIN_ROWS`` (500k orders): the r13 probe measured
the raw scan slightly ahead at sf0.1 and the store 1.9x ahead at sf1.
t33's dispatcher died when the same instrument showed its store form
dominating at EVERY scale; this tool asks the identical question for
t11, timing the two branch BODIES directly (the registered function's
own arms, reconstructed here so the dispatcher cannot route around the
form under test — exactly impl_shootout.py's forcing pattern).

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

from mapreduce_google_spark.io import bucketed_fact_table, load_table  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402

K = 3


def _window_topk(orders):
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
    return _window_topk(
        spark.table(bucketed_fact_table(spark, sf_dir, "orders", "o_custkey"))
    )


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
