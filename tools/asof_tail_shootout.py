"""Measure t33's TAIL cost: the registered stores form (date_format on
the as-of timestamp) vs the cast-tail candidate (cast to string — the
value-identical swap BENCH_asof_tail_decomposition.json measured at
−32% of the whole query at sf3, where t33 is the worst 30× scaler).

The candidate reconstructs the registered stores body with ONE change
— ``cast(o_orderdate as string)`` instead of ``date_format(...,
'yyyy-MM-dd HH:mm:ss')`` — the impl_shootout forcing pattern, because
the swap is the r17 flip under test and must not exist as a package
path until it lands with its REPROVE slot. Value identity holds
because o_orderdate is a midnight timestamp_ntz: Spark's
timestamp→string cast renders 'yyyy-MM-dd HH:mm:ss' and omits the zero
fraction, so the strings are byte-identical — the in-tool equality
gate asserts exactly that on every run.

Usage: python tools/asof_tail_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
Prints one JSON line per sf dir with per-form medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import bucketed_fact_table  # noqa: E402
from mapreduce_google_spark.operators.relational import (  # noqa: E402
    asof_latest_order,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


def cast_tail(spark, sf_dir):
    # the registered stores body (relational.asof_latest_order_stores)
    # with date_format -> cast: the r17 candidate under test
    orders = spark.table(bucketed_fact_table(spark, sf_dir, "orders", "o_custkey"))
    events = spark.table(bucketed_fact_table(spark, sf_dir, "events", "user_id"))
    hist = orders.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t"),
                    F.col("o_orderkey"),
                    F.col("o_orderdate"),
                )
            )
        ).alias("hist")
    )
    ev = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_ev"),
    )
    best = F.try_element_at(
        F.filter("hist", lambda o: o["t"] <= F.col("t_ev")), F.lit(-1)
    )
    return (
        ev.join(hist, ev.user_id == hist.o_custkey)
        .select(
            "event_id",
            "user_id",
            best.getField("o_orderkey").alias("o_orderkey"),
            best.getField("o_orderdate").cast("string").alias("order_ts"),
        )
        .where(F.col("o_orderkey").isNotNull())
        .orderBy("event_id")
    )


FORMS = {
    "registered_dateformat": asof_latest_order,  # dispatcher -> stores default
    "cast_tail": cast_tail,
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
    spark = get_spark(app_name="mgs-asof-tail-shootout")
    for sf_dir in sf_dirs:
        # warm (store ensure, codegen) + BYTE-IDENTICAL string equality gate
        results = {n: fn(spark, sf_dir).toPandas() for n, fn in FORMS.items()}
        vals = {
            n: sorted(map(tuple, df.itertuples(index=False)))
            for n, df in results.items()
        }
        assert vals["registered_dateformat"] == vals["cast_tail"], (
            "cast tail is NOT value-identical to date_format on this corpus"
        )
        samples: dict[str, list[float]] = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                samples[name].append(time.perf_counter() - t0)
        out = {
            "sf_dir": sf_dir,
            "n_reps": reps,
            "rows": len(results["cast_tail"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
