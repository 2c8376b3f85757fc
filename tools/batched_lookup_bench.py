"""Measure the three batched point-lookup regimes at the 10x corpus:
isin() literals (needle batches), broadcast semi-join (driver-list
batches past POINT_LOOKUP_ISIN_MAX), and the DataFrame probe path fed
from a key FILE via spark.read.text (VERDICT r10 item 7 — the shape for
key sets past driver memory; past POINT_LOOKUP_BROADCAST_MAX measured
keys it shuffles instead of broadcasting).

Usage: python tools/batched_lookup_bench.py [sf_dir] [n_reps]
       python tools/batched_lookup_bench.py --crossover [sf_dir] [n_reps]
Defaults: /tmp/mgs_sf1 (the 10x replica from make_scaled_sf.py), 3.
Writes one JSON line (paste/commit as BENCH_batched_lookup.json).
--crossover instead sweeps isin vs semi-join walls over key-batch
sizes — the measurement POINT_LOOKUP_ISIN_MAX is set from.

Each timing covers the full user-visible lookup: steady-state index
refresh check, probe, posted-file read, re-filter, count. The index is
built once up front (build wall reported separately) — steady state is
the regime the contract optimizes.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.operators.scale import (  # noqa: E402
    _indexed_events_path,
    point_lookup,
    point_lookup_df,
    refresh_point_index,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _pos[0] if _pos else "/tmp/mgs_sf1"
N_REPS = int(_pos[1]) if len(_pos) > 1 else 3
KEYFILE = "/tmp/mgs_batched_lookup_keys_2m.txt"


def _median_wall(fn) -> tuple[float, int]:
    walls, rows = [], None
    for _ in range(N_REPS):
        t0 = time.monotonic()
        rows = fn().count()
        walls.append(round(time.monotonic() - t0, 3))
    return statistics.median(walls), rows


def _crossover(spark, path) -> int:
    """Sweep isin vs semi-join lookup walls over batch sizes; each point
    forces one strategy by pinning POINT_LOOKUP_ISIN_MAX."""
    import mapreduce_google_spark.operators.scale as scale

    def timed(n: int, force: str) -> float:
        old = scale.POINT_LOOKUP_ISIN_MAX
        scale.POINT_LOOKUP_ISIN_MAX = 10**9 if force == "isin" else 0
        try:
            walls = []
            for _ in range(N_REPS):
                t0 = time.monotonic()
                point_lookup(spark, path, "event_id", list(range(n))).count()
                walls.append(time.monotonic() - t0)
            return round(statistics.median(walls), 3)
        finally:
            scale.POINT_LOOKUP_ISIN_MAX = old

    table = {
        n: {"isin_s": timed(n, "isin"), "semijoin_s": timed(n, "join")}
        for n in (10, 50, 200, 500, 1_000, 2_000)
    }
    print(
        json.dumps(
            {
                "what": (
                    "isin vs semi-join lookup wall by probe-batch size "
                    "(median of n_reps) — POINT_LOOKUP_ISIN_MAX is set at "
                    "the crossover"
                ),
                "sf_dir": SF_DIR,
                "n_reps": N_REPS,
                "by_batch_size": table,
                "configured_isin_max": (
                    __import__(
                        "mapreduce_google_spark.operators.scale",
                        fromlist=["POINT_LOOKUP_ISIN_MAX"],
                    ).POINT_LOOKUP_ISIN_MAX
                ),
            }
        )
    )
    return 0


def main() -> int:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    path = _indexed_events_path(spark, SF_DIR)
    if "--crossover" in sys.argv:
        refresh_point_index(spark, path, "event_id")
        return _crossover(spark, path)

    t0 = time.monotonic()
    refresh_point_index(spark, path, "event_id")
    build_wall = round(time.monotonic() - t0, 3)

    if not os.path.exists(KEYFILE):
        with open(KEYFILE, "w") as fh:
            for i in range(2_000_000):
                fh.write(f"{i}\n")

    from mapreduce_google_spark.operators.scale import POINT_LOOKUP_ISIN_MAX

    isin_wall, isin_rows = _median_wall(
        lambda: point_lookup(
            spark, path, "event_id", list(range(POINT_LOOKUP_ISIN_MAX))
        )
    )
    bcast_wall, bcast_rows = _median_wall(
        lambda: point_lookup(spark, path, "event_id", list(range(100_000)))
    )
    df_wall, df_rows = _median_wall(
        lambda: point_lookup_df(
            spark,
            path,
            "event_id",
            spark.read.text(KEYFILE).select(F.trim("value").alias("key")),
        )
    )

    n_rows = spark.read.parquet(path).count()
    rec = {
        "what": (
            "batched point-lookup regimes at the 10x corpus: steady-state "
            "lookup wall (median of n_reps, full probe->read->refilter->"
            "count) for isin literals / broadcast semi-join / file-fed "
            "DataFrame probes (2M keys, past POINT_LOOKUP_BROADCAST_MAX "
            "-> shuffled semi-join, never a driver list)"
        ),
        "sf_dir": SF_DIR,
        "table_rows": n_rows,
        "index_build_or_checkup_wall_s": build_wall,
        "n_reps": N_REPS,
        "regimes": {
            f"isin_{POINT_LOOKUP_ISIN_MAX}_keys": {
                "wall_s": isin_wall,
                "hits": isin_rows,
            },
            "broadcast_semijoin_100k_keys": {
                "wall_s": bcast_wall,
                "hits": bcast_rows,
            },
            "dataframe_2m_keys_from_file": {
                "wall_s": df_wall,
                "hits": df_rows,
            },
        },
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
