"""Shoot out the three point-lookup strategies on the same
hash-scattered events layout — the evidence that drove the r15 flip of
t237's default to the bloom layout (since r15 the engine keeps ONE
consolidated bloom-enabled lookup copy; the plain baseline here is a
bench-only artifact).

Strategies (same rows, same 16-file hash-scatter on event_id, so zone
maps prune nothing for any of them):

* ``plain_scan``     — pushed-down filter over the plain layout: every
                       file's row groups are decoded per probe;
* ``posting_index``  — t237's path: LSM posting table names the files
                       that can hold each key, only those are read,
                       then re-filtered (``scale.point_lookup``);
* ``bloom_layout``   — the SAME plain read path but over a
                       ``io.write_parquet_bloom`` copy: no secondary
                       asset at all, row groups self-exclude via their
                       bloom filters on the pushed equality predicate.

Hits and misses probed separately: the posting index wins hits by
reading ≤1 file per key; the bloom layout wins misses (nothing read
anywhere) and costs zero maintenance — no refresh protocol, no
staleness contract, just write-time bytes (~4-20%).

Usage: python tools/bloom_vs_index_shootout.py [sf_dir] [n_reps]
Prints one JSON line; results for both hit and miss probe sets.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.scale import (  # noqa: E402
    POINT_LOOKUP_IDS,
    _indexed_events_path,
    point_lookup,
    refresh_point_index,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 7


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    spark = get_spark(app_name="mgs-bloom-vs-index")
    # since the r15 flip the ENGINE keeps one consolidated lookup copy
    # (bloom-enabled, posting index on top) — the plain baseline layout
    # is now a BENCH-ONLY artifact this tool writes for itself
    bloom = _indexed_events_path(spark, SF_DIR)
    refresh_point_index(spark, bloom, "event_id")
    plain = bloom + "_plainbase"
    if not os.path.exists(os.path.join(plain, "_SUCCESS")):
        (
            load_table(spark, SF_DIR, "events")
            .select("event_id", "event_type", "value")
            .repartition(16, "event_id")
            .write.mode("overwrite")
            .parquet(plain)
        )

    hits = list(POINT_LOOKUP_IDS)
    misses = [-(i + 1) for i in range(len(hits))]  # ids are non-negative

    def plain_scan(keys):
        return (
            spark.read.parquet(plain)
            .where(F.col("event_id").isin(keys))
            .count()
        )

    def posting_index(keys):
        return point_lookup(spark, bloom, "event_id", keys).count()

    def bloom_layout(keys):
        return (
            spark.read.parquet(bloom)
            .where(F.col("event_id").isin(keys))
            .count()
        )

    strategies = {
        "plain_scan": plain_scan,
        "posting_index": posting_index,
        "bloom_layout": bloom_layout,
    }
    # equality gate on hits (miss counts must be 0 everywhere)
    counts = {n: fn(hits) for n, fn in strategies.items()}
    assert len(set(counts.values())) == 1, counts
    assert all(fn(misses) == 0 for fn in strategies.values())

    out: dict = {"sf_dir": SF_DIR, "n_reps": N_REPS, "hit_rows": counts["plain_scan"]}
    for probe_name, keys in (("hit", hits), ("miss", misses)):
        for strat, fn in strategies.items():
            xs = []
            for _ in range(N_REPS):
                t0 = time.perf_counter()
                fn(keys)
                xs.append(time.perf_counter() - t0)
            out[f"{probe_name}_{strat}"] = [
                round(median(xs), 3),
                round(min(xs), 3),
                round(max(xs), 3),
            ]
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
