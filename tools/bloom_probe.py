"""Measure the parquet bloom-filter point-lookup win and write
BENCH_bloom_probe.json — the evidence that un-blocks VERDICT r7's
"parquet bloom-filter row-group skipping" item: pyarrow cannot WRITE
bloom filters, but this engine's sinks go through Spark's parquet-mr
writer, which can (``io.write_parquet_bloom``), and Spark's reader
consumes them transparently on pushed equality/IN predicates.

Protocol: a 20M-row corpus with a high-cardinality key written in
arrival order (so min/max zone maps cannot skip anything), once plain
and once bloom-filtered; each layout then serves N_REPS point lookups
on present keys and on guaranteed-miss keys, warm AND (when the
process may write /proc/sys/vm/drop_caches) cold. Misses are the
bloom showcase — every row group skipped. Cold misses approximate the
scale-representative case (at 100 TB data pages are never resident,
so the plain layout pays full data-page IO per lookup while the bloom
layout reads footers + bloom bytes only) — note this guest sits on a
VM disk whose HOST cache cannot be dropped from here, so recorded
cold deltas UNDERSTATE real cold IO; the tail (max rep) is the more
telling column.

Usage: python tools/bloom_probe.py [n_reps]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import write_parquet_bloom  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402

N_REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 7
BASE = "/tmp/mgs_bloom_probe"
ROWS, KEYSPACE, NDV_HINT = 20_000_000, 100_000_000, 3_000_000


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def _try_drop_page_cache() -> bool:
    """Cold-IO mode needs root (/proc/sys/vm/drop_caches); returns
    whether the drop actually happened so cold numbers are only
    recorded when they mean something."""
    import subprocess

    try:
        subprocess.run(
            ["sh", "-c", "sync && echo 3 > /proc/sys/vm/drop_caches"],
            check=True,
            capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def main() -> int:
    spark = get_spark(app_name="mgs-bloom-probe")
    df = spark.range(ROWS).select(
        (F.xxhash64("id") % KEYSPACE).alias("k"), F.col("id").alias("v")
    )
    plain, bloom = f"{BASE}/plain", f"{BASE}/bloom"
    df.repartition(8).write.mode("overwrite").parquet(plain)
    write_parquet_bloom(df.repartition(8), bloom, {"k": NDV_HINT})

    size = lambda p: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(f"{p}/part-*")
    )
    hit_keys = [r.k for r in df.limit(3).collect()]
    # keys outside xxhash64 % KEYSPACE's nonneg range can't exist
    miss_keys = [-(i + 1) for i in range(3)]

    def probe(path: str, keys: list[int], cold: bool = False) -> list:
        xs = []
        for _ in range(N_REPS if not cold else max(3, N_REPS - 2)):
            if cold:
                _try_drop_page_cache()
            t0 = time.perf_counter()
            for k in keys:
                spark.read.parquet(path).where(F.col("k") == k).count()
            xs.append(time.perf_counter() - t0)
        return [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]

    warm = {
        "miss_plain": probe(plain, miss_keys),
        "miss_bloom": probe(bloom, miss_keys),
        "hit_plain": probe(plain, hit_keys),
        "hit_bloom": probe(bloom, hit_keys),
    }
    cold = None
    if _try_drop_page_cache():
        cold = {
            "miss_plain": probe(plain, miss_keys, cold=True),
            "miss_bloom": probe(bloom, miss_keys, cold=True),
        }
    out = {
        "rows": ROWS,
        "files": 8,
        "ndv_hint": NDV_HINT,
        "bytes": {"plain": size(plain), "bloom": size(bloom)},
        "bytes_overhead_pct": round(100 * (size(bloom) / size(plain) - 1), 1),
        "sec_3_lookups_med_min_max_warm": warm,
        "sec_3_lookups_med_min_max_cold": cold,
        "n_reps": N_REPS,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_bloom_probe.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
