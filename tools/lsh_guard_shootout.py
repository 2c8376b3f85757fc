"""Measure t22's bucket-size guard: the registered counted form
(``bucket_n`` stamped at build, guard is a pushed filter — the r17
default, flipped on BENCH_t22_guard_probe.json) vs the pre-r17
reference form (per-query aggregation of the band table + broadcast
anti-join, forced via ``guard="agg_antijoin"``).

Both forms bind the REGISTERED builder — the default call and its
forced reference form (the r16 staging-era split function was merged
into the builder when the flip landed). Equality is gated in-tool on
the full pair output. Interleaved reps — the only measurement shape
this repo accepts as flip evidence (see
BENCH_asof_tail_decomposition.json for the sequential-probe lesson).

Usage: python tools/lsh_guard_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
Prints one JSON line per sf dir with per-form medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools  # noqa: E402

from mapreduce_google_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs_from_bands,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

FORMS = {
    "reference_agg_antijoin_guard": functools.partial(
        minhash_lsh_pairs_from_bands, guard="agg_antijoin"
    ),
    "registered_counted_filter_guard": minhash_lsh_pairs_from_bands,
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
    spark = get_spark(app_name="mgs-lsh-guard-shootout")
    for sf_dir in sf_dirs:
        # warm (store ensure — the counted table builds here, untimed) +
        # full-output equality gate
        results = {n: fn(spark, sf_dir).toPandas() for n, fn in FORMS.items()}
        vals = {
            n: sorted(map(tuple, df.itertuples(index=False)))
            for n, df in results.items()
        }
        ref = vals["registered_counted_filter_guard"]
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
            "rows": len(results["registered_counted_filter_guard"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
