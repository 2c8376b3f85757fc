"""Measure t77's bucket-size guard (LANDED r18; staged r17 by the
registry sweep, which caught the then-unguarded builder at 241 s at sf1
— the closed-vocabulary corpus collapses simhash band values: 13,380 of
50k docs in ONE (band, band_val) bucket, 282M candidate-pair upper
bound, the quadratic product the banding exists to avoid).

Both remaining forms of the ONE registered builder (the pre-guard
builder was merged away in the flip; its numbers live in
BENCH_simhash_guard_probe.json):
* ``guarded_nocap``   — registered builder, max_bucket=None: the exact
  pigeonhole-recall form (plan repair only: repartition+cache).
* ``guarded_1000``    — registered builder at the default cap. Equality
  vs nocap is NOT gated at tiers where the cap fires (sf0.1: one 1,338
  bucket; sf1: massively) — result rows are reported instead, because
  dropping oversized-bucket pairs is the documented semantics, not a
  bug.

Interleaved reps — the only measurement shape this repo accepts as
flip evidence (BENCH_asof_tail_decomposition.json is the lesson).

Usage: python tools/simhash_guard_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.dedup import (  # noqa: E402
    simhash_near_dup_pairs,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

FORMS = {
    "guarded_nocap": functools.partial(
        simhash_near_dup_pairs, max_bucket=None
    ),
    "guarded_1000": simhash_near_dup_pairs,
}


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    argv = sys.argv[1:]
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dirs = args or ["/root/testdata/sf0.1", "/tmp/mgs_sf1"]
    spark = get_spark(app_name="mgs-simhash-guard-shootout")
    for sf_dir in sf_dirs:
        # warm + equality gate (cache cleared between forms so the
        # staged form's cache cannot serve another form's run)
        vals, rows = {}, {}
        for name, fn in FORMS.items():
            df = fn(spark, sf_dir).toPandas()
            vals[name] = sorted(map(tuple, df.itertuples(index=False)))
            rows[name] = len(df)
            spark.catalog.clearCache()
        assert set(vals["guarded_1000"]) <= set(vals["guarded_nocap"]), (
            "guard added pairs"
        )
        samples: dict[str, list[float]] = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                samples[name].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        out = {"sf_dir": sf_dir, "n_reps": reps, "rows": rows}
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
