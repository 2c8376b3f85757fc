"""Measure t45's self-join vs the range-frame window candidate —
VERDICT r15 item 5: t45 is the worst 30× scaler (6.39×, 4.63 s at
sf3); its registered form reads the user_id-bucketed events store but
still pays a (user, bucket) exchange of BOTH self-join sides plus the
2×-explode probe side, all of which grow with the corpus. The
range-frame form replaces the join with ``collect_list`` over
``rangeBetween(1µs, window)`` per user — zero fact-side exchange (the
window consumes bucket co-location; only a local (user, ts) sort is
added).

The r16 measurement FLIPPED the default: rangeframe won at every tier
with fully separated spreads (0.334/0.678 sf0.1, 0.439/1.722 sf1,
0.327/3.915 sf3 vs the then-registered bucket join), so
``rangeframe_window`` now IS the registered builder (bound directly —
the tool can never silently measure a drifted form) and the two join
forms are its forced references. Equality is gated in-tool and pinned
in tests/test_plans.py. A future default change needs a fresh win that
separates from the spread plus a REPROVE slot.

Usage: python tools/event_pairs_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
Prints one JSON line per sf dir with per-form medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.scale import (  # noqa: E402
    event_pairs_within_minute,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

FORMS = {
    "rangeframe_window": event_pairs_within_minute,  # registered default
    "bucket_join": lambda spark, sf_dir: event_pairs_within_minute(
        spark, sf_dir, form="bucket_join"
    ),
    "raw_join": lambda spark, sf_dir: event_pairs_within_minute(
        spark, sf_dir, form="raw_join"
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
    spark = get_spark(app_name="mgs-event-pairs-shootout")
    for sf_dir in sf_dirs:
        # warm (store ensure, codegen, footers) + equality gate
        results = {n: fn(spark, sf_dir).toPandas() for n, fn in FORMS.items()}
        vals = {
            n: sorted(map(tuple, df.itertuples(index=False)))
            for n, df in results.items()
        }
        ref = vals["rangeframe_window"]
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
            "rows": len(results["rangeframe_window"]),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
