"""Time the three t22 verify-stage forms at a given sf dir — the
evidence behind the r14 hashed-shingle-store default (VERDICT r13
item 4).

Forms:
* ``store``      — from-bands with the doc_id-bucketed shingle-HASH
                   store (the default; 8-byte array elements, no
                   tokenize, raw corpus never scanned);
* ``retokenize`` — from-bands with ``use_shingle_store=False`` (the
                   store-free fallback: semi-join the raw corpus, then
                   tokenize candidate docs per run);
* ``in_session`` — the direct :func:`minhash_lsh_pairs` (signatures
                   recomputed per run; the form a one-shot corpus with
                   no store budget would use).

Every form is asserted result-equal before timing — a shootout between
non-equivalent implementations would be meaningless.

Usage: python tools/shingle_store_shootout.py [sf_dir] [n_reps]
Prints one JSON line with per-form medians and spreads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    minhash_lsh_pairs_from_bands,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

IMPLS = {
    "store": lambda spark, sf: minhash_lsh_pairs_from_bands(spark, sf),
    "retokenize": lambda spark, sf: minhash_lsh_pairs_from_bands(
        spark, sf, use_shingle_store=False
    ),
    "in_session": minhash_lsh_pairs,
}


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    spark = get_spark(app_name="mgs-shingle-shootout")
    # equality gate + warm-up (store/band builds land here, untimed)
    results = {
        name: [tuple(r) for r in fn(spark, SF_DIR).collect()]
        for name, fn in IMPLS.items()
    }
    base = results["in_session"]
    assert all(r == base for r in results.values()), (
        "forms disagree — shootout void"
    )
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
                "n_pairs": len(base),
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
