"""Verify t129's CSE hypothesis (VERDICT r17 next-round item 3) with an
interleaved measurement BEFORE staging anything.

The r17 registry sweep timed t129 (``bpe_pair_counts``) at 477 s at sf1.
Suspected cause: the transform lambda references the UNNAMED
``split(lower(text), '')`` expression twice per element (``chars[i]``,
``chars[i+1]``) — if Catalyst re-inlines instead of CSE-ing, every
element access pays a full O(len) re-split, making the per-row cost
O(len²). The hypothesis predicts a results-identical plan repair:

Probe result (sf0.01, interleaved): registered-pre-fix 5.06 s vs
named-column 0.43 s (11.7×), result-identical — hypothesis CONFIRMED,
and the named-column form LANDED as the registered builder in r18 (a
results-identical plan repair under existing oracle coverage, per
VERDICT r17 item 3). Forms:

* ``legacy_inline`` — the pre-r18 body, kept here verbatim so the
  at-scale A/B stays reproducible after the fix landed.
* ``registered``    — the registered builder (named-column form since
  r18: CollapseProject must not re-inline a non-cheap expression
  referenced 3×).
* ``zip_slices``    — zip_with over two slice() views of the array: the
  split is evaluated O(1) times per ROW (4×), never per element — the
  alternate fix shape, kept as a cross-check.

All three must be result-identical (gated in-tool at every tier).
Interleaved reps — the only measurement shape this repo accepts as
flip/repair evidence.

Usage: python tools/bpe_split_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.1 /tmp/mgs_sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.textstats import bpe_pair_counts  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402


def bpe_legacy_inline(spark, sf_dir, k=50):
    docs = load_table(spark, sf_dir, "documents")
    chars = F.split(F.lower("text"), "")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(chars) - 2),
        lambda i: F.concat(chars[i], chars[i + 1]),
    )
    return (
        docs.where(F.length("text") >= 2)
        .select(F.explode(pairs).alias("pair"))
        .where(~F.col("pair").contains(" "))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(k)
    )


def bpe_zip_slices(spark, sf_dir, k=50):
    docs = load_table(spark, sf_dir, "documents")
    chars = F.split(F.lower("text"), "")
    pairs = F.zip_with(
        F.slice(chars, 1, F.size(chars) - 1),
        F.slice(chars, 2, F.size(chars) - 1),
        lambda x, y: F.concat(x, y),
    )
    return (
        docs.where(F.length("text") >= 2)
        .select(F.explode(pairs).alias("pair"))
        .where(~F.col("pair").contains(" "))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(k)
    )


FORMS = {
    "legacy_inline": bpe_legacy_inline,
    "registered": bpe_pair_counts,
    "zip_slices": bpe_zip_slices,
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
    spark = get_spark(app_name="mgs-bpe-split-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            vals[name] = [tuple(r) for r in fn(spark, sf_dir).collect()]
        assert vals["legacy_inline"] == vals["registered"], "legacy diverged"
        assert vals["zip_slices"] == vals["registered"], "zip_slices diverged"
        samples: dict[str, list[float]] = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t0)
        out = {"sf_dir": sf_dir, "n_reps": reps, "rows": len(vals["registered"])}
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
