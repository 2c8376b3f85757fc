"""t24's verify-stage probe (r19): after the auto-sizing flip, a
decomposition at sf1 (20k vecs, params (9, 256)) put the cost at

    banded set build+cache   9.4 s
    candidate join (count)   3.1 s   147.3M raw candidate rows
    + distinct              36.5 s    83.3M distinct pairs
    full query             132.7 s   180,500 output rows

i.e. ~85 s in the VERIFY stage alone: 83M pairs × an interpreted
higher-order-function cosine (~190 lambda frames per pair — the t129
HOF-interpretation lesson applies to aggregate/zip_with too). The
candidate-set math is the documented LSH OR-construction tradeoff and
is NOT touched here; this probe A/Bs only the verify arithmetic:

* ``auto_hof``   — the flipped builder with verify="hof" (the shape
  the flip landed with; kept reachable as the equality substrate)
* ``auto_arrow`` — verify="arrow": one Arrow transfer of exactly
  (id_a, id_b, vec_a, vec_b), batch-vectorized einsum cosine, rounded
  HALF_UP 6 like F.round (the t18/t25 _round_half_up_6 parity
  treatment), thresholded in-kernel
* ``registered`` — the registered builder (sanity anchor)

Equality gated in-tool at every tier (sorted rows). Usage:
    python tools/t24_verify_kernel_shootout.py [sf_dir ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.operators.similarity import (  # noqa: E402
    embedding_near_dup_pairs_auto,
)
from mapreduce_google_spark.queries import REGISTRY  # noqa: E402
from mapreduce_google_spark.session import get_spark  # noqa: E402


def auto_hof(spark, sf_dir):
    return embedding_near_dup_pairs_auto(spark, sf_dir, verify="hof")


def auto_arrow(spark, sf_dir):
    return embedding_near_dup_pairs_auto(spark, sf_dir, verify="arrow")


def registered(spark, sf_dir):
    return REGISTRY["t24_embedding_near_dup"].builder(spark, sf_dir)


FORMS = {
    "auto_hof": auto_hof,
    "auto_arrow": auto_arrow,
    "registered": registered,
}


def median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> int:
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dirs = args or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="mgs-t24-verify-kernel-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            spark.sparkContext.setJobDescription(f"t24verify:eq:{name}")
            vals[name] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
            spark.catalog.clearCache()
        assert vals["auto_arrow"] == vals["auto_hof"], (
            f"verify kernel diverged: {len(vals['auto_arrow'])} vs "
            f"{len(vals['auto_hof'])} rows"
        )
        assert vals["registered"] == vals["auto_arrow"], "registered drifted"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                spark.sparkContext.setJobDescription(f"t24verify:time:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        out = {"sf_dir": sf_dir, "n_reps": reps, "rows": len(vals["registered"])}
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
