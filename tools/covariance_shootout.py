"""t189's covariance-build repair probe (found by the r18 sweep-tail
completion, BENCH_registry_sweep_r18.json): the d×d covariance is
assembled by SELF-JOINING the posexploded embeddings on vec_id —
(N·d) ⋈ (N·d) → N·d² joined rows (82M at sf1's 20k×64) shuffled into
the cell aggregation, 136 s at sf1 with t190 composing it at 146 s.

Candidate repair (results-identical BY CONSTRUCTION): chain two
generators instead — posexplode the array to (i, xa) rows that CARRY
the array, then posexplode the carried array to (j, xb) — the same
N·d² product rows materialize map-side with NO join and no pre-join
shuffle of the exploded relation; the only exchange left is the
4096-cell partial-aggregated groupBy. Identity argument: the per-cell
decimal(20,12) sums are EXACT arithmetic over the SAME quantized
product multiset (decimal addition is commutative/associative), so
every covariance cell — and therefore the driver-side power iteration
and both registered outputs — is bit-identical. The tool still gates
equality end-to-end at every tier.

* ``registered``   — t189's registered builder, untouched.
* ``generator``    — identical pipeline with the join-free moments.

Usage: python tools/covariance_shootout.py [sf_dir ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.similarity import (  # noqa: E402
    top_principal_component,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


def generator_pc(spark, sf_dir, iters=20):
    """top_principal_component with the join-free moments stage."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
    ei = emb.select(F.posexplode("embedding").alias("i", "xa"), "embedding")
    pairs = ei.select(
        "i",
        F.col("xa").cast("double").alias("xa"),
        F.posexplode("embedding").alias("j", "xb"),
    )
    moments = pairs.groupBy("i", "j").agg(
        F.sum(
            (F.col("xa") * F.col("xb").cast("double")).cast("decimal(20,12)")
        )
        .cast("double")
        .alias("sxy"),
        F.count("*").cast("double").alias("n"),
    )
    means = exploded.groupBy("i").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(20,12)")).cast(
                "double"
            )
            / F.count("*")
        ).alias("m")
    )
    cov = (
        moments.join(means.select(F.col("i"), F.col("m").alias("mi")), "i")
        .join(means.select(F.col("i").alias("j"), F.col("m").alias("mj")), "j")
        .select(
            "i",
            "j",
            (F.col("sxy") / F.col("n") - F.col("mi") * F.col("mj")).alias("cov"),
        )
    )
    rows = cov.collect()
    d = max(r.i for r in rows) + 1
    C = {(r.i, r.j): r.cov for r in rows}
    q12 = Decimal(1).scaleb(-12)
    v = [1.0 / (d**0.5)] * d
    for _ in range(iters):
        w = []
        for i in range(d):
            s = Decimal(0)
            for j in range(d):
                s += Decimal(C[(i, j)] * v[j]).quantize(
                    q12, rounding=ROUND_HALF_UP
                )
            w.append(float(s))
        nrm_sq = Decimal(0)
        for wi in w:
            nrm_sq += Decimal(wi * wi).quantize(q12, rounding=ROUND_HALF_UP)
        nrm = math.sqrt(float(nrm_sq))
        v = [wi / nrm for wi in w]
    out = spark.createDataFrame(
        [(i, v[i]) for i in range(d)], "dim_idx int, loading double"
    )
    return out.select(
        "dim_idx", F.round("loading", 6).alias("loading")
    ).orderBy("dim_idx")


FORMS = {
    "registered": top_principal_component,
    "generator": generator_pc,
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
    sf_dirs = args or ["/root/testdata/sf0.01", "/tmp/mgs_sf1"]
    spark = get_spark(app_name="mgs-covariance-shootout")
    for sf_dir in sf_dirs:
        vals = {}
        for name, fn in FORMS.items():
            vals[name] = [tuple(r) for r in fn(spark, sf_dir).collect()]
            spark.catalog.clearCache()
        assert vals["generator"] == vals["registered"], "repair diverged"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
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
