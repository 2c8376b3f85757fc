"""t189's scaled-int64 Arrow covariance kernel (r18): the r17
covariance shootout (tools/covariance_shootout.py) refuted the JOIN as
t189's cost — a join-free double-generator form was within 1.5% — so
the 119-136 s at sf1 is the 82M per-row ``cast(xa*xb as
decimal(20,12))`` quantize+sum operations themselves. This probe
replaces the N·d² row explosion with ONE mapInArrow pass: per-partition
scaled-int64 partial sums of the exactly-quantized products (vectorized
exact binary rounding via Dekker two-product + per-element Decimal
repair inside the repr-divergence window — see
operators/similarity._quantize12_scaled), combined by a single
metadata-sized long aggregation.

Forms:

* ``sql``        — the pre-r18 registered body (kept registered as
  ``moments="sql"``, so the A/B stays reproducible after the flip).
* ``kernel``     — ``moments="arrow"``.
* ``registered`` — the registered default (sanity anchor).

Equality is gated in-tool at every tier at BOTH levels: the final
(dim_idx, loading) rows must be identical, and all d² covariance cells
must be BIT-identical (struct.pack comparison) between the sql and
kernel moment paths. Interleaved reps. Usage:
    python tools/covariance_kernel_shootout.py [sf_dir ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduce_google_spark.io import load_table  # noqa: E402
from mapreduce_google_spark.operators.similarity import (  # noqa: E402
    _cov_moments_arrow,
    top_principal_component,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


def _sql_cov_cells(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("vec_id", F.posexplode("embedding").alias("i", "x"))
    a = exploded.select("vec_id", F.col("i"), F.col("x").cast("double").alias("xa"))
    b = exploded.select(
        "vec_id", F.col("i").alias("j"), F.col("x").cast("double").alias("xb")
    )
    moments = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("xa") * F.col("xb")).cast("decimal(20,12)"))
            .cast("double")
            .alias("sxy"),
            F.count("*").cast("double").alias("n"),
        )
    )
    means = exploded.groupBy("i").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(20,12)")).cast("double")
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
    return {(r.i, r.j): r.cov for r in cov.collect()}


def _kernel_cov_cells(spark, sf_dir):
    from decimal import Decimal

    n, sx, sxy, _n_bad = _cov_moments_arrow(spark, sf_dir)
    nf = float(n)
    m = {i: float(Decimal(v).scaleb(-12)) / nf for i, v in sx.items()}
    return {
        (i, j): float(Decimal(v).scaleb(-12)) / nf - m[i] * m[j]
        for (i, j), v in sxy.items()
    }


FORMS = {
    "sql": lambda spark, sf: top_principal_component(spark, sf, moments="sql"),
    "kernel": lambda spark, sf: top_principal_component(spark, sf, moments="arrow"),
    "registered": top_principal_component,
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
    spark = get_spark(app_name="mgs-covariance-kernel-shootout")
    for sf_dir in sf_dirs:
        spark.sparkContext.setJobDescription("t189-kernel:eq:cells")
        ref_cells = _sql_cov_cells(spark, sf_dir)
        got_cells = _kernel_cov_cells(spark, sf_dir)
        assert set(ref_cells) == set(got_cells)
        bad = [
            k
            for k in ref_cells
            if struct.pack("<d", ref_cells[k]) != struct.pack("<d", got_cells[k])
        ]
        assert not bad, f"{len(bad)} covariance cells diverge, e.g. {bad[:3]}"
        vals = {}
        for name, fn in FORMS.items():
            spark.sparkContext.setJobDescription(f"t189-kernel:eq:{name}")
            vals[name] = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        assert vals["sql"] == vals["kernel"], "final rows diverged"
        assert vals["sql"] == vals["registered"], "registered diverged"
        samples = {n: [] for n in FORMS}
        for _ in range(reps):
            for name, fn in FORMS.items():
                spark.sparkContext.setJobDescription(f"t189-kernel:time:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t0)
        out = {
            "sf_dir": sf_dir,
            "n_reps": reps,
            "rows": len(vals["registered"]),
            "cells_bit_identical": len(ref_cells),
        }
        for name, xs in samples.items():
            out[name] = [round(median(xs), 3), round(min(xs), 3), round(max(xs), 3)]
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
