"""Staging evidence for the r19 auto-sizing flips (VERDICT r17 items 4
and 6): the r18-staged ``embedding_near_dup_pairs_auto`` (t24) and
``semantic_dedup_auto`` (t145) against their registered fixed-parameter
builders.

What it measures per tier:

* t24: the auto form's wall time and result rows, the derived
  (n_bits, n_tables), and — at tiers where the brute-force all-pairs
  form is feasible (``--exact-max-vecs``, default 5000) — MEASURED
  recall/precision vs the exact form. At oracle scale the auto form
  must EQUAL the registered form exactly (gated in-tool: both resolve
  to (3, 64)). The registered form is NOT run at large tiers: the r17
  sweep already recorded it as HANG >10 min (1.6e11 candidates); this
  tool is about proving the replacement completes and quantifying its
  recall honestly.
* t145: the auto form's wall time/rows and the derived n_cells; at
  oracle scale it must EQUAL the registered form (8 cells). The
  registered form's sf1 number (629 s) stands from
  BENCH_registry_sweep_r17.json.

Usage: python tools/autosize_probe.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/mgs_sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_google_spark.io import parquet_rows  # noqa: E402
from mapreduce_google_spark.operators.similarity import (  # noqa: E402
    _auto_lsh_near_dup_params,
    _auto_semantic_cells,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_auto,
    embedding_near_dup_pairs_exact,
    semantic_dedup,
    semantic_dedup_auto,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402


def timed(fn, spark, sf_dir, reps):
    xs, rows = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        xs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    return xs, rows


def main() -> int:
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    exact_max = 5000
    if "--exact-max-vecs" in argv:
        i = argv.index("--exact-max-vecs")
        exact_max = int(argv[i + 1])
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dirs = args or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        "/tmp/mgs_sf1",
    ]
    spark = get_spark(app_name="mgs-autosize-probe")
    for sf_dir in sf_dirs:
        n_vecs = parquet_rows(sf_dir, "embeddings") or 0
        bits, tables = _auto_lsh_near_dup_params(n_vecs, 0.4)
        cells = _auto_semantic_cells(n_vecs)
        out = {
            "sf_dir": sf_dir,
            "n_vecs": n_vecs,
            "t24_auto_params": {"n_bits": bits, "n_tables": tables},
            "t145_auto_cells": cells,
        }
        if bits == 3 and tables == 64:
            # oracle-scale regime: auto MUST equal registered exactly
            reg = sorted(
                tuple(r)
                for r in embedding_near_dup_pairs(spark, sf_dir).collect()
            )
            auto = sorted(
                tuple(r)
                for r in embedding_near_dup_pairs_auto(spark, sf_dir).collect()
            )
            assert auto == reg, "t24 auto diverged in the (3,64) regime"
            out["t24_oracle_equality"] = f"IDENTICAL ({len(reg)} rows)"
            sreg = sorted(
                tuple(r) for r in semantic_dedup(spark, sf_dir).collect()
            )
            sauto = sorted(
                tuple(r) for r in semantic_dedup_auto(spark, sf_dir).collect()
            )
            assert sauto == sreg, "t145 auto diverged in the 8-cell regime"
            out["t145_oracle_equality"] = f"IDENTICAL ({len(sreg)} rows)"
        if n_vecs <= exact_max:
            exact = {
                (r.id_a, r.id_b)
                for r in embedding_near_dup_pairs_exact(spark, sf_dir).collect()
            }
            auto_pairs = {
                (r.id_a, r.id_b)
                for r in embedding_near_dup_pairs_auto(spark, sf_dir).collect()
            }
            fp = len(auto_pairs - exact)
            out["t24_recall_vs_exact"] = {
                "exact_pairs": len(exact),
                "auto_pairs": len(auto_pairs),
                "recall": round(len(exact & auto_pairs) / len(exact), 4)
                if exact
                else None,
                "false_positives": fp,
            }
            assert fp == 0, "verify stage must make precision 1.0"
        xs, rows = timed(embedding_near_dup_pairs_auto, spark, sf_dir, reps)
        out["t24_auto_sec"] = xs
        out["t24_auto_rows"] = rows
        xs, rows = timed(semantic_dedup_auto, spark, sf_dir, reps)
        out["t145_auto_sec"] = xs
        out["t145_auto_rows"] = rows
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
