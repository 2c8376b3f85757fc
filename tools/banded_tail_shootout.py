"""r19 flip evidence for the lexical-shingle side of the banded-tail
cliff (VERDICT r17 item 2): t134 (containment), t135 (cross-source
matrix) and t170 (ensemble) all generate candidates through the
uncapped ``max_df=None`` shingle self-join; their r18 signature
extensions expose ``max_df`` end-to-end, and this tool measures the
documented cap (1000) against the uncapped default, interleaved, so
the r19 default decision is evidence-backed.

Semantics at the cap: shingles present in more than ``max_df``
documents are dropped from candidate generation — boilerplate mass
that exact dedup should have removed upstream (the t22/t77 contract).
At sf0.01 the corpus has 500 documents, so df ≤ 500 < 1000 and the
capped form must be RESULT-IDENTICAL (gated in-tool when the tier's
document count is below the cap); at larger tiers the capped result is
gated as a subset for the pair-valued entries and reported for the
aggregated matrix.

Usage: python tools/banded_tail_shootout.py [sf_dir ...] [--reps N]
Default sf dirs: /root/testdata/sf0.01 /tmp/mgs_sf1
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from mapreduce_google_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
    cross_source_dup_matrix,
    ensemble_dup_pairs,
)
from mapreduce_google_spark.session import get_spark  # noqa: E402

CAP = 1000

QUERIES = {
    "t134_containment": (containment_pairs, "pairs"),
    "t135_cross_source": (cross_source_dup_matrix, "matrix"),
    "t170_ensemble": (ensemble_dup_pairs, "pairs"),
}


def n_docs(sf_dir: str) -> int:
    return duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]


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
    spark = get_spark(app_name="mgs-banded-tail-shootout")
    for sf_dir in sf_dirs:
        docs = n_docs(sf_dir)
        for qname, (builder, kind) in QUERIES.items():
            forms = {
                "uncapped": builder,
                f"capped_{CAP}": functools.partial(builder, max_df=CAP),
            }
            vals, rows = {}, {}
            for fname, fn in forms.items():
                got = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
                vals[fname], rows[fname] = got, len(got)
                spark.catalog.clearCache()
            if docs <= CAP:
                assert vals[f"capped_{CAP}"] == vals["uncapped"], (
                    qname,
                    "cap fired below the document-count bound",
                )
            elif kind == "pairs":
                assert set(vals[f"capped_{CAP}"]) <= set(vals["uncapped"]), (
                    qname,
                    "cap ADDED pairs",
                )
            samples = {n: [] for n in forms}
            for _ in range(reps):
                for fname, fn in forms.items():
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).collect()
                    samples[fname].append(time.perf_counter() - t0)
                    spark.catalog.clearCache()
            out = {
                "sf_dir": sf_dir,
                "query": qname,
                "n_docs": docs,
                "n_reps": reps,
                "rows": rows,
            }
            for fname, xs in samples.items():
                out[fname] = [
                    round(median(xs), 3),
                    round(min(xs), 3),
                    round(max(xs), 3),
                ]
            print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
