"""Scale-smoke tier: the heaviest oracle queries re-checked at sf0.1
(100× the default test tier). Catches scale-DEPENDENT drift the sf0.001
gate can't see — decimal accumulator widths, partition-count-sensitive
plans, AQE rewrites that only trigger past size thresholds. A handful of
queries, not the whole registry: ~40 s, so it stays in the default run.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_google_spark.io import TABLES
from mapreduce_google_spark.queries import REGISTRY
from tests.oracle import assert_matches_oracle

SF01 = "/root/testdata/sf0.1"

#: widest aggregations + the decimal-recipe flagships + fan-out joins
SCALE_QUERIES = [
    "t08_pricing_summary",
    "t12_revenue_rollup",
    "t62_unshipped_orders_topk",
    "t65_incremental_dedup",
    "t68_trailing_active_users",
    # the two Arrow-Python kernel paths on the bench-relevant surface —
    # per-batch-overhead regressions only show up past the sf0.001 tier
    "t50_asof_latest_order_pandas",
    "t83_pack_invariants",
    # native codec pipeline (encode→decode→resize→checksum in one Arrow
    # pass) — the heaviest per-row Python work on the registered surface
    "t156_image_resize_checksum",
    # corpus-scale token machinery new in r04: the span explode and the
    # split-separated LM count build both grow superlinearly with doc
    # length — check them at the 100× tier
    "t139_duplicate_span_coverage",
    "t150_heldout_lm_nll",
]

#: generous wall-clock ceilings (seconds) for the Python-kernel paths at
#: sf0.1 on local[8] — r04 measured ~4 s (t50) / ~3 s (t64); a 10×
#: per-batch-overhead regression (the failure mode Arrow paths have when
#: batches degenerate to row-at-a-time) blows through these.
KERNEL_TIME_BOUNDS = {
    "t50_asof_latest_order_pandas": 45.0,
    "t83_pack_invariants": 45.0,
    "t156_image_resize_checksum": 90.0,
}


@pytest.fixture(scope="module")
def duck_sf01():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF01}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_scale_smoke_matches_oracle(name, spark, duck_sf01):
    spec = REGISTRY[name]
    assert_matches_oracle(
        spec.builder(spark, SF01), duck_sf01, spec.oracle, name=f"{name}@sf0.1"
    )


@pytest.mark.parametrize("name", sorted(KERNEL_TIME_BOUNDS))
def test_python_kernel_walltime_bound(name, spark):
    """Arrow-Python kernel paths stay batch-shaped at 100× the test tier:
    a timed end-to-end run (build + full materialization) under a ceiling
    that only a per-batch-overhead regression would breach."""
    import time

    spec = REGISTRY[name]
    start = time.monotonic()
    spec.builder(spark, SF01).collect()
    elapsed = time.monotonic() - start
    assert elapsed < KERNEL_TIME_BOUNDS[name], (
        f"{name} took {elapsed:.1f}s at sf0.1 "
        f"(bound {KERNEL_TIME_BOUNDS[name]}s) — Arrow batching regressed?"
    )
