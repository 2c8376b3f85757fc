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
]


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
