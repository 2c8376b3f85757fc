"""Parity gate: every registered query with an oracle hash-matches DuckDB
on sf0.001 — the local mirror of the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from mapreduce_google_spark.queries import REGISTRY
from tests.oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        # rows-only check (non-SQL-expressible ops)
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, spec.oracle, name=name)
