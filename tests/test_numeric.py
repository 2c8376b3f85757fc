"""Unit gates for functions/numeric.py: exact decimal accumulation must be
invariant to partitioning (the property double sums lack, and the reason
every money/rate aggregate routes through these helpers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_google_spark.functions.numeric import davg, dsum, money, one_minus, rate


def _vals(spark, parts):
    # 2-decimal money values with a wide magnitude spread — the worst
    # case for double accumulation order
    rows = [(i, round((i * 7919 % 99991) + 0.01 * (i % 100), 2)) for i in range(5000)]
    return spark.createDataFrame(rows, "id long, amt double").repartition(parts, "id")


def test_dsum_partition_invariant(spark):
    got = {
        p: _vals(spark, p).agg(dsum(money("amt")).alias("s")).first()["s"]
        for p in (1, 3, 16, 64)
    }
    assert len(set(got.values())) == 1, got


def test_davg_matches_exact_mean(spark):
    df = _vals(spark, 8)
    got = df.agg(davg(money("amt")).alias("m")).first()["m"]
    rows = [r["amt"] for r in df.collect()]
    from decimal import Decimal

    exact = float(sum(Decimal(str(v)) for v in rows) / len(rows))
    assert abs(got - round(exact, 6)) < 1e-9


def test_rate_factors_are_exact(spark):
    df = spark.createDataFrame([(0.05,), (0.1,), (0.0,)], "r double")
    out = df.select(
        one_minus("r").cast("string").alias("om"),
        rate("r").cast("string").alias("rt"),
    ).collect()
    assert [r["om"] for r in out] == ["0.95", "0.90", "1.00"]
    assert [r["rt"] for r in out] == ["0.05", "0.10", "0.00"]
