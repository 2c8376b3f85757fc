"""Deletion vectors (t231): merge-on-read DELETE must touch no data
file, be idempotent, compose across predicates, and compact by
rewriting only the files the sidecar references."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mapreduce_google_spark.io import apply_deletes, delete_where, read_with_deletes


def _mtimes(path: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    }


def _mk(spark, tmp_path, n=1000, files=4) -> str:
    path = str(tmp_path / "t")
    spark.range(n).selectExpr("id AS k", "id % 10 AS g").repartition(
        files
    ).write.parquet(path)
    return path


def test_delete_marks_without_touching_data_files(spark, tmp_path):
    path = _mk(spark, tmp_path)
    before = _mtimes(path)
    n = delete_where(spark, path, F.col("g") == 3)
    assert n == 100
    assert _mtimes(path) == before  # zero data bytes rewritten
    got = read_with_deletes(spark, path)
    assert got.count() == 900
    assert got.where(F.col("g") == 3).count() == 0


def test_delete_is_idempotent_and_composes(spark, tmp_path):
    path = _mk(spark, tmp_path)
    assert delete_where(spark, path, F.col("g") == 3) == 100
    # same predicate again: already-masked rows are not re-marked
    assert delete_where(spark, path, F.col("g") == 3) == 0
    # a second predicate composes (append-only commits)
    assert delete_where(spark, path, F.col("k") < 50) == 45  # 5 of 50 had g=3
    assert read_with_deletes(spark, path).count() == 855


def test_apply_deletes_rewrites_only_affected_files(spark, tmp_path):
    """Compaction drops the masked rows physically, clears the sidecar,
    and leaves files with no deletes byte-untouched."""
    path = _mk(spark, tmp_path)
    # delete rows from ONE file only
    one_file = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    doomed = (
        spark.read.parquet(one_file).select("k").limit(10).collect()
    )
    keys = [r["k"] for r in doomed]
    assert delete_where(spark, path, F.col("k").isin(keys)) == 10
    before = _mtimes(path)
    out = apply_deletes(spark, path)
    assert out == {"rewritten_files": 1, "dropped_rows": 10}
    assert not os.path.exists(os.path.join(path, "_deletes"))
    after = _mtimes(path)
    # untouched files keep their bytes; the doomed file is gone
    for f, m in before.items():
        if f == one_file:
            assert f not in after
        else:
            assert after[f] == m
    # content: plain read now equals the masked read pre-compaction
    got = sorted(r["k"] for r in spark.read.parquet(path).collect())
    assert len(got) == 990 and not set(keys) & set(got)
    # further masked reads still work (no sidecar → passthrough)
    assert read_with_deletes(spark, path).count() == 990


def test_oversized_sidecar_skips_broadcast(spark, tmp_path, monkeypatch):
    """Past DV_BROADCAST_MAX_BYTES the reader must drop the broadcast
    hint (shuffled anti-join, no driver-side hash table) and warn toward
    apply_deletes — same rows either way."""
    import warnings

    from mapreduce_google_spark import io as mio

    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    path = str(tmp_path / "tbl")
    df.write.parquet(path)
    assert delete_where(spark, path, F.col("id") % 10 == 0) == 10

    small = read_with_deletes(spark, path)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().executedPlan().toString()
    assert small.count() == 90

    monkeypatch.setattr(mio, "DV_BROADCAST_MAX_BYTES", 0)
    # with auto-broadcast off, ONLY the (now dropped) hint could force a
    # broadcast — a shuffled plan here proves the hint is gone, while
    # Spark stays free to auto-pick broadcast for genuinely small sidecars
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            big = read_with_deletes(spark, path)
            assert any("apply_deletes" in str(x.message) for x in w)
        plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert big.count() == 90
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
