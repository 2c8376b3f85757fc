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
